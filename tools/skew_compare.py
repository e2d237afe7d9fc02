"""Diff the hot-key sf1.0 bench against the unskewed sf1.0 baseline.

Emits BENCH_SF1_SKEW_r09-style artifacts: a per-query ratio table plus a
bounded/unbounded verdict (VERDICT r8 item 5 — the skew fixture proved
AQE skew splitting ENGAGES at sf0.01; this proves wall-clock stays
bounded when 2/3 of the fact sits on one key at 10x driver scale).

Usage: python tools/skew_compare.py base.json skew.json > out.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    base = json.load(open(sys.argv[1]))
    skew = json.load(open(sys.argv[2]))
    rows = {}
    for name, s in sorted(skew["queries"].items()):
        b = base["queries"].get(name)
        if b is None:
            continue
        rows[name] = {
            "base_sec": b,
            "skew_sec": s,
            "ratio": round(s / b, 2) if b else None,
        }
    worst = max(rows.items(), key=lambda kv: kv[1]["ratio"] or 0)
    out = {
        "metric": "sf1_skew_vs_base",
        "base_total": base["value"],
        "skew_total": skew["value"],
        "total_ratio": round(skew["value"] / base["value"], 3),
        "worst": {"query": worst[0], **worst[1]},
        "over_2x": sorted(
            k for k, v in rows.items() if (v["ratio"] or 0) > 2.0
        ),
        "queries": rows,
        "base_load": base.get("loadavg_1m_at_start"),
        "skew_load": skew.get("loadavg_1m_at_start"),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
