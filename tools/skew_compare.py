"""Diff a stressed sf1.0 bench against the unskewed sf1.0 baseline.

Emits the committed-artifact schema directly (BENCH_SF1_SKEW_r09.json
shape): a top-level validation wrapper holding the per-query ratio table
under ``comparison`` plus the raw base/skew payloads — so the committed
artifact IS this tool's output (plus any --note lines), not a
hand-assembled sibling schema (r9 ADVICE).

Usage:
  python tools/skew_compare.py base.json skew.json \
      [--metric NAME] [--generator STR] [--note STR ...] > out.json
"""

from __future__ import annotations

import argparse
import json
import sys


def compare(base: dict, skew: dict) -> dict:
    """Per-query ratio table + bounded/unbounded summary. Tolerates
    missing/empty overlap and zero base timings (ratio: None)."""
    rows = {}
    for name, s in sorted(skew.get("queries", {}).items()):
        b = base.get("queries", {}).get(name)
        if b is None:
            continue
        rows[name] = {
            "base_sec": b,
            "skew_sec": s,
            "ratio": round(s / b, 2) if b else None,
        }
    out = {
        "metric": "sf1_skew_vs_base",
        "base_total": base.get("value"),
        "skew_total": skew.get("value"),
        "total_ratio": (
            round(skew["value"] / base["value"], 3)
            if base.get("value") and skew.get("value") is not None
            else None
        ),
        "worst": None,
        "over_2x": sorted(
            k for k, v in rows.items() if (v["ratio"] or 0) > 2.0
        ),
        "queries": rows,
        "base_load": base.get("loadavg_1m_at_start"),
        "skew_load": skew.get("loadavg_1m_at_start"),
    }
    if rows:
        worst = max(rows.items(), key=lambda kv: kv[1]["ratio"] or 0)
        out["worst"] = {"query": worst[0], **worst[1]}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("skew")
    ap.add_argument("--metric", default="sf1_hotkey_skew_validation")
    ap.add_argument("--generator", default=None)
    ap.add_argument("--note", action="append", default=[])
    args = ap.parse_args()

    base = json.load(open(args.base))
    skew = json.load(open(args.skew))
    comparison = compare(base, skew)
    if not comparison["queries"]:
        print(
            "skew_compare: no overlapping queries between the two payloads",
            file=sys.stderr,
        )
        return 1
    out = {
        "metric": args.metric,
        **({"generator": args.generator} if args.generator else {}),
        "comparison": comparison,
        **({"notes": args.note} if args.note else {}),
        "base": base,
        "skew": skew,
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
