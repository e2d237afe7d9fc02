"""Round-7 batch: BPE merge iteration and SemDeDup embedding-cluster dedup.

Determinism: BPE argmaxes break ties on (count DESC, a, b) string order;
everything else is integer counting over md5-derived keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query

# ---------------------------------------------------------------------------
# q186 — BPE merge-pair iteration (tokenizer training primitive)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_oracle(rounds: int) -> str:
    """Unrolled-round oracle (the q149 MATERIALIZED technique): each round
    materializes the pair count, the argmax, and the rewritten vocabulary,
    so DuckDB replays the exact greedy sequence the engine executes."""
    parts = [
        """
    WITH w AS MATERIALIZED (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      WHERE regexp_matches(word, '^[a-z]+$')
      GROUP BY word),
    c0 AS MATERIALIZED (
      SELECT '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS seq, freq
      FROM w)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    p{r} AS (
      SELECT l[i] AS a, l[i+1] AS b, SUM(freq) AS cnt FROM (
        SELECT l, freq, unnest(generate_series(1, len(l) - 1)) AS i
        FROM (SELECT string_split(trim(seq), '  ') AS l, freq
              FROM c{r - 1}) s) t
      GROUP BY 1, 2),
    m{r} AS MATERIALIZED (
      SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
    c{r} AS MATERIALIZED (
      SELECT replace(seq, ' ' || m.a || '  ' || m.b || ' ',
                     ' ' || m.a || m.b || ' ') AS seq, freq
      FROM c{r - 1}, m{r} m)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {r} AS round, a, b, a || b AS merged,"
        f" CAST(cnt AS BIGINT) AS merge_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    parts.append(f"\n    {selects}\n    ORDER BY round")
    return "".join(parts)


@query("q186_bpe_merges", oracle=_bpe_oracle(_BPE_ROUNDS))
def q186_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy BPE merge training over the documents corpus — the one
    LLM-tokenizer primitive the engine lacked (q101 counts bigram
    CANDIDATES; this performs the iterative merges). Trains on the
    distinct-word frequency table (|vocab| rows per round, one corpus
    scan total — the shape that holds at 100 TB); each round's argmax is
    a 1-row bounded collect, and the merge itself is a literal
    double-space ``replace`` whose left-to-right non-overlapping
    semantics are identical in Spark and DuckDB — certified by the
    unrolled MATERIALIZED oracle replaying all {3} rounds."""
    from .functions.bpe import bpe_merges, word_frequencies

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_merges(word_frequencies(docs), _BPE_ROUNDS)
    return spark.createDataFrame(
        merges,
        "round int, a string, b string, merged string, merge_count long",
    ).orderBy("round")
