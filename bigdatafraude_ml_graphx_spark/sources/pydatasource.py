"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
deterministic synthetic-corpus generator.

The reference's only generator is the row-range feeder
(`/root/reference/streaming/feed_kafka.py` shape — S9 in SURVEY §2.1);
Spark 4 lets an engine ship whole SOURCES in Python, with real partition
planning: the driver plans ``InputPartition`` row slices, each executor
materializes only its slice, so a billion-row synthetic corpus costs zero
storage and scales linearly with executors — the standard way to feed
benchmark/load tests without staging data.

Determinism contract: every value is a pure function of (seed, doc_id) via
md5 — same rows for any partition count, any executor placement, any rerun.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = (
    "key value table row scan hash join sort merge batch part line the a "
    "spark window filter agg fast slow"
).split()


def _rng(seed: int, doc_id: int, salt: str) -> int:
    h = hashlib.md5(f"{seed}:{doc_id}:{salt}".encode()).hexdigest()
    return int(h[:15], 16)


def _doc_text(seed: int, doc_id: int) -> str:
    n_tokens = 20 + _rng(seed, doc_id, "len") % 80
    return " ".join(
        _WORDS[_rng(seed, doc_id, f"w{j}") % len(_WORDS)] for j in range(n_tokens)
    )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 0))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        """Driver-side planning: contiguous doc_id slices, one per task —
        the partition count is the read parallelism knob, exactly like file
        splits for a parquet scan."""
        per = max(1, (self.n + self.num_partitions - 1) // self.num_partitions)
        return [
            _Slice(lo, min(lo + per, self.n)) for lo in range(0, self.n, per)
        ]

    def read(self, partition: _Slice):
        langs = ("en", "de", "es", "fr")
        for doc_id in range(partition.start, partition.end):
            yield (
                doc_id,
                _doc_text(self.seed, doc_id),
                langs[_rng(self.seed, doc_id, "lang") % len(langs)],
            )


class SynthDocsDataSource(DataSource):
    """``spark.read.format("synth_docs").option("n", N).load()``."""

    @classmethod
    def name(cls) -> str:
        return "synth_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string"

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)

    def simpleStreamReader(self, schema):
        return SynthDocsStreamReader(self.options)


def register_synth_docs(spark) -> None:
    """Idempotent registration of the synth_docs format on a session."""
    spark.dataSource.register(SynthDocsDataSource)


try:  # Spark 4 streaming Python data source API
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover — older Spark
    SimpleDataSourceStreamReader = object


class SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the synthetic corpus: offsets are plain doc_id
    cursors, each microbatch emits the next ``rows_per_batch`` documents,
    and a drained source returns empty batches forever (the bounded-feed
    shape load tests want). Replays (``readBetweenOffsets``) regenerate
    the identical rows from (seed, doc_id) — exactly-once without any
    stored state, which is the whole point of a deterministic feeder."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 0))
        self.per = int(options.get("rows_per_batch", 100))

    def initialOffset(self):
        return {"i": 0}

    def _rows(self, start: int, end: int):
        langs = ("en", "de", "es", "fr")
        return iter(
            [
                (
                    doc_id,
                    _doc_text(self.seed, doc_id),
                    langs[_rng(self.seed, doc_id, "lang") % len(langs)],
                )
                for doc_id in range(start, end)
            ]
        )

    def read(self, start):
        i = int(start["i"])
        end = min(i + self.per, self.n)
        return (self._rows(i, end), {"i": end})

    def readBetweenOffsets(self, start, end):
        return self._rows(int(start["i"]), int(end["i"]))
