"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY build-plan phase 6 / north-star: arbitrary per-key state the built-in
windowed aggregates can't express).

``running_totals`` is the canonical shape: per-key state carried across
micro-batches as an Arrow-backed tuple, updated from pandas batches — the
template for fraud velocity counters, per-card running exposure, etc.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    output_mode: str = "update",
) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches.

    Emits one row per key per batch with the updated totals — the streaming
    analogue of ``groupBy(key).agg(count, sum)`` but with explicit,
    inspectable state (and the hook where arbitrary logic goes).
    """
    output_schema = f"{key_col} long, n_events long, total double"
    state_schema = "n long, s double"

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            s += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total": [s]})

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode=output_mode,
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_totals_exact(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    output_mode: str = "update",
) -> DataFrame:
    """:func:`running_totals` with DETERMINISTIC accumulation: values are
    quantized to int64 micros (``floor(v·1e6 + 0.5)`` — a single IEEE op
    per element) and summed as exact integers, so the emitted totals are
    identical for any arrival order, batch split, or engine — the
    property that lets a custom stateful operator carry a batch-SQL
    oracle (q184) instead of a rows-only check. Emits
    ``(key, n_events, total_micros)``; the caller derives the float total
    as one division."""
    output_schema = f"{key_col} long, n_events long, total_micros long"
    state_schema = "n long, sm long"

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import numpy as np

        n, sm = state.get if state.exists else (0, 0)
        for pdf in batches:
            v = pdf[value_col].fillna(0.0).to_numpy(dtype="float64")
            n += len(v)
            sm += int(np.floor(v * 1e6 + 0.5).astype("int64").sum())
        state.update((n, sm))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_micros": [sm]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_tws(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    output_mode: str = "Update",
) -> DataFrame:
    """Per-key running (count, sum) via ``transformWithStateInPandas`` —
    the Spark 4 successor to ``applyInPandasWithState`` with TYPED state.

    Same contract as :func:`running_totals`, different engine surface:
    state is a named ``ValueState`` on a ``StatefulProcessorHandle`` (not a
    positional tuple), lifecycle is explicit (``init``/``close``), and the
    operator requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``RocksDBStateStoreProvider``) — the provider you would run at 100 TB
    anyway: state lives off-heap/on-disk with incremental checkpoint
    upload, so per-executor state size is bounded by disk, not memory.
    """
    # Imported lazily: the module exists only on Spark ≥ 4.0, and the
    # engine's batch surface must import cleanly on any supported Spark.
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    output_schema = f"{key_col} long, n_events long, total double"

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, s double")

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf[value_col].fillna(0.0).sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {key_col: [key[0]], "n_events": [n], "total": [s]}
            )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=output_schema,
        outputMode=output_mode,
        timeMode="None",
    )
