"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.8: the escape hatch when built-in window/session state can't
express the semantics).

Example operator: per-user running totals — each micro-batch emits the
user's cumulative event count and value sum so far (the building block for
online feature pipelines). State is one small tuple per user in the state
store; the watermark is not required because state is keyed and monotone.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterable["pd.DataFrame"],
    state: GroupState,
) -> Iterable["pd.DataFrame"]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    import math

    # portable fixed-point rounding (Python round() is ties-to-even,
    # diverging from the DuckDB oracle / Spark F.round on tie values)
    tv = math.floor(total * 100 + 0.5) / 100
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [tv]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user cumulative (count, value-sum) via keyed state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Per-user record-high detection: the second custom stateful operator.
# Two implementations with IDENTICAL semantics:
#  - record_breaking_events_awps: applyInPandasWithState (used by the
#    catalog entry — runs anywhere);
#  - record_breaking_events: Spark 4 transformWithStateInPandas (typed
#    ValueState handle, RocksDB-backed) — the successor API; its driver
#    worker imports google.protobuf, which this container does not ship,
#    so it is exercised by an import-gated test and documented as the
#    scale path where protobuf is available.
# ---------------------------------------------------------------------------

RECORD_HIGH_OUTPUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("value", DoubleType()),
    ]
)


try:  # Spark 4 only; the module must import on any version
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor as _SP
except ImportError:  # pragma: no cover - env ships Spark 4
    _SP = object


class RecordHighProcessor(_SP):
    """Per-user record-breaking detection: emit an event iff its value
    STRICTLY exceeds the user's running maximum so far; state is one
    double per user in a ValueState handle.

    Rows within a micro-batch are sorted by (ts, event_id) before the
    scan, so emission is deterministic under any arrival interleaving
    inside a batch; across batches the state carries the max forward.
    The batch oracle is the strictly-before running-max window — value
    comparisons only, no FP arithmetic, so results are bit-identical.
    """

    def init(self, handle) -> None:
        from pyspark.sql.types import DoubleType as _D
        from pyspark.sql.types import StructField as _F
        from pyspark.sql.types import StructType as _S

        self._max = handle.getValueState("running_max", _S([_F("mx", _D())]))

    def handleInputRows(self, key, rows, timerValues):
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        cur = self._max.get()[0] if self._max.exists() else None
        out_id, out_val = [], []
        for eid, val in zip(pdf["event_id"], pdf["value"]):
            if cur is None or val > cur:
                out_id.append(int(eid))
                out_val.append(float(val))
                cur = float(val)
        if cur is not None:
            self._max.update((float(cur),))
        if out_id:
            yield pd.DataFrame(
                {"event_id": out_id, "user_id": int(key[0]), "value": out_val}
            )

    def close(self) -> None:
        pass


RECORD_HIGH_STATE = StructType([StructField("mx", DoubleType())])


def _record_high_update(
    key: Tuple[Any, ...],
    pdfs: Iterable["pd.DataFrame"],
    state: GroupState,
) -> Iterable["pd.DataFrame"]:
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts", "event_id"], kind="mergesort"
    )
    cur = state.get[0] if state.exists else None
    out_id, out_val = [], []
    for eid, val in zip(pdf["event_id"], pdf["value"]):
        if cur is None or val > cur:
            out_id.append(int(eid))
            out_val.append(float(val))
            cur = float(val)
    if cur is not None:
        state.update((float(cur),))
    if out_id:
        yield pd.DataFrame(
            {"event_id": out_id, "user_id": int(key[0]), "value": out_val}
        )


def record_breaking_events_awps(events: DataFrame) -> DataFrame:
    """Per-user record highs via applyInPandasWithState (portable path:
    same emission rule and state as the transformWithState variant)."""
    return (
        events.select("event_id", "ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _record_high_update,
            outputStructType=RECORD_HIGH_OUTPUT,
            stateStructType=RECORD_HIGH_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def record_breaking_events(events: DataFrame) -> DataFrame:
    """Streaming per-user record highs via transformWithStateInPandas."""
    proc = RecordHighProcessor()
    return (
        events.select("event_id", "ts", "user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=RECORD_HIGH_OUTPUT,
            outputMode="Append",
            timeMode="None",
        )
    )
