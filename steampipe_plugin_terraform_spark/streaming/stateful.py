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
