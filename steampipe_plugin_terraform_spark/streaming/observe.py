"""Streaming observability: a StreamingQueryListener that records
per-micro-batch progress (input rows, event-time watermark, state-store
row counts) into plain Python dicts.

At 100 TB this is the operational surface that tells you whether a
pipeline is healthy BEFORE results drift: input-rate vs processing-rate
divergence means the stream is falling behind; a stalled watermark means
one partition's event time stopped advancing (and append-mode windows
will stop closing); monotonically growing state rows on a bounded-state
operator means eviction is broken (a watermark/config bug that
otherwise surfaces as an executor OOM hours later). The reference's
analog is its file-watch diagnostics; here the engine exposes Spark's
own progress stream in queryable form.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Collects one dict per micro-batch progress event.

    Listener callbacks run on a background thread; appends to a list are
    atomic under the GIL, so readers see a consistent prefix. Use
    ``attach``/``detach`` (or the context manager) to scope registration
    to one drain — listeners are session-global in Spark.
    """

    def __init__(self) -> None:
        self.progress: list[dict] = []

    # -- StreamingQueryListener interface -------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        try:
            watermark = (p.eventTime or {}).get("watermark")
        except Exception:
            watermark = None
        self.progress.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "watermark": watermark,
                "state_rows_total": [s.numRowsTotal for s in (p.stateOperators or [])],
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- lifecycle ------------------------------------------------------
    def attach(self, spark: SparkSession) -> "ProgressRecorder":
        self._spark = spark
        spark.streams.addListener(self)
        return self

    def detach(self) -> None:
        self._spark.streams.removeListener(self)

    # -- derived health signals ----------------------------------------
    def total_input_rows(self) -> int:
        return sum(p["num_input_rows"] for p in self.progress)

    def final_watermark(self) -> str | None:
        for p in reversed(self.progress):
            if p["watermark"]:
                return p["watermark"]
        return None

    def max_state_rows(self) -> int:
        return max(
            (max(p["state_rows_total"], default=0) for p in self.progress),
            default=0,
        )
