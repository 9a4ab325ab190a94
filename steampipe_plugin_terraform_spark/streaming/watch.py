"""Watch-mode: the reference's file-watching connection (S6) as a
Structured Streaming file source.

The reference tags its path config ``steampipe:"watch"`` and re-scans when
files change (connection_config.go:8-11, fsnotify). Spark's file stream
source natively picks up NEW files; modified-file re-read is not a file
source concept — re-trigger a batch (``trigger(availableNow=True)``) from a
driver-side watcher for that case (SURVEY §2.8, §7.4 risk 6).

Scale: the stream stays narrow (text wholetext → mapInPandas parse), so
watch-mode throughput is bounded by executor count, not a driver mutex like
the reference's parseMutex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import WIDE_SCHEMA, _make_parse_fn


def watch_terraform_blocks(
    spark: SparkSession,
    config_dir: str,
    kind: str = "config",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of wide table rows for every ``.tf`` file that
    appears under ``config_dir``.

    Returns an unbounded DataFrame; callers attach a sink
    (``.writeStream.format("memory")``, ``foreachBatch`` into the seven
    views, ...). File kind is fixed per watched dir (mirror of the three
    connection path lists); plan sniffing still promotes config files.
    """
    reader = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.tf" if kind == "config" else "*")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    files = reader.load(config_dir).select(
        F.col("_metadata.file_path").alias("path"),
        F.encode(F.col("value"), "utf-8").alias("content"),
    )
    # every file discovered by this stream carries the watched dir's kind
    parse = _make_parse_fn(on_error="skip", default_kind=kind)
    return files.mapInPandas(parse, schema=WIDE_SCHEMA)
