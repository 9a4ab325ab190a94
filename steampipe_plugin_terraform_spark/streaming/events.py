"""Event-time streaming over the events table (SURVEY §2.8).

The reference has no streaming operators at all (its only stream-ish
behavior is file watching); these are the Spark-native event-time shapes a
user of the engine gets on top: watermarked tumbling windows, session
windows, and within-watermark dedup. All are standard Structured Streaming
operators — state lives in the state store, scales with executors, and
late data beyond the watermark is dropped deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) reads as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events parquet as a file source (ns → µs timestamp).

    The file stream source needs a directory; ``pathGlobFilter`` narrows it
    to the events file inside the multi-table sf dir."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total_value")
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows: events within `gap` of each other merge per user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("s.start").alias("session_start"), F.col("s.end").alias("session_end"), "n_events")
    )


def deduped_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-key events within the watermark horizon
    (dropDuplicatesWithinWatermark — the streaming exact-dedup analog)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["user_id", "event_type"])
