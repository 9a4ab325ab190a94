"""Incremental MERGE/upsert over a slowly-changing-dimension (SCD2) store —
the CDC-shaped maintenance operation every warehouse dimension needs: given
the existing validity-interval store and a batch of newer change rows, emit
the post-merge store WITHOUT re-reading historical facts.

Semantics (classic SCD2 upsert, run-length form):
- CLOSED segments (``valid_to`` set) are immutable — facts before the batch
  horizon are append-only history, so those rows pass through untouched.
- Each key's OPEN segment (``valid_to`` NULL) is the only row the batch can
  affect: if the batch's first value for the key differs, the open segment
  closes at that change day and new segment rows are inserted; if it
  matches, the segment extends (keeps its original ``valid_from``).
- Keys appearing only in the batch are pure inserts; keys absent from the
  batch keep their open segment open.

Correctness contract: with batch days at-or-after every base day (and no
day straddling the split), the merged store is IDENTICAL to a full rebuild
over all facts — run-length encoding of a sequence is prefix-stable, so
re-deriving only [open-segment start, …] ∪ batch reproduces the rebuild's
tail exactly. That identity is what the catalog entry's oracle checks (the
oracle IS the full-rebuild SQL) and what makes this safe to run forever
incrementally.

Scale design: the merge never touches closed history or raw facts — its
working set is (#open segments = #keys) + (#batch change rows), shuffled
once on the key for the change-detection window. At 100 TB the daily
batch is a few partitions of the collapsed (key, day, value) frame and the
open-segment frame is one row per key; the closed store streams through
union-only (no shuffle, no rewrite) — append-only output, exactly how an
SCD2 table wants to be maintained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_merge(
    base: DataFrame,
    batch: DataFrame,
    key_col: str = "user_id",
    seg_col: str = "segment",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    day_col: str = "day",
    val_col: str = "value",
) -> DataFrame:
    """MERGE ``batch`` (key, day, value — the CDC rows, days at-or-after
    every base day) into ``base`` (key, segment, valid_from, valid_to —
    an SCD2 store). Returns the merged store with the same schema as
    ``base``.

    The open segment re-enters change detection as a virtual change row
    at its own ``valid_from`` — so "batch continues the segment" and
    "batch changes it on day one" both fall out of the ordinary lag
    comparison, with no special cases.

    The batch contract is ONE row per (key, day) — a CDC frame collapsed
    per day, like the dominance frame the catalog entry feeds it. Both
    windows still carry a value tiebreak so contract-violating duplicate
    (key, day) rows degrade to a DETERMINISTIC result (value-ordered:
    the earlier value survives as a zero-length [day, day) segment, the
    later one wins the day) instead of a shuffle-order-dependent one —
    every window in this repo orders on a total key for exactly this
    reason."""
    closed = base.filter(F.col(to_col).isNotNull())
    virtual_open = base.filter(F.col(to_col).isNull()).select(
        F.col(key_col),
        F.col(from_col).alias(day_col),
        F.col(seg_col).alias(val_col),
    )
    live = virtual_open.unionByName(
        batch.select(F.col(key_col), F.col(day_col), F.col(val_col))
    )
    w = Window.partitionBy(key_col).orderBy(day_col, val_col)
    changes = (
        live.withColumn("__prev", F.lag(val_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(val_col)))
        .select(
            F.col(key_col),
            F.col(val_col).alias(seg_col),
            F.col(day_col).alias(from_col),
        )
    )
    wf = Window.partitionBy(key_col).orderBy(from_col, seg_col)
    tail = changes.select(
        key_col,
        seg_col,
        from_col,
        F.lead(from_col).over(wf).alias(to_col),
    )
    return closed.select(key_col, seg_col, from_col, to_col).unionByName(tail)
