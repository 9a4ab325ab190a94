"""Skew mitigation: salted equi-join for hot keys.

When one join key holds a disproportionate share of the fact rows (the
null-ish default id, the "unknown" user, the boilerplate bucket), hash
partitioning sends the whole hot key to ONE task. AQE's skew-join split
(`spark.sql.adaptive.skewJoin.*`) already repairs this for sort-merge
joins at runtime — reach for salting when AQE can't help: static plans,
stream-static joins, a dimension too big to broadcast but small enough to
replicate, or full-outer shapes AQE declines to split.

Mechanics: the skewed side gets a uniform salt in [0, salt); the other
side is replicated once per salt value; the join key becomes (key, salt),
splitting every hot key into ``salt`` independent tasks. Replication cost
is |other| · salt rows — choose the replicated side accordingly.

Result equality with the plain join is exact (inner/left semantics are
unchanged by salting; every (key, salt) pairing exists exactly once on the
replicated side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` with ``other`` on column(s) ``on``, splitting
    each hot key across ``salt`` tasks. ``how`` supports the shapes where
    salting preserves semantics with the SKEWED side as the preserved side:
    inner / left / left_semi / left_anti.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"how={how!r} not supported: salting preserves semantics only for "
            "inner/left/left_semi/left_anti with the skewed side preserved"
        )
    keys = [on] if isinstance(on, str) else list(on)
    for side, df in (("skewed", skewed), ("other", other)):
        if SALT_COL in df.columns:
            raise ValueError(
                f"{side} input already has a {SALT_COL!r} column — it would "
                "collide with the internal salt; rename it before salted_join"
            )

    # deterministic uniform salt — hash of the full row id-space would need a
    # row id; the key columns alone would put the whole hot key in one salt,
    # so mix in a per-row monotonic id (stable within a job, uniform across)
    salted = skewed.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )
    replicated = other.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias(SALT_COL)
    )
    out = salted.join(replicated, keys + [SALT_COL], how)
    return out.drop(SALT_COL)
