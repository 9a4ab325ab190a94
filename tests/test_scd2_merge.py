"""Behavioral pins for operators/merge.scd2_merge — each MERGE case
exercised in isolation on hand-built frames (the staged catalog entry
checks the end-to-end merge ≡ rebuild identity against the oracle; these
localize WHICH upsert rule broke when that identity fails)."""

from datetime import datetime

from pyspark.sql import functions as F

from steampipe_plugin_terraform_spark.operators import merge

BASE_SCHEMA = "user_id long, segment string, valid_from timestamp, valid_to timestamp"
BATCH_SCHEMA = "user_id long, day timestamp, event_type string"


def _d(day: int) -> datetime:
    return datetime(2024, 1, day)


def _merged(spark, base_rows, batch_rows):
    base = spark.createDataFrame(base_rows, BASE_SCHEMA)
    batch = spark.createDataFrame(batch_rows, BATCH_SCHEMA)
    out = merge.scd2_merge(base, batch, val_col="event_type")
    return {
        (r.user_id, r.segment, r.valid_from, r.valid_to) for r in out.collect()
    }


def test_batch_continues_open_segment(spark):
    # same value: the open segment extends — original valid_from kept,
    # still open, no extra rows
    got = _merged(
        spark,
        [(1, "a", _d(1), _d(3)), (1, "b", _d(3), None)],
        [(1, _d(5), "b"), (1, _d(6), "b")],
    )
    assert got == {(1, "a", _d(1), _d(3)), (1, "b", _d(3), None)}


def test_batch_closes_open_segment_and_inserts(spark):
    # changed value: open segment closes at the change day, new open
    # segment inserted; the closed row passes through untouched
    got = _merged(
        spark,
        [(1, "a", _d(1), _d(3)), (1, "b", _d(3), None)],
        [(1, _d(5), "b"), (1, _d(6), "c")],
    )
    assert got == {
        (1, "a", _d(1), _d(3)),
        (1, "b", _d(3), _d(6)),
        (1, "c", _d(6), None),
    }


def test_batch_only_key_is_pure_insert(spark):
    got = _merged(spark, [], [(7, _d(5), "x"), (7, _d(6), "y")])
    assert got == {(7, "x", _d(5), _d(6)), (7, "y", _d(6), None)}


def test_key_absent_from_batch_is_untouched(spark):
    got = _merged(
        spark,
        [(1, "a", _d(1), _d(2)), (1, "b", _d(2), None), (2, "z", _d(1), None)],
        [(2, _d(5), "z")],
    )
    assert got == {
        (1, "a", _d(1), _d(2)),
        (1, "b", _d(2), None),
        (2, "z", _d(1), None),
    }


def _rle(stream):
    """Pure-Python reference rebuild: (day, value) stream (day-sorted) →
    SCD2 segments {(value, valid_from, valid_to)} with the last open."""
    segs, start, cur = [], None, None
    for day, val in stream:
        if val != cur:
            if cur is not None:
                segs.append((cur, start, day))
            start, cur = day, val
    if cur is not None:
        segs.append((cur, start, None))
    return segs


def test_merge_equals_rebuild_randomized(spark):
    """The identity on 200 seeded-random user streams at three split
    horizons, in ONE operator call per horizon (disjoint users share the
    frames): base = reference-RLE of the prefix, batch = the suffix rows,
    merged must equal the reference-RLE of the whole stream — including
    users entirely in the prefix, entirely in the suffix, and every
    continue/close/insert interleaving the generator happens to hit."""
    import random

    rng = random.Random(8)
    streams = {
        u: [
            (_d(day), rng.choice("abc"))
            for day in sorted(rng.sample(range(1, 29), rng.randint(1, 12)))
        ]
        for u in range(200)
    }
    want = {
        (u, v, f, t) for u, s in streams.items() for v, f, t in _rle(s)
    }
    for h in (5, 15, 27):
        cut = _d(h)
        base_rows = [
            (u, v, f, t)
            for u, s in streams.items()
            for v, f, t in _rle([(d, x) for d, x in s if d < cut])
        ]
        batch_rows = [
            (u, d, x) for u, s in streams.items() for d, x in s if d >= cut
        ]
        got = _merged(spark, base_rows, batch_rows)
        assert {(u, v, f, t) for u, v, f, t in got} == want, f"horizon {h}"


def test_merge_equals_rebuild_at_two_horizons(spark):
    """The maintenance identity the staged entry stakes its oracle on,
    checked Spark-vs-Spark at the entry's own horizon (max day − 6) AND
    a second one (− 13), so the identity is pinned beyond the single
    split point the driver sees."""
    from steampipe_plugin_terraform_spark.catalog import (
        QUERIES,
        _scd2_merge_at,
        _t,
    )

    sf = "/root/testdata/sf0.001"
    ev = _t(spark, sf, "events")
    span = ev.agg(
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("s")
    ).collect()[0].s
    assert span > 14 * 86400, "fixture too short for the second horizon"

    rebuild = {tuple(r) for r in QUERIES["q_user_scd2_segments"](spark, sf).collect()}
    for days_back in (6, 13):
        merged = {tuple(r) for r in _scd2_merge_at(spark, sf, days_back).collect()}
        assert merged == rebuild, f"merge != rebuild at horizon -{days_back}d"


def test_duplicate_key_day_batch_rows_are_deterministic(spark):
    # CONTRACT-VIOLATING input (two batch rows for one (key, day)) must
    # degrade deterministically, not shuffle-order-dependently: both
    # windows tiebreak on the value, so the value-earlier row survives
    # as a zero-length [day, day) segment and the value-later row wins
    # the day. Pinned so a future window edit can't silently reintroduce
    # run-to-run nondeterminism (r8 review finding).
    expected = {
        (1, "x", _d(5), _d(5)),  # zero-length loser segment
        (1, "y", _d(5), None),
    }
    for _ in range(3):
        got = _merged(spark, [], [(1, _d(5), "x"), (1, _d(5), "y")])
        assert got == expected
