"""Driver-contract guards for bench.py — the round-6 failure mode was the
single stdout JSON line silently outgrowing the driver's tail capture.
These tests bound the line size STATICALLY (no Spark run) and pin the
name lists against the catalog so a rename can't silently bench nothing.
"""

import json

import bench
from steampipe_plugin_terraform_spark.catalog import QUERIES, STAGED_QUERIES


def test_headline_and_extended_name_catalog_entries():
    # HEADLINE resolves from the driver surface only; EXTENDED may also
    # time r9-staged entries (perf baseline ahead of promotion)
    unknown = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not unknown, f"headline names not in catalog: {unknown}"
    unknown = [
        n for n in bench.EXTENDED if n not in QUERIES and n not in STAGED_QUERIES
    ]
    assert not unknown, f"extended names not in catalog or staged: {unknown}"


def test_headline_extended_disjoint_and_unique():
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
    assert len(set(bench.EXTENDED)) == len(bench.EXTENDED)
    overlap = set(bench.HEADLINE) & set(bench.EXTENDED)
    assert not overlap, f"double-timed entries: {overlap}"
    assert bench._EXT_HEAVY <= set(bench.EXTENDED)


def test_driver_line_stays_small():
    """Reconstruct the driver-parsed line with worst-case-width timings;
    it must stay far below the ~8 KB capture limit that truncated
    BENCH_r06 (samples/spread/extended belong in BENCH_EXTENDED.json)."""
    timings = {name: 9999.999 for name in bench.HEADLINE + ["tf_parse_500_files"]}
    line = json.dumps(
        {
            "metric": "headline_queries_total_time",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            # r13 verdict item 2: the stream drain rides its own key
            # (the r14 transition-round value_incl_stream_drain field
            # was removed in r15 per the r14 advisory)
            "streaming_drain": 9999.999,
            "sf": 0.1,
        }
    )
    assert len(line) < 4096, f"driver line would be {len(line)} bytes"


def test_extended_tail_resamples_over_threshold(monkeypatch):
    """r14 verdict item 3: a single-sample extended entry that lands
    above the resample threshold must take ONE extra sample (min wins —
    the box's steal noise is one-sided), and a fast entry must not pay
    for a second pass."""
    clock = {"t": 0.0}

    def fake_perf_counter():
        return clock["t"]

    def make_run(durations):
        it = iter(durations)

        def run():
            clock["t"] += next(it)

        return run

    monkeypatch.setattr(bench.time, "perf_counter", fake_perf_counter)

    # slow first sample (3.0 s > 2.0) -> one resample (1.5 s), 2 samples
    samples = bench._timed_samples(
        make_run([3.0, 1.5]), 1, resample_over=bench._EXT_RESAMPLE_THRESHOLD
    )
    assert [round(s, 9) for s in samples] == [3.0, 1.5]
    # fast first sample -> no resample
    samples = bench._timed_samples(
        make_run([0.4]), 1, resample_over=bench._EXT_RESAMPLE_THRESHOLD
    )
    assert [round(s, 9) for s in samples] == [0.4]
    # multi-sample (heavy) entries never trigger the adaptive pass
    samples = bench._timed_samples(make_run([3.0, 3.0]), 2, resample_over=None)
    assert [round(s, 9) for s in samples] == [3.0, 3.0]
    assert bench._EXT_RESAMPLE_THRESHOLD == 2.0


def test_drain_key_stays_timed_and_out_of_the_sum():
    """The adopted r13 contract change is structural: the drained entry
    must remain in HEADLINE (so it keeps the warm+3-pass protocol) and
    be the one main() pops into the dedicated key."""
    assert bench._DRAIN_KEY in bench.HEADLINE
    assert bench._DRAIN_KEY == "stream_click_error_full_join"
