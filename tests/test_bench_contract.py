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
    steal = {name: 999999 for name in timings}
    line = bench._driver_line(timings, 9999.999, 0.1, steal)
    assert len(line) < 6144, f"driver line would be {len(line)} bytes"


def test_driver_line_keeps_contract_and_adds_steal():
    """r15 verdict item 1 (additions-only contract change): the line
    keeps metric/value/unit/queries/streaming_drain/sf unchanged and
    adds per-entry steal ticks of the reported sample plus a run-level
    contamination flag. Unknown steal (-1) must never flag."""
    timings = {"q_a": 1.0, "q_b": 0.2}
    steal = {"q_a": 120, "q_b": 0, "q_c_unknown": -1}
    parsed = json.loads(bench._driver_line(timings, 5.5, 0.1, steal))
    assert parsed["metric"] == "headline_queries_total_time"
    assert parsed["value"] == 1.2
    assert parsed["unit"] == "sec"
    assert parsed["queries"] == timings
    assert parsed["streaming_drain"] == 5.5
    assert parsed["sf"] == 0.1
    assert parsed["steal_ticks"] == steal
    # 120 ticks over a 1.0 s sample is far past the 3 ticks/s gate;
    # 0 ticks and unknown (-1) stay clean
    assert parsed["steal_flagged"] == ["q_a"]
    # absolute floor: 1-2 stray ticks on a fast entry never flag
    assert not bench._steal_contaminated(0.1, 2)
    assert bench._steal_contaminated(0.1, 3)


def test_extended_tail_resamples_over_threshold(monkeypatch):
    """r14 verdict item 3: a single-sample extended entry that lands
    above the resample threshold must take ONE extra sample (min wins —
    the box's steal noise is one-sided), and a fast entry must not pay
    for a second pass. r15 item 1: each sample carries its steal-tick
    delta (fake counter: 7 ticks per pass here)."""
    clock = {"t": 0.0}
    steal = {"t": 1000}

    def fake_perf_counter():
        return clock["t"]

    def fake_steal():
        return steal["t"]

    def make_run(durations):
        it = iter(durations)

        def run():
            clock["t"] += next(it)
            steal["t"] += 7

        return run

    monkeypatch.setattr(bench.time, "perf_counter", fake_perf_counter)
    monkeypatch.setattr(bench, "_read_steal_ticks", fake_steal)

    # slow first sample (3.0 s > 2.0) -> one resample (1.5 s), 2 samples
    samples = bench._timed_samples(
        make_run([3.0, 1.5]), 1, resample_over=bench._EXT_RESAMPLE_THRESHOLD
    )
    assert [(round(s, 9), st) for s, st in samples] == [(3.0, 7), (1.5, 7)]
    # fast first sample -> no resample
    samples = bench._timed_samples(
        make_run([0.4]), 1, resample_over=bench._EXT_RESAMPLE_THRESHOLD
    )
    assert [(round(s, 9), st) for s, st in samples] == [(0.4, 7)]
    # multi-sample (heavy) entries never trigger the adaptive pass
    samples = bench._timed_samples(make_run([3.0, 3.0]), 2, resample_over=None)
    assert [(round(s, 9), st) for s, st in samples] == [(3.0, 7), (3.0, 7)]
    assert bench._EXT_RESAMPLE_THRESHOLD == 2.0

    # a steal reader that reports unavailable (-1) yields -1 deltas
    monkeypatch.setattr(bench, "_read_steal_ticks", lambda: -1)
    samples = bench._timed_samples(make_run([1.0]), 1)
    assert samples[0][1] == -1
    # the real reader returns an int (>=0 on Linux, -1 elsewhere)
    monkeypatch.undo()
    assert isinstance(bench._read_steal_ticks(), int)


def test_drain_key_stays_timed_and_out_of_the_sum():
    """The adopted r13 contract change is structural: the drained entry
    must remain in HEADLINE (so it keeps the warm+3-pass protocol) and
    be the one main() pops into the dedicated key."""
    assert bench._DRAIN_KEY in bench.HEADLINE
    assert bench._DRAIN_KEY == "stream_click_error_full_join"
