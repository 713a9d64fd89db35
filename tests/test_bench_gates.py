"""bench.py gate logic (pure functions — no Spark): the r13
suite-total gate and the previous-round headline loader's shape."""

from __future__ import annotations

import bench


class TestSuiteTotalGate:
    def test_fires_on_diffuse_regression(self):
        # every query 20% slower — under each per-query 2x budget, but
        # the total must trip (exactly the r12 escape this gate closes)
        prev = {f"q{i}": 1.0 for i in range(50)}
        now = {f"q{i}": 1.2 for i in range(50)}
        breach = bench._suite_total_gate(now, prev)
        assert breach == (60.0, 50.0, 50)

    def test_silent_at_parity_and_under_budget(self):
        prev = {f"q{i}": 1.0 for i in range(50)}
        assert bench._suite_total_gate(dict(prev), prev) is None
        now = {f"q{i}": 1.1 for i in range(50)}  # +10% < 1.15x
        assert bench._suite_total_gate(now, prev) is None

    def test_new_queries_do_not_count(self):
        # suite growth is not a regression: the new query's 100s must
        # not trip the gate, and the common set stays like-for-like
        prev = {"a": 1.0, "b": 1.0}
        now = {"a": 1.0, "b": 1.0, "brand_new": 100.0}
        assert bench._suite_total_gate(now, prev) is None

    def test_dropped_queries_stop_counting_both_sides(self):
        prev = {"a": 1.0, "gone": 50.0}
        now = {"a": 1.05}
        assert bench._suite_total_gate(now, prev) is None

    def test_empty_previous_round_is_silent(self):
        assert bench._suite_total_gate({"a": 1.0}, {}) is None


def test_prev_headline_loader_returns_latest_prior_round(tmp_path, monkeypatch):
    import json
    import os

    d = tmp_path / "bench_results"
    os.makedirs(d)
    (d / "r08.json").write_text(json.dumps({"queries": {"a": 9.0}}))
    (d / "r12.json").write_text(json.dumps({"queries": {"a": 1.0, "b": 2.0}}))
    (d / "r13.json").write_text(json.dumps({"queries": {"a": 5.0}}))
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "13")
    # the current round's own record (a re-run within the round) must
    # NOT become the baseline — the gate would self-compare to a no-op
    got = bench._load_prev_headline(str(tmp_path))
    assert got == {"a": 1.0, "b": 2.0}
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "14")
    assert bench._load_prev_headline(str(tmp_path)) == {"a": 5.0}


def test_prev_tier2_loader_skips_current_round(tmp_path, monkeypatch):
    import json
    import os

    d = tmp_path / "bench_results"
    os.makedirs(d)
    (d / "r12.json").write_text(json.dumps({"tier2": {"x": 1.0}}))
    (d / "r13.json").write_text(json.dumps({"tier2": {"x": 0.5}}))
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "13")
    assert bench._load_prev_tier2(str(tmp_path)) == {"x": 1.0}


def test_current_round_falls_back_to_driver_bench_files(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    (tmp_path / "BENCH_r12.json").write_text("{}")
    assert bench._current_round(str(tmp_path)) == 13
    assert bench._current_round(str(tmp_path / "nope_empty")) == 1


class TestRoundRecordMinMerge:
    """r14 (VERDICT r13 item 4): round records are cumulative per-query
    minima — a re-run merges instead of overwriting, so the next
    round's suite-total gate compares against the previous round's
    noise floor, and a driver re-run can never clobber a sharper
    builder record."""

    def test_min_merge_union_of_keys(self):
        import bench

        assert bench._min_merge({"a": 2.0, "b": 1.0}, {"a": 1.5, "c": 9.9}) == {
            "a": 1.5,
            "b": 1.0,
            "c": 9.9,
        }

    def test_persist_merges_and_recomputes_totals(self, tmp_path, monkeypatch):
        import json
        import os

        import bench

        monkeypatch.setattr(
            bench.os.path, "abspath", lambda _: str(tmp_path / "bench.py")
        )
        monkeypatch.setenv("SPARK_GRAFT_ROUND", "99")
        base = {
            "metric": "m", "value": 0.0, "tier2_total": 0.0,
            "cold_total": 0.0, "r1_comparable_total": 0.0,
        }
        bench._persist_round_timings(
            {**base, "queries": {"q1": 2.0, "q2": 1.0}, "tier2": {"t1": 5.0}},
            {"q1": 3.0},
        )
        bench._persist_round_timings(
            {**base, "queries": {"q1": 1.4, "q2": 3.0, "q3": 0.5}, "tier2": {"t1": 4.0}},
            {"q1": 2.0, "q2": 5.0},
        )
        rec = json.load(open(os.path.join(tmp_path, "bench_results", "r99.json")))
        assert rec["queries"] == {"q1": 1.4, "q2": 1.0, "q3": 0.5}
        assert rec["tier2"] == {"t1": 4.0}
        assert rec["cold"] == {"q1": 2.0, "q2": 5.0}
        assert rec["merged_runs"] == 2
        assert rec["value"] == 2.9
        assert rec["tier2_total"] == 4.0


class TestPerCpuRecords:
    """r15 (VERDICT r14 item 1): baselines and round records are keyed
    by core count — the driver's 8-core scaling run false-failed the
    suite-total gate against the 32-core min-merged noise floor."""

    def test_record_filename_standard_vs_low_core(self):
        assert bench._record_filename(15, 32) == "r15.json"
        assert bench._record_filename(15, 8) == "r15_c8.json"

    def test_no_baseline_at_other_cpu_count(self, tmp_path, monkeypatch):
        import json
        import os

        d = tmp_path / "bench_results"
        os.makedirs(d)
        (d / "r14.json").write_text(json.dumps({"queries": {"a": 1.0}}))
        monkeypatch.setenv("SPARK_GRAFT_ROUND", "15")
        # 32-core baseline resolves; 8-core has no record -> {} -> the
        # suite-total gate is skipped rather than falsely applied
        assert bench._load_prev_headline(str(tmp_path), 32) == {"a": 1.0}
        assert bench._load_prev_headline(str(tmp_path), 8) == {}
        assert bench._load_prev_tier2(str(tmp_path), 8) == {}

    def test_low_core_baseline_resolves_from_c_record(self, tmp_path, monkeypatch):
        import json
        import os

        d = tmp_path / "bench_results"
        os.makedirs(d)
        (d / "r14.json").write_text(json.dumps({"queries": {"a": 1.0}}))
        (d / "r14_c8.json").write_text(json.dumps({"queries": {"a": 3.0}}))
        monkeypatch.setenv("SPARK_GRAFT_ROUND", "15")
        assert bench._load_prev_headline(str(tmp_path), 8) == {"a": 3.0}

    def test_low_core_persist_does_not_touch_standard_record(
        self, tmp_path, monkeypatch
    ):
        import json
        import os

        monkeypatch.setattr(
            bench.os.path, "abspath", lambda _: str(tmp_path / "bench.py")
        )
        monkeypatch.setenv("SPARK_GRAFT_ROUND", "77")
        base = {
            "metric": "m", "value": 0.0, "tier2_total": 0.0,
            "cold_total": 0.0, "r1_comparable_total": 0.0,
        }
        bench._persist_round_timings(
            {**base, "queries": {"q1": 1.0}}, {}, cpus=32
        )
        bench._persist_round_timings(
            {**base, "queries": {"q1": 4.0}}, {}, cpus=8
        )
        std = json.load(open(os.path.join(tmp_path, "bench_results", "r77.json")))
        low = json.load(open(os.path.join(tmp_path, "bench_results", "r77_c8.json")))
        assert std["queries"] == {"q1": 1.0} and std["cpus"] == 32
        assert low["queries"] == {"q1": 4.0} and low["cpus"] == 8


class TestMergedRecordGate:
    """The suite-total gate compares min-merged round records, not a
    single fresh run vs the previous round's noise floor."""

    def test_noisy_fresh_run_over_a_sharp_round_record_passes(
        self, tmp_path, monkeypatch
    ):
        # builder runs earlier in the round put the record at the noise
        # floor; the driver's fresh run lands +29% (the r14 c8 reading).
        # Gating the MERGED record keeps the comparison floor-vs-floor.
        import json
        import os

        monkeypatch.setattr(
            bench.os.path, "abspath", lambda _: str(tmp_path / "bench.py")
        )
        monkeypatch.setenv("SPARK_GRAFT_ROUND", "15")
        d = tmp_path / "bench_results"
        os.makedirs(d)
        prev = {f"q{i}": 1.0 for i in range(50)}
        (d / "r14.json").write_text(json.dumps({"queries": prev}))
        (d / "r15.json").write_text(
            json.dumps({"queries": {f"q{i}": 1.01 for i in range(50)}})
        )
        base = {
            "metric": "m", "value": 0.0, "tier2_total": 0.0,
            "cold_total": 0.0, "r1_comparable_total": 0.0,
        }
        fresh = {f"q{i}": 1.29 for i in range(50)}  # +29% host-noise run
        merged = bench._persist_round_timings({**base, "queries": fresh}, {})
        prev_head = bench._load_prev_headline(str(tmp_path))
        assert bench._suite_total_gate(merged["queries"], prev_head) is None

    def test_synthetic_diffuse_tax_still_trips(self, tmp_path, monkeypatch):
        # a real +20% tax is in EVERY run of the round, so the merged
        # record carries it and the gate fires
        import json
        import os

        monkeypatch.setattr(
            bench.os.path, "abspath", lambda _: str(tmp_path / "bench.py")
        )
        monkeypatch.setenv("SPARK_GRAFT_ROUND", "15")
        d = tmp_path / "bench_results"
        os.makedirs(d)
        prev = {f"q{i}": 1.0 for i in range(50)}
        (d / "r14.json").write_text(json.dumps({"queries": prev}))
        base = {
            "metric": "m", "value": 0.0, "tier2_total": 0.0,
            "cold_total": 0.0, "r1_comparable_total": 0.0,
        }
        taxed = {f"q{i}": 1.2 for i in range(50)}
        merged = bench._persist_round_timings({**base, "queries": taxed}, {})
        merged = bench._persist_round_timings({**base, "queries": taxed}, {})
        prev_head = bench._load_prev_headline(str(tmp_path))
        breach = bench._suite_total_gate(merged["queries"], prev_head)
        assert breach == (60.0, 50.0, 50)
