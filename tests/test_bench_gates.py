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


def test_prev_headline_loader_returns_latest_round(tmp_path):
    import json
    import os

    d = tmp_path / "bench_results"
    os.makedirs(d)
    (d / "r08.json").write_text(json.dumps({"queries": {"a": 9.0}}))
    (d / "r12.json").write_text(json.dumps({"queries": {"a": 1.0, "b": 2.0}}))
    got = bench._load_prev_headline(str(tmp_path))
    assert got == {"a": 1.0, "b": 2.0}
