"""Structural invariants for the round-9 operators — properties the
oracle-parity hash can't articulate (monotonicity, rank contracts,
probability ranges), at the smallest fixture SF."""

from __future__ import annotations

import pytest

from insurance_helper_spark.queries import catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    catalog.load_all()


def _run(spark, name):
    return catalog.QUERIES[name](spark, SF).collect()


class TestHybridRRF:
    def test_rank_contract_and_score_identity(self, spark):
        rows = _run(spark, "retrieval_hybrid_rrf_topk")
        by_q = {}
        for r in rows:
            by_q.setdefault(r["qid"], []).append(r)
        assert by_q, "no query docs"
        for qid, rs in by_q.items():
            ranks = sorted(r["fused_rank"] for r in rs)
            assert ranks == list(range(1, len(rs) + 1)), qid
            assert len(rs) <= 10
            for r in rs:
                # no self-retrieval; 0 = absent from that leg's top-20
                assert r["doc_id"] != qid
                assert 0 <= r["lex_rank"] <= 20 and 0 <= r["vec_rank"] <= 20
                assert r["lex_rank"] > 0 or r["vec_rank"] > 0
                expect = (1.0 / (60 + r["lex_rank"]) if r["lex_rank"] else 0.0) + (
                    1.0 / (60 + r["vec_rank"]) if r["vec_rank"] else 0.0
                )
                assert abs(r["rrf_score"] - expect) < 5e-7, r
            # fused order is non-increasing in score
            ordered = sorted(rs, key=lambda r: r["fused_rank"])
            for a, b in zip(ordered, ordered[1:]):
                assert a["rrf_score"] >= b["rrf_score"]


class TestAnnFrontier:
    def test_three_tiers_and_ranges(self, spark):
        rows = {r["tier"]: r for r in _run(spark, "similarity_ann_frontier_eval")}
        assert set(rows) == {
            "srp_bucket_16b4",
            "srp_multiprobe_h1",
            "ivf_k16_nprobe4",
        }
        for r in rows.values():
            assert 0.0 <= r["recall_at_10"] <= 1.0
            assert 0.0 <= r["scan_frac"] <= 1.0
            assert r["total_hits"] <= r["total_exact"]
        # multiprobe dominates the exact-bucket tier on recall (it scans
        # a strict superset of candidates) and costs more scan
        assert (
            rows["srp_multiprobe_h1"]["recall_at_10"]
            >= rows["srp_bucket_16b4"]["recall_at_10"]
        )
        assert (
            rows["srp_multiprobe_h1"]["scan_frac"]
            >= rows["srp_bucket_16b4"]["scan_frac"]
        )


class TestQualityTokenTradeoff:
    def test_monotone_and_anchored(self, spark):
        rows = sorted(
            _run(spark, "corpus_quality_token_tradeoff"),
            key=lambda r: r["threshold"],
        )
        assert len(rows) == 11
        assert rows[0]["threshold"] == 0.0
        # tau=0 keeps everything
        assert rows[0]["frac_docs"] == 1.0 and rows[0]["frac_tokens"] == 1.0
        for a, b in zip(rows, rows[1:]):
            assert a["docs_kept"] >= b["docs_kept"]
            assert a["tokens_kept"] >= b["tokens_kept"]


class TestLshBandPlanner:
    def test_s_curve_shape(self, spark):
        rows = _run(spark, "dedup_lsh_band_planner")
        assert len(rows) == 16  # 4 configs x 4 s values
        by_cfg = {}
        for r in rows:
            by_cfg.setdefault((r["bands"], r["rows_per_band"]), []).append(r)
        assert set(by_cfg) == {(64, 2), (32, 4), (16, 8), (8, 16)}
        for (b, rr), rs in by_cfg.items():
            assert b * rr == 128
            rs = sorted(rs, key=lambda r: r["s_jaccard"])
            # collision probability is non-decreasing in s (ties only at
            # round-6 saturation: b=64 r=2 is ~1-1e-29 at s>=0.8)
            for a, c in zip(rs, rs[1:]):
                assert a["p_collide"] <= c["p_collide"]
            for r in rs:
                assert 0.0 <= r["p_collide"] <= 1.0
                assert r["est_index_rows"] == r["n_docs"] * b
        # more rows per band -> higher s* threshold (steeper curve)
        t = {rr: rs[0]["s50_threshold"] for (b, rr), rs in by_cfg.items()}
        assert t[2] < t[4] < t[8] < t[16]


class TestFisherExact:
    def test_p_value_range_and_cells(self, spark):
        (r,) = _run(spark, "stat_fisher_exact_2x2")
        assert 0.0 < r["p_two_sided"] <= 1.0 + 1e-9
        assert min(r["a"], r["b"], r["c"], r["d"]) >= 0
        assert r["odds_ratio"] is None or r["odds_ratio"] >= 0.0


class TestCochranQ:
    def test_stat_nonnegative_and_df(self, spark):
        (r,) = _run(spark, "stat_cochran_q")
        assert r["df"] == r["k_years"] - 1
        assert r["q_stat"] is None or r["q_stat"] >= 0.0
        assert 0 <= r["total_successes"] <= r["n_subjects"] * r["k_years"]


class TestBreuschPagan:
    def test_lm_nonnegative(self, spark):
        rows = _run(spark, "stat_breusch_pagan")
        assert rows, "no groups with invertible Gram"
        for r in rows:
            assert r["df"] == 2
            if r["lm_stat"] is not None:
                assert r["lm_stat"] >= -1e-6
                assert r["reject_5pct"] == (r["lm_stat"] > 5.991)


class TestLdfSelection:
    def test_factor_bounds(self, spark):
        rows = _run(spark, "actuarial_ldf_selection")
        assert rows
        for r in rows:
            # cumulative spend never shrinks: every ratio >= 1
            assert r["min_ldf"] >= 1.0
            assert r["min_ldf"] <= r["vw_ldf"] <= r["max_ldf"] + 1e-9
            assert r["min_ldf"] <= r["simple_ldf"] <= r["max_ldf"] + 1e-9
            assert r["cdf_to_ultimate"] >= 1.0 - 1e-9
            assert r["to_age"] == r["from_age"] + 1


class TestBroadcastAudit:
    def test_bytes_accounting(self, spark):
        rows = {r["table_name"]: r for r in _run(spark, "ops_broadcast_threshold_audit")}
        assert set(rows) == {"region", "nation", "supplier", "customer", "part"}
        for r in rows.values():
            assert r["est_bytes"] >= 8 * r["n_rows"]  # at least one numeric each
            assert r["broadcastable"] == (r["est_bytes"] < 10 * 1024 * 1024)


class TestWave2Stats:
    def test_bartlett_nonnegative(self, spark):
        (r,) = _run(spark, "stat_bartlett_test")
        assert r["df"] == r["k_groups"] - 1
        assert r["bartlett_stat"] >= -1e-6
        assert r["pooled_var"] > 0

    def test_mood_median_counts(self, spark):
        (r,) = _run(spark, "stat_mood_median_test")
        assert r["chi2"] >= -1e-9
        assert r["df"] == r["k_groups"] - 1
        assert r["median_cents"] > 0

    def test_page_trend_l_bounds(self, spark):
        (r,) = _run(spark, "stat_page_trend_test")
        k, n, l_stat = r["k_treatments"], r["n_blocks"], r["l_stat"]
        # L is bounded by the perfectly anti-ordered / ordered rankings
        lo = n * sum(p * (k + 1 - p) for p in range(1, k + 1))
        hi = n * sum(p * p for p in range(1, k + 1))
        assert lo <= l_stat <= hi

    def test_jonckheere_bounds(self, spark):
        (r,) = _run(spark, "stat_jonckheere_terpstra")
        # 2J is bounded by twice the number of cross-group pairs
        assert 0 <= r["two_j"]
        assert abs(r["z_stat"]) < 50  # sanity: not a degenerate blowup

    def test_mack_sigma_consistency(self, spark):
        rows = {r["from_age"]: r for r in _run(spark, "actuarial_mack_sigma")}
        ldf = {r["from_age"]: r for r in _run(spark, "actuarial_ldf_selection")}
        assert rows
        for age, r in rows.items():
            assert r["sigma2"] >= 0.0 and r["se_factor"] >= 0.0
            assert r["n_cohorts"] >= 2
            # same vw factor as the LDF selection table
            assert age in ldf and abs(r["vw_ldf"] - ldf[age]["vw_ldf"]) < 1e-9
