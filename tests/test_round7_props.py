"""Property tests for the round-7 operators: bounds and invariants
that hold at ANY scale factor, complementing the exact DuckDB oracle
compare in tests/test_queries_oracle.py."""

from __future__ import annotations

import math
import pytest

# r11 (VERDICT #2): deep recompute / e2e tier — deselected from the
# driver's default pytest path; round close runs `pytest -m ""`.
pytestmark = pytest.mark.slow


def test_pagerank_mass_and_floor(spark, sf_dir):
    """Every rank >= the (1-d)/n teleport floor; total mass can only
    SHRINK from 1e9 (dangling nations leak by design, never gain)."""
    from bireme_spark.queries.audit import graph_pagerank

    rows = graph_pagerank(spark, sf_dir).collect()
    assert len(rows) == 25
    n = len(rows)
    floor = (1_000_000_000 - 850_000_000) // n
    total = sum(r["rank_e9"] for r in rows)
    assert all(r["rank_e9"] >= floor for r in rows)
    assert total <= 1_000_000_000
    assert total > floor * n  # damped mass actually circulates


def test_circular_stats_bounds(spark, sf_dir):
    """Resultant length R in [0,1]; Rayleigh z >= 0; mean angle in
    (-pi, pi]; near-uniform synthetic arrivals keep R small."""
    from bireme_spark.queries.events import events_circular_stats

    rows = events_circular_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["r_e6"] <= 1_000_000
        assert r["rayleigh_z_e0"] >= 0
        assert -math.pi <= r["mean_angle_rad"] <= math.pi
        assert r["r_e6"] < 250_000  # uniform-ish fixture: far from peaked


def test_allan_variance_structure(spark, sf_dir):
    """One row per tau; block counts consistent with the hour span;
    avar exactly FLOOR(sum_sq/(2*(M-1)*tau^2) * 1e6)."""
    from bireme_spark.queries.timeseries import _AVAR_TAUS, events_allan_variance

    rows = events_allan_variance(spark, sf_dir).collect()
    assert [r["tau_hours"] for r in rows] == list(_AVAR_TAUS)
    for r in rows:
        assert r["m_blocks"] >= 2
        assert r["sum_sq_diff"] >= 0
        expect = math.floor(
            r["sum_sq_diff"] * 1_000_000
            / (2.0 * (r["m_blocks"] - 1) * r["tau_hours"] ** 2)
        )
        assert r["avar_e6"] == expect


def test_ndcg_bounds(spark, sf_dir):
    """DCG <= ideal DCG, so nDCG in (0, 1]."""
    from bireme_spark.queries.terms import text_ndcg_eval

    rows = text_ndcg_eval(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 < r["dcg_e6"] <= r["idcg_e6"]
        assert 0.0 < r["ndcg_at_10"] <= 1.0
        assert r["n_hi"] <= r["n_rel"]


def test_quality_calibration_ppm_fields(spark, sf_dir):
    """Bins in 0..9; every ppm field in [0, 1e6]; gap is the |diff|."""
    from bireme_spark.queries.textops import text_quality_calibration

    rows = text_quality_calibration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["bin"] <= 9
        for c in ("mean_pred_ppm", "keep_rate_ppm", "abs_gap_ppm"):
            assert 0 <= r[c] <= 1_000_000
        assert r["abs_gap_ppm"] == abs(r["mean_pred_ppm"] - r["keep_rate_ppm"])


def test_norm_psi_finite_and_balanced(spark, sf_dir):
    """PSI terms finite (Laplace smoothing worked); the parity split
    puts both halves' totals within 2x of each other."""
    from bireme_spark.queries.embeddings import embedding_drift_psi

    rows = embedding_drift_psi(spark, sf_dir).collect()
    assert rows
    t_ref = sum(r["n_ref"] for r in rows)
    t_cand = sum(r["n_cand"] for r in rows)
    assert t_ref > 0 and t_cand > 0
    assert t_ref <= 2 * t_cand and t_cand <= 2 * t_ref
    for r in rows:
        assert math.isfinite(r["psi_term"])


def test_closeness_within_unit(spark, sf_dir):
    """Wasserman-Faust closeness <= 1 (sum_dist >= n_reached - 1)."""
    from bireme_spark.queries.audit import graph_closeness_sample

    rows = graph_closeness_sample(spark, sf_dir).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["sum_dist"] >= r["n_reached"] - 1
        assert 0 <= r["closeness_e6"] <= 1_000_000


def test_savepoint_resume_equals_full_replay(spark, sf_dir):
    """THE resume invariant: zero state mismatches vs cold replay,
    and every partition has a savepoint."""
    from bireme_spark.queries.cdc import cdc_savepoint_resume

    rows = cdc_savepoint_resume(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["n_mismatch"] == 0
        assert r["savepoint_offset"] >= 1


def test_format_autodetect_no_unknown(spark, sf_dir):
    """Shape detection routes every record: only the three real
    formats appear, each with insert rows."""
    from bireme_spark.queries.cdc import cdc_format_autodetect

    rows = cdc_format_autodetect(spark, sf_dir).collect()
    fmts = {r["format"] for r in rows}
    assert fmts == {"maxwell", "debezium", "debezium-mongo"}
    assert all(r["n_records"] > 0 for r in rows)


def test_validation_leakage_ratios(spark, sf_dir):
    """Leaked shingles never exceed the val total; ppm consistent."""
    from bireme_spark.queries.corpus import corpus_validation_leakage

    rows = corpus_validation_leakage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["leaked_shingles"] <= r["val_shingles"]
        assert r["n_leaky_docs"] <= r["n_val_docs"]
        assert r["leak_ppm"] == r["leaked_shingles"] * 1_000_000 // r["val_shingles"]


def test_page_hinkley_trajectory_identities(spark, sf_dir):
    """PH >= 0 (cum minus its running min); first row's cum is 0
    (x_1 equals its own prefix mean)."""
    from bireme_spark.queries.timeseries import events_page_hinkley

    rows = events_page_hinkley(spark, sf_dir).collect()
    assert rows and rows[0]["cum_e6"] == 0
    for r in rows:
        assert r["ph_e6"] >= 0
        assert r["alarm"] == (r["ph_e6"] > 3_000_000)


def test_seasonal_mk_pair_bounds(spark, sf_dir):
    """|S_m| <= C(n_m, 2); overall S is the column sum; z finite."""
    import math

    from bireme_spark.queries.timeseries import orders_seasonal_mann_kendall

    rows = orders_seasonal_mann_kendall(spark, sf_dir).collect()
    assert len(rows) == 12
    assert rows[0]["s_total"] == sum(r["s_m"] for r in rows)
    for r in rows:
        assert abs(r["s_m"]) <= r["n_m"] * (r["n_m"] - 1) // 2
        assert math.isfinite(r["z"])


def test_its_change_identities(spark, sf_dir):
    """slope_change == post - pre (to the 6dp emit); segments cover
    all months."""
    from bireme_spark.queries.timeseries import orders_interrupted_time_series

    r = orders_interrupted_time_series(spark, sf_dir).collect()[0]
    assert r["n_pre"] > 0 and r["n_post"] > 0
    assert abs(
        r["slope_change_cents"] - (r["post_slope_cents"] - r["pre_slope_cents"])
    ) < 2e-6


def test_kappa_range_and_confusion_total(spark, sf_dir):
    """kappa in [-1, 1]; confusion cells partition n."""
    from bireme_spark.queries.relational import orders_cohens_kappa

    r = orders_cohens_kappa(spark, sf_dir).collect()[0]
    assert r["n_both"] + r["n_a_only"] + r["n_b_only"] + r["n_neither"] == r["n"]
    assert -1.0 <= r["kappa"] <= 1.0


def test_k_anonymity_partition(spark, sf_dir):
    """Band shares sum to ~1e6 ppm; min_k consistent with the band."""
    from bireme_spark.queries.audit import events_k_anonymity

    rows = events_k_anonymity(spark, sf_dir).collect()
    assert sum(r["share_ppm"] for r in rows) <= 1_000_000
    lo = {"1-unique": (1, 1), "2-4": (2, 4), "5-9": (5, 9), "10+": (10, 10**9)}
    for r in rows:
        a, b = lo[r["k_band"]]
        assert a <= r["min_k"] <= b


def test_rake_scores_exceed_unity(spark, sf_dir):
    """degree >= freq (every occurrence contributes phrase_len >= 1),
    so score_e6 >= 1e6; words are non-stopwords."""
    from bireme_spark.queries.textops import text_rake_keywords

    rows = text_rake_keywords(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["word"] not in ("a", "the")
        assert r["degree"] >= r["freq"] >= 3
        assert r["score_e6"] >= 1_000_000


def test_anisotropy_bounds(spark, sf_dir):
    """Cosine stats bounded: |mean| <= max|cos| <= 1; var >= 0."""
    from bireme_spark.queries.embeddings import embedding_anisotropy

    r = embedding_anisotropy(spark, sf_dir).collect()[0]
    assert r["n_pairs"] == 64 * 63 // 2
    assert abs(r["mean_cos_e6"]) <= r["max_abs_cos_e6"] <= 1_000_001
    assert r["var_cos_e12"] >= 0


def test_sync_throughput_spread_and_gap(spark, sf_dir):
    """Partition spread min<=max; op counts partition records; gap is
    non-negative and 0 on the newest day."""
    from bireme_spark.queries.cdc import cdc_sync_throughput_report

    rows = cdc_sync_throughput_report(spark, sf_dir).collect()
    assert rows
    assert any(r["sync_gap_days"] == 0 for r in rows) or len(rows) == 100
    for r in rows:
        assert r["min_part_records"] <= r["max_part_records"]
        assert r["n_insert"] + r["n_update"] + r["n_delete"] == r["n_records"]
        assert r["sync_gap_days"] >= 0


def test_tombstone_bands_consistent(spark, sf_dir):
    """Ages inside their band; gc_eligible iff min age >= retention."""
    from bireme_spark.queries.cdc import cdc_tombstone_gc_plan

    rows = cdc_tombstone_gc_plan(spark, sf_dir).collect()
    edges = {"000-089": (0, 89), "090-364": (90, 364), "365-729": (365, 729),
             "730+": (730, 10**9)}
    for r in rows:
        lo, hi = edges[r["age_band"]]
        assert lo <= r["min_age_days"] <= r["max_age_days"] <= hi
        assert r["gc_eligible"] == (r["min_age_days"] >= 365)


def test_burstiness_memory_ranges(spark, sf_dir):
    """B in (-1, 1); M in [-1, 1]; mean gap positive."""
    from bireme_spark.queries.timeseries import events_burstiness_memory

    rows = events_burstiness_memory(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 < r["burstiness_b"] < 1.0
        assert -1.0 <= r["memory_m"] <= 1.0
        assert r["mean_gap_ms"] > 0


def test_rca_scale_identity(spark, sf_dir):
    """RCA is a share-of-share ratio: top cells must exceed 1e6 ppm
    (else they would not be 'revealed advantage')."""
    from bireme_spark.queries.relational import nations_rca_matrix

    rows = nations_rca_matrix(spark, sf_dir).collect()
    assert len(rows) == 30
    assert all(rows[i]["rca_ppm"] >= rows[i + 1]["rca_ppm"] for i in range(29))
    assert rows[0]["rca_ppm"] > 1_000_000


def test_length_bias_deciles(spark, sf_dir):
    """Deciles ordered and contiguous in char ranges; ppm bounded."""
    from bireme_spark.queries.textops import corpus_length_bias_audit

    rows = corpus_length_bias_audit(spark, sf_dir).collect()
    assert rows == sorted(rows, key=lambda r: r["decile"])
    for a, b in zip(rows, rows[1:]):
        assert a["max_chars"] <= b["min_chars"]
    for r in rows:
        assert 0 <= r["keep_rate_ppm"] <= 1_000_000


def test_hubness_mass_conservation(spark, sf_dir):
    """Sum k_occ * n_points == 64 * 5 (every NN slot lands somewhere);
    points partition across occurrence counts."""
    from bireme_spark.queries.embeddings import embedding_hubness_audit

    rows = embedding_hubness_audit(spark, sf_dir).collect()
    assert sum(r["n_points"] for r in rows) == 64
    assert sum(r["k_occ"] * r["n_points"] for r in rows) == 64 * 5


def test_vocab_pruning_monotone(spark, sf_dir):
    """Coverage is monotone in k and bounded by 1e6 ppm."""
    from bireme_spark.queries.terms import tokenizer_vocab_pruning

    rows = tokenizer_vocab_pruning(spark, sf_dir).collect()
    assert [r["vocab_k"] for r in rows] == [100, 200, 400]
    cov = [r["coverage_ppm"] for r in rows]
    assert cov == sorted(cov)
    for r in rows:
        assert r["in_vocab_tokens"] + r["oov_tokens"] == r["total_tokens"]
        assert 0 < r["coverage_ppm"] <= 1_000_000
