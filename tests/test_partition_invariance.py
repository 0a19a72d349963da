"""Partition-count invariance: a query's collected result must be
bit-identical no matter how many shuffle partitions execute it —
the property that makes the DECIMAL/rounded-term discipline real.
A result that drifts between 3 and 8 partitions at sf0.001 WILL
drift between 32 and 20,000 partitions at 100 TB; this pins the
determinism contract at the cheapest scale that can break it.
"""

from __future__ import annotations

import pytest

from bireme_spark.registry import queries
from tests.conftest import SF_DIR

# r11 (VERDICT #2): deep recompute / e2e tier — deselected from the
# driver's default pytest path; round close runs `pytest -m ""`.
pytestmark = pytest.mark.slow

# A cross-section of aggregation styles: DECIMAL money sums (q1),
# double-division stats (winsorized/RFM), rounded-term LM sums
# (unigram), histogram-CDF boundaries (perplexity filter), iterative
# DECIMAL updates via star-contraction (dedup components is slow —
# covered by its own determinism test), and integer sweeps (backlog).
_PINNED = [
    "q1_pricing_summary",
    "lineitem_winsorized_stats",
    "customers_rfm_segmentation",
    "text_unigram_logprob",
    "corpus_perplexity_filter",
    "events_conversion_latency",
    "orders_open_backlog",
    "orders_holt_forecast",
    "customers_lorenz_deciles",
    "events_ks_test",
    "lineitem_abc_classification",
    # round-5 additions: series/histogram statistics (exact integer
    # sufficient stats), sampled graph estimate (deterministic
    # coins), survival curve (cumulative products), reconciliation
    # (full-outer fold), migration matrix (two CDF boundary sets)
    "orders_seasonal_decompose",
    "events_mann_kendall",
    "customers_survival_km",
    "lineitem_mannwhitney_u",
    "graph_triangle_count_approx",
    "cdc_incremental_snapshot",
    "customers_value_migration",
    "orders_zorder_layout",
    # round-5 late additions: log-term decimal sums (Theil), integer
    # CDF sweep (Wasserstein), coalition lattice (Shapley), Decimal
    # fold (Croston), portable-hash LSH eval (MinHash eval), linear
    # sketch (CMS), rank-order reconcile (bootstrap)
    "lineitem_theil_decomposition",
    "orders_wasserstein_drift",
    "events_shapley_attribution",
    "parts_croston_forecast",
    "dedup_minhash_eval",
    "events_cms_heavy_hitters",
    "cdc_bootstrap_reconcile",
    "orders_cusum_control",
    "cdc_table_diff",
    "graph_link_prediction",
    "text_bm25_search",
    "events_periodogram",
    "parts_abc_xyz_matrix",
    "embedding_intrinsic_dim",
    "graph_kcore_peel",
    "events_watermark_lateness",
    # round-5 session-3 additions: IEEE closing expressions on exact
    # sufficient stats (Welch/Spearman/Little), integer-median pairs
    # (Theil-Sen), minimax relational PAVA (isotonic), dyadic R/S
    # folds (Hurst), 6dp DECIMAL cell/weight sums (LLR, NB), lag-
    # clamp integer MATTR, sequential array folds (JL projection),
    # histogram-CDF buckets (curriculum), boundary sweep (peak WIP)
    "lineitem_welch_ttest",
    "customers_spearman",
    "orders_little_law",
    "orders_theil_sen",
    "orders_isotonic_fit",
    "events_hurst_exponent",
    "text_collocations_llr",
    "text_mattr_diversity",
    "text_naive_bayes",
    "embedding_random_projection",
    "corpus_curriculum_schedule",
    "orders_peak_wip",
    "graph_adamic_adar",
    "cdc_txn_boundary_apply",
    # grouped OLS sums, histogram-CDF fractiles, integer Fano,
    # n-scaled AR(2) covariances, trig-Decimal DFT, unrolled Lloyd,
    # md5 bootstrap order statistics
    "lineitem_price_elasticity",
    "parts_newsvendor_stock",
    "text_word_burstiness",
    "orders_ar2_forecast",
    "multimodal_spectral_centroid",
    "embedding_kmeans_convergence",
    "orders_bootstrap_ci",
    # iterative-DECIMAL PageRank, decimal-threshold SAX, integer
    # Viterbi path string
    "text_textrank_keywords",
    "events_sax_motifs",
    "events_burst_viterbi",
    # seasonal Decimal fold, max-normalized HITS rounds, EM
    # responsibility sums
    "orders_holt_winters",
    "graph_hits_authorities",
    "lineitem_em_mixture",
    # temperature pow-weights, md5 block coins, epoch-integer rate
    # test, integer-ppb power iteration
    "corpus_mixing_temperature",
    "corpus_span_corruption_plan",
    "events_poisson_rate_test",
    "embedding_power_iteration",
    # closed-form backtest lags, 3-round re-estimated ESD,
    # largest-remainder integer allocation
    "orders_forecast_backtest",
    "events_esd_outliers",
    "lineitem_neyman_allocation",
    # cumulative-histogram running median, KMV bottom-k merge
    "orders_running_median",
    "events_bottomk_sketch",
    # user-grain 2x2 cells + Woolf CI, blocked nearest-length triplets
    "events_odds_ratio",
    "corpus_contrastive_pairs",
    # lattice max-merge, decimal CUPED moments
    "cdc_crdt_counter",
    "events_cuped_adjustment",
    # cross-multiplied SPC limits, histogram-CDF deciles, two-stage
    # integer Gini
    "orders_xbar_r_chart",
    "customers_decile_lift",
    "events_gini_stump",
    "nations_atkinson_index",
    # staged 6dp TOPSIS pipeline, integer-micro Weibull OLS, md5 SRM
    "suppliers_topsis_scorecard",
    "orders_weibull_fit",
    "customers_srm_check",
    # conformal integer quantile, integer-micro PELT DP
    "lineitem_conformal_interval",
    "events_pelt_segmentation",
    # freq-of-freqs integer table, integer-ppm EB shrinkage
    "text_good_turing",
    "events_eb_shrinkage",
    # exact integer KPSS ratio, µs dwell histogram medians
    "events_kpss_stationarity",
    "events_dwell_semi_markov",
    "orders_dtw_yearly_shape",
    # md5-sample expansion estimators
    "lineitem_post_stratification",
    "orders_capture_recapture",
    # widened-schema era normalize, integer pinball losses
    "cdc_type_widening_ingest",
    "orders_pinball_eval",
    # cross-multiplied RQA, integer-ppm rich club
    "events_recurrence_quantification",
    "graph_rich_club",
    "graph_boruvka_msf",
    # round-9 continuation: integer DFA profile boxes, md5 ±1 linear
    # sketch sums, DECIMAL(38,0) spectrum division (Yule K),
    # checkpointed-edge integer modularity, per-term e6 S-curve sums
    # (LSH advisor), per-cell e6 ln OLS (experience curve), exact
    # Wald-ratio sufficient stats (IV), bucketed triplet margins
    "events_dfa_exponent",
    "events_ams_f2_sketch",
    "text_yule_k",
    "graph_modularity",
    "dedup_lsh_tuning",
    "parts_experience_curve",
    "lineitem_iv_regression",
    "embedding_triplet_eval",
]


@pytest.mark.parametrize("name", _PINNED)
def test_result_identical_across_partition_counts(spark, name):
    fn = queries()[name]
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        rows_3 = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    rows_8 = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    assert rows_3 == rows_8, f"{name} drifts with shuffle partition count"
