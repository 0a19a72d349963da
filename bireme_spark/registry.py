"""Central registry: every implemented operator/query (SURVEY.md §2)
maps a name → (spark_callable, oracle_sql | None).

``__spark_entry__.py`` re-exports this for the driver; tests iterate
it to run the same DuckDB-oracle comparison locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def _tz_safe(fn: QueryFn) -> QueryFn:
    """Force a UTC session timezone before running a query: the
    driver's SparkSession may default to a local zone, which would
    skew unix_timestamp/year/date math vs the DuckDB oracle's naive
    (UTC) timestamps."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS); honored on PySpark ≤4.0
        # only — 4.1.x reads TIMESTAMP_NTZ regardless and load_table
        # normalizes either shape (see sources/tables.py).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


# Queries that replay a stream or hit an embedded DB — an order of
# magnitude slower than the relational/batch ones. Under a bounded
# driver budget they run after every cheap not-yet-recorded query.
_SLOW = frozenset(
    {
        "streaming_sessionize",
        "streaming_tumbling_window",
        "streaming_sliding_window",
        "streaming_dedup",
        "streaming_cdc_pipeline",
        "streaming_scd2",
        "streaming_stream_join",
        "streaming_stream_join_outer",
        "cdc_multi_table_sync",
        "jdbc_merge_apply",
        "jdbc_incremental_pull",
        "embedding_knn_pagerank",
        "streaming_sketch_rollup",
        "streaming_cep_pattern",
    }
)

# Queries first registered in round 5+. Under the driver's bounded
# 50-query budget they must NOT jump ahead of operators that have
# been waiting since earlier rounds for their first CORRECTNESS row
# (VERDICT r4 item 3) — they rank after every other never-recorded
# query, before the already-recorded ones.
_NEW_THIS_ROUND = frozenset(
    {
        "debezium_mongo_parse",
        "graph_triangle_count_approx",
        "cdc_incremental_snapshot",
        "orders_seasonal_decompose",
        "dedup_incremental_probe",
        "events_mann_kendall",
        "tokenizer_bpe_apply",
        "orders_runs_test",
        "customers_survival_km",
        "corpus_dedup_survivorship",
        "orders_zorder_layout",
        "nations_revenue_decomposition",
        "customers_value_migration",
        "ann_recall_eval",
        "events_cep_pattern",
        "table_checksum_ranges",
        "streaming_cep_pattern",
        "lineitem_mannwhitney_u",
        "orders_priority_kendall_taub",
        "events_session_window_native",
        "embedding_whitening",
        "suppliers_similar_portfolios",
        "events_extreme_value_gumbel",
        "corpus_bloom_prefilter",
        "multimodal_silence_trim",
        "events_bot_screen",
        "events_snaive_mase",
        "parts_promo_did",
        "nations_return_rate_wilson",
        "lineitem_anova_f",
        "parts_price_index_fisher",
        "graph_assortativity",
        "orders_simpson_audit",
        "cdc_multi_master_lww",
        "events_window_funnel",
        "lineitem_theil_decomposition",
        "cdc_bootstrap_reconcile",
        "sink_vacuum_retention",
        "events_cms_heavy_hitters",
        "cdc_outbox_route",
        "jdbc_incremental_pull",
        "multimodal_edge_energy",
        "events_shapley_attribution",
        "orders_wasserstein_drift",
        "parts_croston_forecast",
        "dedup_minhash_eval",
        "cdc_pk_change_apply",
        "cdc_malformed_envelope_audit",
        "cdc_table_diff",
        "orders_cusum_control",
        "graph_link_prediction",
        "text_bm25_search",
        "events_periodogram",
        "parts_abc_xyz_matrix",
        "embedding_intrinsic_dim",
        "graph_kcore_peel",
        "events_watermark_lateness",
        "cdc_txn_boundary_apply",
        "cdc_column_masking",
        "lineitem_welch_ttest",
        "customers_spearman",
        "orders_little_law",
        "orders_theil_sen",
        "orders_isotonic_fit",
        "graph_adamic_adar",
        "graph_label_propagation",
        "events_hurst_exponent",
        "text_collocations_llr",
        "text_mattr_diversity",
        "text_naive_bayes",
        "embedding_random_projection",
        "multimodal_hist_equalization",
        "corpus_curriculum_schedule",
        "orders_peak_wip",
        "lineitem_price_elasticity",
        "parts_newsvendor_stock",
        "text_word_burstiness",
        "orders_ar2_forecast",
        "multimodal_spectral_centroid",
        "embedding_kmeans_convergence",
        "orders_bootstrap_ci",
        "text_textrank_keywords",
        "events_sax_motifs",
        "events_burst_viterbi",
        "orders_holt_winters",
        "graph_hits_authorities",
        "lineitem_em_mixture",
        "corpus_mixing_temperature",
        "corpus_span_corruption_plan",
        "events_poisson_rate_test",
        "embedding_power_iteration",
        "orders_forecast_backtest",
        "events_esd_outliers",
        "lineitem_neyman_allocation",
        "orders_running_median",
        "events_bottomk_sketch",
        "events_odds_ratio",
        "corpus_contrastive_pairs",
        "cdc_crdt_counter",
        "events_cuped_adjustment",
        "orders_xbar_r_chart",
        "customers_decile_lift",
        "events_gini_stump",
        "nations_atkinson_index",
        "suppliers_topsis_scorecard",
        "orders_weibull_fit",
        "customers_srm_check",
        "lineitem_conformal_interval",
        "events_pelt_segmentation",
        "text_good_turing",
        "events_eb_shrinkage",
        "events_kpss_stationarity",
        "events_dwell_semi_markov",
        "orders_dtw_yearly_shape",
        "lineitem_post_stratification",
        "orders_capture_recapture",
        "cdc_type_widening_ingest",
        "orders_pinball_eval",
        "events_recurrence_quantification",
        "graph_rich_club",
        "graph_boruvka_msf",
    }
)


def _recorded_rounds(root=None) -> dict[str, int]:
    """name → latest round number whose driver artifact has a green
    row for the query (oracle-green, or rows-only-by-design with
    rows). The artifact is budget-bounded — r01 stopped at exactly 50
    entries — so queries WITHOUT any row must run first to earn one,
    and recorded queries re-run stalest-first for regression cover."""
    import json
    import pathlib
    import re

    last: dict[str, int] = {}
    if root is None:
        root = pathlib.Path(__file__).resolve().parent.parent
    root = pathlib.Path(root)
    for art in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", art.name)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.loads(art.read_text())
        except (OSError, ValueError):
            continue
        for n, r in rows.items():
            if not isinstance(r, dict):
                continue
            err = r.get("err")
            if (
                not err
                and r.get("rows_match") is True
                and r.get("schema_match") is True
                and r.get("hash_match") is True
            ):
                green = True  # oracle-green row (all three compares)
            elif err == "no_oracle" and (r.get("spark_rows") or 0) > 0:
                # rows-only-by-design query that produced rows: it IS
                # recorded — re-running it every round would burn gate
                # budget that should re-confirm older oracle queries
                green = True
            else:
                green = False
            if green:
                last[n] = max(last.get(n, 0), rnd)
    return last


def _load() -> None:
    if _QUERIES:
        return
    # Iteration order matters: the driver records queries in dict
    # insertion order under a bounded budget (CORRECTNESS_r01 stopped
    # at exactly 50 entries). Final order (see _reorder below):
    # never-recorded cheap queries → never-recorded slow (streaming/
    # JDBC) queries → queries already green in a prior artifact.
    for mod_name in (
        "textops",
        "embeddings",
        "dedup",
        "ann",
        "multimodal",
        "timeseries",
        "maintenance",
        "relational",
        "audit",
        "terms",
        "streaming_sessions",
        "streaming",
        "cdc",
        "merge",
        "tpch",
        "events",
        "corpus",
        "tpch_deep",
    ):
        try:
            mod = __import__(f"bireme_spark.queries.{mod_name}", fromlist=["QUERIES", "ORACLE"])
        except ImportError:
            continue
        _QUERIES.update(getattr(mod, "QUERIES", {}))
        _ORACLE.update(getattr(mod, "ORACLE", {}))
    recorded = _recorded_rounds()

    def _rank(name: str) -> tuple[int, int, int]:
        if name not in recorded:
            if name in _NEW_THIS_ROUND:
                return (2, 0, 1 if name in _SLOW else 0)
            return (0, 0, 0) if name not in _SLOW else (1, 0, 0)
        # recorded: stalest green row first; cheap before slow at
        # equal staleness (the driver budget is wall-clock-sensitive)
        return (3, recorded[name], 1 if name in _SLOW else 0)

    ordered = sorted(_QUERIES, key=_rank)  # stable: module order within rank
    reordered = {name: _tz_safe(_QUERIES[name]) for name in ordered}
    _QUERIES.clear()
    _QUERIES.update(reordered)


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLE)
