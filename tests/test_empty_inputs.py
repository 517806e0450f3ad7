"""Schema stability of every new-wave query on EMPTY input tables.

Self-contained (builds its own parquet fixtures): deliberately NOT inside
test_oracle_parity.py, whose module-level skipif would silently skip this
on machines without /root/testdata.
"""

import pytest

def test_new_queries_schema_stable_on_empty_inputs(ray_session, tmp_path):
    """Every wave-3/4/5 query must return a typed, schema-stable empty
    result when its input tables are empty (Ray groupby over zero rows
    yields a column-less frame that would otherwise KeyError)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    from tests.test_oracle_parity import _to_pandas

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "props": pa.array([], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_custkey": pa.array([], pa.int64()),
                "o_orderstatus": pa.array([], pa.string()),
                "o_totalprice": pa.array([], pa.float64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_orderpriority": pa.array([], pa.string()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "l_partkey": pa.array([], pa.int64()),
                "l_suppkey": pa.array([], pa.int64()),
                "l_quantity": pa.array([], pa.float64()),
                "l_extendedprice": pa.array([], pa.float64()),
                "l_discount": pa.array([], pa.float64()),
                "l_tax": pa.array([], pa.float64()),
                "l_returnflag": pa.array([], pa.string()),
                "l_shipdate": pa.array([], pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([], pa.int64()),
                "p_name": pa.array([], pa.string()),
                "p_type": pa.array([], pa.string()),
                "p_brand": pa.array([], pa.string()),
                "p_size": pa.array([], pa.int64()),
                "p_retailprice": pa.array([], pa.float64()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "c_name": pa.array([], pa.string()),
                "c_nationkey": pa.array([], pa.int32()),
                "c_acctbal": pa.array([], pa.float64()),
                "c_mktsegment": pa.array([], pa.string()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([], pa.int32()),
                "n_name": pa.array([], pa.string()),
                "n_regionkey": pa.array([], pa.int32()),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([], pa.int32()),
                "r_name": pa.array([], pa.string()),
            }
        ),
        str(tmp_path / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "s_nationkey": pa.array([], pa.int32()),
                "s_acctbal": pa.array([], pa.float64()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
                "label": pa.array([], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    qs = e.queries()
    expected = {
        "events_rolling_max3": ["event_type", "n", "rollmax_cents"],
        "user_event_paths": ["path", "n_users"],
        "events_cum_daily": ["event_type", "day", "n", "cum_n"],
        "events_daily_dense": ["event_type", "day", "n_rare"],
        "conversion_attribution": ["day", "n_purchases", "n_converted"],
        "events_range_join": ["window_id", "event_type", "n_events"],
        "events_range_join_bigwin": ["window_id", "event_type", "n_events"],
        "docs_gopher_rules": ["source", "n_docs", "n_wc_ok", "n_mwl_ok",
                              "n_uniq_ok", "n_stop_ok", "n_pass"],
        "gram_source_except": ["word", "n_exclusive_grams"],
        "docs_weighted_sample": ["doc_id", "samp_key"],
        "doc_top_terms": ["doc_id", "word", "score", "rank"],
        "events_type_share": ["event_type", "n", "share"],
        "docs_model_score": ["source", "n_docs", "n_keep", "sum_score_units"],
        "user_retention": ["cohort", "n_users", "n_retained_d1", "n_retained_d7"],
        "orders_open_per_day": ["day", "n_open"],
        "doc_prefix_editsim": ["doc_a", "doc_b", "dist"],
        "incremental_class_counts": ["class_id", "fingerprint", "total_queries"],
        "doc_chunks": ["doc_id", "chunk_seq", "n_chunk_tokens"],
        "docs_mixture_sample": ["source", "n_docs", "n_sampled", "cutoff"],
        "docs_near_dedup": ["source", "n_docs", "n_kept"],
        "docs_rep_bigram": ["source", "n_docs", "n_bigram_docs",
                            "n_flagged", "sum_top_cnt"],
        "docs_len_trim": ["source", "n_docs", "n_kept", "kept_chars",
                          "p05", "p95"],
        "source_word_kl": ["source", "word", "c_sw", "c_s", "c_w",
                           "log_ratio", "kl_term"],
        "user_transition_counts": ["prev_type", "next_type", "n"],
        "embed_decontam": ["vec_id", "eval_id", "cos"],
        "word_pmi_topk": ["word_a", "word_b", "n", "pmi"],
        "events_latest_value": ["event_type", "n_keys", "latest_value_cents"],
        "orders_big_quantity": ["o_orderkey", "o_custkey", "o_orderdate",
                                "total_qty", "price_cents"],
        "events_value_mad": ["event_type", "n_outliers", "med", "mad"],
        "events_hourly_top_type": ["hour_start", "top_type", "n_top",
                                   "n_total"],
        "doc_winnow_dups": ["doc_a", "doc_b", "n_shared"],
        "orders_monthly_growth": ["month", "n_orders", "delta"],
        "label_centroid_sim": ["label_a", "label_b", "cos"],
        "tpch_q10_returns": ["c_custkey", "c_name", "n_name", "n_lines",
                             "revenue_cents"],
        "tpch_q14_promo": ["month", "n_lines", "promo_cents", "total_cents",
                           "promo_pct"],
        "tpch_q15_top_supplier": ["s_suppkey", "s_name",
                                  "total_revenue_cents"],
        "tpch_q4_priority_returns": ["o_orderpriority", "n_orders"],
        "tpch_q16_brand_suppliers": ["p_brand", "n_suppliers"],
        "docs_dsir_weights": ["source", "n_docs", "n_selected", "sum_units"],
        "part_min_cost_supplier": ["p_brand", "n_parts",
                                   "sum_min_unit_cents",
                                   "sum_winner_suppkey"],
        "events_gap_fill": ["event_type", "hr", "is_filled", "filled_cents"],
        "ngram_containment_pairs": ["doc_a", "doc_b", "containment"],
        "docs_score_deciles": ["source", "decile", "n_docs"],
        "docs_temperature_alloc": ["source", "n_docs", "alloc"],
        "cohort_week_matrix": ["cohort", "wk_offset", "n_users"],
        "conversion_delay_p50": ["n_conversions", "p50_delay_min"],
        "slowlog_apdex": ["class_id", "n_queries", "n_satisfied",
                          "n_tolerating", "apdex"],
        "embed_dim_moments": ["dim", "n", "sum_units", "sumsq_units"],
        "events_csv_source": ["event_type", "n_rows", "sum_event_id"],
        "events_partitioned_sink": ["event_type", "n_rows", "sum_user_id"],
        "events_interarrival": ["user_id", "n_gaps", "avg_gap_sec",
                                "max_gap_sec"],
        "events_type_trend": ["event_type", "n", "slope_cents_per_hour",
                              "intercept_cents"],
        "users_weekly_churn": ["week", "n_active", "n_churned", "churn_pct"],
        "source_vocab_jaccard": ["src_a", "src_b", "n_a", "n_b", "n_inter",
                                 "jaccard"],
        "customers_dormant_rich": ["n_name", "n_cust", "acctbal_cents"],
        "events_value_pctrank": ["event_type", "value_cents", "n",
                                 "pct_rank"],
        "events_rolling_wau": ["day", "n_active_7d"],
        "pareto_customers": ["c_custkey", "revenue", "rnk", "cum_share"],
        "event_type_pairs": ["type_a", "type_b", "n_users"],
        "hashed_vocab_counts": ["source", "bucket", "n_tokens"],
        "doc_word_entropy": ["doc_id", "n_words", "n_types", "ttr",
                             "entropy"],
        "customers_rfm_cells": ["r_tile", "f_tile", "m_tile",
                                "n_customers"],
        "events_hour_anomaly": ["event_type", "day", "hod", "n",
                                "hr_total", "n_days"],
        "source_top_p_vocab": ["source", "word", "n", "rnk"],
        "embed_dim_clip": ["dim", "n", "lo_units", "hi_units",
                           "n_clipped"],
        "source_zipf_slope": ["source", "n_vocab", "sx_units", "sy_units",
                              "sxx_units", "sxy_units", "zipf_slope"],
        "events_type_hour_chi2": ["event_type", "hod", "o", "row_total",
                                  "col_total", "grand_total", "chi_term"],
        "parts_price_skyline": ["p_partkey", "p_size", "cents"],
        "orders_seasonal_index": ["month_of_year", "n_orders",
                                  "seasonal_index"],
        "user_activity_gini": ["n_users", "total_events", "gini"],
        "source_len_lognormal": ["source", "n_docs", "sum_ln_units",
                                 "sumsq_ln_units"],
        "tpch_q9_profit": ["nation", "o_year", "n_lines", "profit_cents"],
        "tpch_q11_top_value_parts": ["l_partkey", "value_cents"],
        "tpch_q12_priority_lines": ["l_returnflag", "high_lines",
                                    "low_lines"],
        "tpch_q18_big_orders": ["o_orderkey", "o_custkey", "c_name",
                                "sum_qty", "total_cents"],
        "tpch_q20_major_suppliers": ["s_suppkey", "s_name", "n_parts"],
        "doc_dup_spans": ["doc_id", "n_windows", "n_dup_windows",
                          "dup_frac"],
        "source_dup_rate": ["source", "n_windows", "n_dup_windows",
                            "dup_rate"],
        "source_overlap_matrix": ["src_a", "src_b", "n_a", "n_b",
                                  "n_shared", "overlap"],
        "doc_novelty_frac": ["source", "n_docs", "n_novel", "novelty"],
        "source_len_mad": ["source", "n_docs", "med_len", "mad_len"],
        "embed_quantize_error": ["dim", "n", "max_abs_units",
                                 "max_err_units", "sum_err_units",
                                 "mean_abs_err"],
        "lang_source_mi": ["lang", "source", "n", "lang_total",
                           "source_total", "grand_total",
                           "ln_ratio_units", "mi_term"],
        "source_simpson": ["source", "n_tokens", "n_vocab",
                           "sumsq_tokens", "simpson"],
        "events_burstiness": ["event_type", "n_events", "n_hours",
                              "sumsq_hourly", "fano"],
        "doc_pagerank": ["doc_id", "out_degree", "pr_units"],
        "docs_bm25_topk": ["rank", "doc_id", "n_tokens", "score_units"],
        "events_table_checksum": ["bucket", "n_rows", "checksum_sum",
                                  "checksum_xor"],
        "lang_confusion": ["lang", "pred_lang", "n", "n_lang", "share"],
        "region_revenue_rollup": ["region", "nation", "n_orders",
                                  "revenue_cents"],
        "users_new_vs_returning": ["day", "n_active", "n_new",
                                   "n_returning"],
        "orders_ship_lag_histogram": ["lag_days", "n_lines"],
        "embed_semdedup": ["cluster", "n_vecs", "n_dups"],
        "doc_continuation_pairs": ["doc_a", "doc_b"],
        "dup_cluster_sizes": ["cluster_size", "n_clusters"],
        "events_watermark_late": ["event_type", "n_events", "n_late"],
        "source_ngram_diversity": ["source", "n", "n_grams", "n_distinct",
                                   "diversity"],
        "corpus_version_diff": ["source", "n_same", "n_changed",
                                "n_removed", "n_added"],
        "source_fertility": ["source", "n_docs", "n_chars", "n_ws_tokens",
                             "n_bpe_pieces", "chars_per_word",
                             "chars_per_piece"],
        "tpch_q22_global_sales": ["cntrycode", "numcust", "totacctbal"],
        "heaps_vocab_growth": ["k", "doc_cut", "n_docs", "n_tokens",
                               "vocab"],
        "corpus_drift_psi": ["source", "bucket", "n_a", "n_b", "total_a",
                             "total_b", "ln_ratio_units", "psi_term"],
        "docs_score_auc": ["n_pos", "n_neg", "u2", "auc"],
        "events_spearman_daily": ["n_days", "num", "dx", "dy", "rho"],
        "source_len_ks": ["source_a", "source_b", "n_a", "n_b", "d_num",
                          "ks"],
        "events_autocorr_lag1": ["n_pairs", "num", "da", "db", "r1"],
        "orders_benford_digits": ["digit", "n", "observed_frac",
                                  "benford_frac"],
        "user_type_stability": ["bucket", "n_users"],
        "user_activity_hill": ["k", "x_k1", "sum_ln_units", "hill"],
        "events_cusum_shift": ["split_day", "d_num", "n_days",
                               "total_events", "stat"],
        "transition_cond_entropy": ["total_transitions", "sum_units",
                                    "cond_entropy"],
        "source_bigram_cond_entropy": ["source", "total_bigrams",
                                       "sum_units", "cond_entropy"],
        "events_winsorized_mean": ["event_type", "n", "lo_cents",
                                   "hi_cents", "wins_sum_cents",
                                   "wins_mean_cents"],
        "source_yule_k": ["source", "n_tokens", "sum_freq_sq", "yule_k"],
        "user_activity_theil": ["n_users", "total_events", "sum_units",
                                "theil"],
        "event_type_lift": ["type_a", "type_b", "n_a", "n_b", "n_both",
                            "n_users", "lift"],
        "events_daily_jsd": ["day", "n_day", "su1", "su2", "jsd"],
        "user_transition_trigrams": ["t1", "t2", "t3", "n"],
        "orders_interpurchase_p50": ["n_gaps", "p50_days", "p90_days"],
        "nation_revenue_hhi": ["n_name", "n_suppliers", "total_cents",
                               "sumsq_cents", "hhi"],
        "source_g2_keywords": ["source", "word", "n_source", "n_rest",
                               "g2_units", "g2"],
        "events_kendall_daily": ["type_a", "type_b", "n_days",
                                 "concordant", "discordant", "ties_a",
                                 "ties_b", "tau_b"],
        "source_hapax_ratio": ["source", "n_vocab", "n_hapax",
                               "hapax_ratio"],
        "slowlog_rows_efficiency": ["class_id", "n_queries", "sum_sent",
                                    "sum_examined", "efficiency"],
        "slowlog_qt_regression": ["class_id", "n_first", "n_second",
                                  "su_first", "su_second", "qt_drift"],
        "events_mann_kendall": ["n_days", "s_stat", "var18", "z"],
        "word_skipgram_topk": ["word_a", "word_b", "n"],
        "events_value_anova": ["n_groups", "n_total", "f_stat"],
        "embed_norm_histogram": ["bucket", "n_vecs"],
        "slowlog_lock_contention": ["db", "n_queries", "su_lock",
                                    "su_qt", "contention"],
        "events_quiet_hours": ["n_hours", "n_zero_hours",
                               "longest_zero_run"],
        "orders_cohort_revenue": ["cohort", "mo_offset", "n_orders",
                                  "revenue_cents"],
        "transition_predictor_acc": ["total_transitions", "n_correct",
                                     "accuracy"],
        "events_perm_entropy": ["n_triples", "sum_units", "perm_entropy"],
        "source_burrows_delta": ["src_a", "src_b", "n_words",
                                 "sum_units", "delta"],
        "events_runs_test": ["n_used", "n_above", "n_below", "runs",
                             "expected_runs", "ratio"],
        "parts_name_trigram_match": ["name_a", "name_b", "n_inter",
                                     "n_union", "jaccard"],
        "lineitem_flag_ols": ["l_returnflag", "n", "slope_cents_per_qty",
                              "intercept_cents"],
        "events_session_pctl": ["n_sessions", "p50_s", "p90_s"],
        "nation_balance_spend_corr": ["n_name", "n_customers",
                                      "corr_bal_spend"],
        "orders_priority_median_lines": ["o_orderpriority", "n_orders",
                                         "p50_lines"],
        "events_dau_mau": ["month", "n_days", "sum_dau", "mau",
                           "stickiness"],
        "events_ewma_daily": ["n_days", "last_ewma", "peak_day",
                              "peak_resid"],
        "orders_above_cust_avg": ["n_orders", "n_above", "share"],
        "orders_rev_7d_range": ["day", "rev_cents", "rev_7d_cents"],
        "events_top_days_ties": ["day", "n_events", "rnk"],
        "word_length_hist": ["wlen", "n_words"],
        "supplier_balance_quartiles": ["n_name", "p25_cents", "p50_cents",
                                       "p75_cents"],
        "customers_repeat_rate": ["c_mktsegment", "n_customers",
                                  "n_repeat", "repeat_rate"],
        "orders_value_cv": ["o_orderpriority", "n", "cv"],
        "event_type_triples": ["type_a", "type_b", "type_c", "n_users"],
        "events_xcorr_lag1": ["n_pairs", "xcorr"],
        "lineitem_weighted_median_qty": ["l_returnflag", "n_lines",
                                         "wmedian_qty"],
        "source_char_entropy": ["source", "n_chars", "n_alphabet",
                                "char_entropy"],
        "events_dow_hour_heatmap": ["dow", "hod", "n_events", "dow_share"],
        "orders_first_last_delta": ["n_customers_multi", "n_grew",
                                    "n_shrank", "share_grew"],
        "events_weekly_value_p50": ["event_type", "week", "n", "p50_cents"],
        "user_activity_entropy": ["bin", "n_users"],
        "orders_price_equidepth": ["tile", "lo_cents", "hi_cents",
                                   "n_orders"],
        "slowlog_qt_log2_histogram": ["class_id", "bucket", "n_queries"],
        "user_gap_median_hist": ["bin", "n_users"],
        "events_daily_volume_bands": ["n_days", "p10", "p50", "p90"],
        "events_cube_type_dow": ["event_type", "dow", "n"],
        "supplier_revenue_topk": ["s_suppkey", "rnk", "revenue_cents",
                                  "cum_share"],
        "genlog_connections_by_db": ["db", "user", "n_connects"],
        "jsonlog_qt_by_db": ["db", "n_queries", "sum_qt"],
        "customers_clv_deciles": ["decile", "n_customers",
                                  "revenue_cents", "rev_share"],
        "lineitem_discount_grid": ["discount_pct", "n_lines", "sum_qty",
                                   "gross_cents", "disc_c100"],
        "events_return_curve": ["k", "n_pairs", "n_user_days", "rate"],
        "embed_dim_topvar": ["rnk", "dim", "n", "var_units"],
        "orders_basket_corr": ["n_orders", "corr_lines_price"],
        "events_type_hour_entropy": ["event_type", "n_events", "peak_hod",
                                     "hour_entropy"],
        "events_sessions_per_user_hist": ["n_sessions", "n_users"],
        "user_first_touch_attribution": ["first_type", "n_purchases",
                                         "n_users"],
        "embed_dim_fisher": ["dim", "n", "fisher"],
        "events_value_gini_per_type": ["event_type", "n_events",
                                       "total_cents", "gini"],
        "supplier_part_diversity": ["bin", "n_suppliers"],
        "orders_segment_hhi": ["c_mktsegment", "n_customers",
                               "total_cents", "hhi"],
        "events_surge_factor": ["n_days", "peak_day", "peak_n", "p50_n",
                                "surge"],
        "users_time_to_first_purchase": ["days", "n_users"],
        "part_brand_markup": ["p_brand", "n_lines", "sold_cents",
                              "retail_cents", "markup_pct"],
        "slowlog_tier_latency": ["tier", "n_queries", "sum_qt"],
        "formats_qt_consistency": ["db", "n_slow", "n_json",
                                   "sum_qt_slow", "sum_qt_json",
                                   "consistent"],
        "lineitem_brand_returns": ["p_brand", "n_lines", "n_returned",
                                   "return_rate"],
        "users_dormancy_revival": ["n_users", "n_revived", "n_revivals"],
        "events_value_top1pct_share": ["n_events", "p99_cents",
                                       "top_cents", "top_share"],
        "slowlog_user_qt_p95": ["user", "p50_q", "p95_q"],
        "users_actions_before_purchase": ["n_buyers", "p50_actions",
                                          "p90_actions"],
        "parts_catalog_heatmap": ["p_size", "band", "n_parts",
                                  "size_p50_cents"],
        "nation_market_activation": ["n_name", "n_customers", "n_active",
                                     "active_share"],
        "orders_avg_lines_trend": ["o_year", "n_orders", "n_lines",
                                   "avg_lines"],
        "customers_order_regularity": ["cv2_bin", "n_customers"],
        "source_len_gini": ["source", "n_docs", "total_chars", "gini"],
        "lineitem_qty_mode": ["l_returnflag", "mode_qty", "n_at_mode",
                              "n_lines", "mode_share"],
        "users_day1_intensity": ["decile_bin", "n_users"],
        "slowlog_zero_rows_share": ["class_id", "n_queries",
                                    "n_zero_sent", "zero_share"],
        "source_word_len_p90": ["source", "n_words", "p50_len",
                                "p90_len"],
        "slowlog_lock_ratio_by_class": ["class_id", "n_queries",
                                        "sum_qt", "sum_lock",
                                        "lock_ratio"],
        "events_weekend_effect": ["bucket", "n_events", "value_cents",
                                  "per_day_ratio"],
        "orders_priority_mix_trend": ["o_year", "n_orders", "n_hot",
                                      "hot_share"],
        "embed_label_norms": ["label", "n_vectors", "sumsq_units_str",
                              "mean_sq"],
        "docs_prefix_dup_rate": ["n_docs", "n_prefix_dup", "dup_share"],
        "orders_sameday_multi": ["n_customers", "n_multi",
                                 "multi_share"],
        "events_cvr_by_dow": ["dow", "n_views", "n_purchases", "cvr"],
        "orders_status_priority_matrix": ["o_orderpriority",
                                          "o_orderstatus", "n_orders",
                                          "row_share"],
    }
    for name, cols in expected.items():
        out = _to_pandas(qs[name](str(tmp_path)))
        assert len(out) == 0, name
        assert list(out.columns) == cols, (name, list(out.columns))
    # funnel_steps' oracle (scalar subqueries) ALWAYS emits one row of
    # zeros — the engine must match that contract, not return 0 rows
    out = _to_pandas(qs["funnel_steps"](str(tmp_path)))
    assert len(out) == 1
    assert out.iloc[0].tolist() == [0, 0, 0]
    assert list(out.columns) == ["n_view", "n_view_click", "n_view_click_purchase"]
    # events_validation's oracle COALESCEs each rule's SUM over zero rows
    # to 0 — the engine must return one zero row PER RULE, not 0 rows
    out = _to_pandas(qs["events_validation"](str(tmp_path)))
    assert list(out.columns) == ["rule", "n_rows", "n_violations"]
    assert len(out) == 4
    assert out["n_rows"].tolist() == [0, 0, 0, 0]
    assert out["n_violations"].tolist() == [0, 0, 0, 0]
    # tpch_q6/q17 oracles are global aggregates (COUNT + COALESCEd SUM, no
    # GROUP BY): they ALWAYS emit one row of zeros over empty input
    out = _to_pandas(qs["tpch_q6_revenue"](str(tmp_path)))
    assert list(out.columns) == ["n_lines", "revenue_cents"]
    assert len(out) == 1 and out.iloc[0].tolist() == [0, 0]
    out = _to_pandas(qs["tpch_q17_small_qty"](str(tmp_path)))
    assert list(out.columns) == ["n_lines", "total_cents", "avg_yearly"]
    assert len(out) == 1 and out.iloc[0].tolist() == [0, 0, 0.0]
    out = _to_pandas(qs["orders_increasing_pairs"](str(tmp_path)))
    assert list(out.columns) == ["n_customers", "n_pairs", "n_increasing"]
    assert len(out) == 1 and out.iloc[0].tolist() == [0, 0, 0]
    out = _to_pandas(qs["users_all_types"](str(tmp_path)))
    assert list(out.columns) == ["n_users_all_types", "n_types"]
    assert len(out) == 1 and out.iloc[0].tolist() == [0, 0]
    # fingerprint audit: aggregates-over-empty -> ONE row of zeros
    out = _to_pandas(qs["slowlog_fingerprint_collisions"](str(tmp_path)))
    assert list(out.columns) == ["n_pairs", "n_classes", "n_fingerprints",
                                 "class_collisions", "fp_collisions"]
    assert len(out) == 1 and out.iloc[0].tolist() == [0, 0, 0, 0, 0]
    # ab_value_ttest's oracle is scalar subqueries: one row of zero
    # counts with a NULL (NaN) t when either arm has n < 2
    out = _to_pandas(qs["ab_value_ttest"](str(tmp_path)))
    assert list(out.columns) == ["n_a", "sum_a_cents", "sumsq_a_cents",
                                 "n_b", "sum_b_cents", "sumsq_b_cents",
                                 "welch_t"]
    assert len(out) == 1
    assert out.iloc[0, :6].tolist() == [0, 0, 0, 0, 0, 0]
    assert pd.isna(out["welch_t"].iloc[0])
    # sessions_bounce is a scalar rollup: one zero row, NULL (NaN) rate
    out = _to_pandas(qs["sessions_bounce"](str(tmp_path)))
    assert list(out.columns) == ["n_sessions", "n_bounce", "n_users",
                                 "sum_events", "sum_duration_us",
                                 "bounce_rate"]
    assert len(out) == 1
    assert out.iloc[0, :5].tolist() == [0, 0, 0, 0, 0]
    assert pd.isna(out["bounce_rate"].iloc[0])
    # users_funnel_windowed is a scalar rollup: one zero row always
    out = _to_pandas(qs["users_funnel_windowed"](str(tmp_path)))
    assert list(out.columns) == ["n_view", "n_click_1h", "n_purchase_1h"]
    assert len(out) == 1 and out.iloc[0].tolist() == [0, 0, 0]
    # fk_orphans_audit always reports every edge (scalar-subquery oracle),
    # so empty input means 6 zero rows in edge order
    out = _to_pandas(qs["fk_orphans_audit"](str(tmp_path)))
    assert list(out.columns) == ["edge", "n_child", "n_orphans"]
    assert len(out) == 6
    assert out["n_child"].tolist() == [0] * 6
    assert out["n_orphans"].tolist() == [0] * 6
    # orders_totalprice_audit is a scalar rollup: one zero row always
    out = _to_pandas(qs["orders_totalprice_audit"](str(tmp_path)))
    assert list(out.columns) == ["n_orders", "n_mismatch", "max_abs_diff",
                                 "sum_abs_diff"]
    assert len(out) == 1 and out.iloc[0].tolist() == [0, 0, 0, 0]
    # streaming_shard_distinct always reports every shard (oracle LEFT
    # JOINs a generated 0..7 series), so empty input means 8 zero rows
    out = _to_pandas(qs["streaming_shard_distinct"](str(tmp_path)))
    assert list(out.columns) == ["shard", "n_distinct"]
    assert len(out) == 8
    assert out["n_distinct"].tolist() == [0] * 8
