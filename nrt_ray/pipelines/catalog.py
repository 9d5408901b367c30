"""Driver-facing query catalog: name → (ray callable, DuckDB oracle SQL).

Every entry in QUERIES runs the Ray-Data implementation; ORACLE_SQL holds
the equivalent DuckDB SQL over the same parquet tables (omitted for
non-SQL-expressible operators — sequential monitors, LSH candidates,
compression — which get the driver's weaker rows-only check and are
instead verified by dedicated pytest oracles).

Column names and float rounding (ROUND half-away-from-zero) match between
both sides by construction — the driver hashes values order-insensitively
after sorting columns by name.
"""

from __future__ import annotations

from functools import partial

from nrt_ray.pipelines import bpe as bp
from nrt_ray.pipelines import classify as clf
from nrt_ray.pipelines import dsir as dsr
from nrt_ray.pipelines import curate as cu
from nrt_ray.pipelines import features as ft
from nrt_ray.pipelines import invindex as ivx
from nrt_ray.pipelines import mmops as mm
from nrt_ray.pipelines import monitor_oracles as mo
from nrt_ray.pipelines import sketch_oracles as sk
from nrt_ray.pipelines import relational as rel
from nrt_ray.pipelines import similarity as sim
from nrt_ray.pipelines import textops as tx
from nrt_ray.pipelines import timeseries as tsq
from nrt_ray.pipelines import windows as win


def queries() -> dict:
    q = {
        # ---- relational core -------------------------------------------
        "q1_pricing_summary": rel.q1_pricing_summary,
        "filter_project_events": rel.filter_project_events,
        "topk_orders": rel.topk_orders,
        "join_orders_customers": rel.join_orders_customers,
        "join_orders_customers_shuffle": rel.join_orders_customers_shuffle,
        "q3_shipping_priority": rel.q3_shipping_priority,
        "q5_local_supplier_volume": rel.q5_local_supplier_volume,
        "q6_forecast_revenue": rel.q6_forecast_revenue,
        "q4_order_priority": rel.q4_order_priority,
        "q12_priority_lines": rel.q12_priority_lines,
        "q13_customer_distribution": rel.q13_customer_distribution,
        "q14_promo_revenue": rel.q14_promo_revenue,
        "q18_large_volume_orders": rel.q18_large_volume_orders,
        "q19_bracketed_revenue": rel.q19_bracketed_revenue,
        "q22_dormant_customers": rel.q22_dormant_customers,
        "q17_small_quantity_revenue": rel.q17_small_quantity_revenue,
        "q7_volume_shipping": rel.q7_volume_shipping,
        "q8_market_share": rel.q8_market_share,
        "q9_product_profit": rel.q9_product_profit,
        "q10_returned_items": rel.q10_returned_items,
        "q15_top_supplier": rel.q15_top_supplier,
        "q21_waiting_suppliers": rel.q21_waiting_suppliers,
        "q2_min_cost_supplier": rel.q2_min_cost_supplier,
        "q11_important_stock": rel.q11_important_stock,
        "q16_supplier_part_counts": rel.q16_supplier_part_counts,
        "q20_dominant_part_suppliers": rel.q20_dominant_part_suppliers,
        "customers_per_region": rel.customers_per_region,
        "lang_distribution": rel.lang_distribution,
        "events_head_by_time": rel.events_head_by_time,
        "user_value_stats": rel.user_value_stats,
        # ---- time-series / rollup engine -------------------------------
        "rollup_1h_events": partial(tsq.rollup_events, tier_name="1h"),
        "rollup_1d_events": partial(tsq.rollup_events, tier_name="1d"),
        "rollup_1w_events": partial(tsq.rollup_events, tier_name="1w"),
        "rollup_1d_gapfill_events": partial(tsq.rollup_events,
                                            tier_name="1d", gapfill=True),
        "fit_ols_trend_events": tsq.fit_ols_trend,
        "fit_lasso_trend_events": tsq.fit_lasso_trend,
        "fit_rirls_events": partial(tsq.fit_events, fit_method="RIRLS"),
        "fit_roc_stable_events": partial(tsq.fit_events, fit_method="ROC"),
        "fit_ccdc_stable_events": partial(tsq.fit_events,
                                          fit_method="CCDC-stable"),
        "monitor_cusum_events": partial(tsq.monitor_events,
                                        strategy="CUSUM"),
        "monitor_ewma_events": partial(tsq.monitor_events, strategy="EWMA"),
        "monitor_iqr_events": partial(tsq.monitor_events, strategy="IQR"),
        "monitor_mosum_events": partial(tsq.monitor_events,
                                        strategy="MOSUM"),
        "monitor_ccdc_events": partial(tsq.monitor_events, strategy="CCDC"),
        # update_mask=False (reference nrt/monitor/__init__.py:100-104):
        # the unfrozen trajectory — breaks never freeze state
        "monitor_cusum_nofreeze_events": partial(
            tsq.monitor_events, strategy="CUSUM",
            monitor_params={"update_mask": False}),
        "monitor_ewma_nofreeze_events": partial(
            tsq.monitor_events, strategy="EWMA",
            monitor_params={"update_mask": False}),
        "monitor_iqr_nofreeze_events": partial(
            tsq.monitor_events, strategy="IQR",
            monitor_params={"update_mask": False}),
        "monitor_mosum_nofreeze_events": partial(
            tsq.monitor_events, strategy="MOSUM",
            monitor_params={"update_mask": False}),
        "monitor_ccdc_nofreeze_events": partial(
            tsq.monitor_events, strategy="CCDC",
            monitor_params={"update_mask": False}),
        # parameter variants: second MOSUM crit-table point (h=0.5) and a
        # faster EWMA forgetting factor
        "monitor_mosum_h50_events": partial(
            tsq.monitor_events, strategy="MOSUM",
            monitor_params={"h": 0.5}),
        "monitor_ewma_lambda50_events": partial(
            tsq.monitor_events, strategy="EWMA",
            monitor_params={"lambda_": 0.5}),
        "segments_1d_events": tsq.segments_events,
        "segment_range_scan_events": tsq.segment_range_scan_events,
        "weekly_from_daily_events": tsq.weekly_from_daily_events,
        "active_users_1h": tsq.active_users_events,
        "user_value_quantiles": tsq.user_value_quantiles,
        "top_users_per_day": tsq.top_users_per_day,
        "value_percentiles_events": tsq.value_percentiles,
        "daily_value_percentiles": tsq.daily_value_percentiles,
        "value_histogram_events": tsq.value_histogram,
        "retention_cohorts_events": tsq.retention_cohorts,
        "profile_events": tsq.profile_events,
        "event_transitions": tsq.event_transitions,
        "rolling_zscore_events": tsq.rolling_zscore_events,
        "m4_downsample_events": tsq.m4_downsample_events,
        "theilsen_trend_events": tsq.theilsen_trend_events,
        "user_entropy_events": tsq.user_entropy_events,
        "weekly_profile_events": tsq.weekly_profile_events,
        "multigrain_events": tsq.multigrain_events,
        "user_interarrival_events": tsq.user_interarrival_events,
        "counter_increase_daily_events": tsq.counter_increase_daily,
        "daily_active_users_hll": tsq.daily_active_users_hll,
        "holt_winters_daily_events": tsq.holt_winters_daily,
        "lttb_downsample_events": tsq.lttb_downsample_daily,
        "weekly_spectral_events": tsq.weekly_spectral_events,
        "rle_runs_events": tsq.rle_runs_events,
        "sax_symbols_events": tsq.sax_symbols_events,
        "bollinger_breakouts_events": tsq.bollinger_breakouts_events,
        "seasonal_strength_events": tsq.seasonal_strength_events,
        "ewma_crossover_events": tsq.ewma_crossover_events,
        "drawdown_events": tsq.drawdown_events,
        "cusum_breach_events": tsq.cusum_breach_events,
        "doc_readability_scores": tx.readability_scores,
        "kalman_level_events": tsq.kalman_level_events,
        "changepoint_events": tsq.changepoint_events,
        "mad_outlier_days_events": tsq.mad_outlier_days_events,
        "rescaled_range_events": tsq.rescaled_range_events,
        "gini_daily_events": tsq.gini_daily_events,
        "wow_growth_events": tsq.wow_growth_events,
        "doc_hapax_ratio": tx.hapax_ratio,
        "burstiness_events": tsq.burstiness_events,
        "fano_factor_events": tsq.fano_factor_events,
        "user_percentile_rank_events": tsq.user_percentile_rank_events,
        "stl_trend_events": tsq.stl_trend_events,
        "user_motif_daily": tsq.user_motif_daily,
        "croston_events": tsq.croston_events,
        "transition_entropy_events": tsq.transition_entropy_events,
        "basket_lift_events": tsq.basket_lift_events,
        "seasonal_naive_mase_events": tsq.seasonal_naive_mase_events,
        "peak_days_events": tsq.peak_days_events,
        "benford_deviation_events": tsq.benford_deviation_events,
        "token_bucket_drops_events": tsq.token_bucket_drops_events,
        "source_js_divergence_docs": tx.source_js_divergence,
        "user_time_weighted_avg": tsq.user_time_weighted_avg,
        "user_ohlc_daily": tsq.user_ohlc_daily,
        "user_autocorr_daily": tsq.user_autocorr_daily,
        "user_click_purchase_corr": tsq.user_click_purchase_corr,
        "user_leadlag_events": tsq.user_leadlag_events,
        "events_cube": tsq.events_cube,
        "user_week_shape_dtw": tsq.user_week_shape_dtw,
        "stale_users_events": tsq.stale_users_events,
        "user_completeness_events": tsq.user_completeness_events,
        "funnel_conversion_events": tsq.funnel_conversion_events,
        "bpe_train_merges_docs": bp.bpe_train_merges_docs,
        "sq8_topk_dot": sim.sq8_topk_dot,
        "multi_topk_cosine": sim.multi_topk_cosine,
        "pq_topk_adc": sim.pq_topk_adc,
        "nb_classify_docs": clf.nb_classify_docs,
        "dsir_importance_docs": dsr.dsir_importance_docs,
        "dsir_select_docs": dsr.dsir_select_docs,
        "dup_span_stats_docs": tx.dup_span_stats_docs,
        "gopher_rules_docs": tx.gopher_rules_docs,
        "source_overlap_matrix": tx.source_overlap_matrix,
        "mix_sources_docs": tx.mix_sources_docs,
        "bpe_encode_stats_docs": bp.bpe_encode_stats_docs,
        "state_durations_events": tsq.state_durations_events,
        "attribution_events": tsq.attribution_events,
        "rfm_segments_events": tsq.rfm_segments_events,
        "clicks_before_purchase_1h": tsq.clicks_before_purchase_1h,
        "props_json_stats": tsq.props_json_stats,
        "user_running_total_events": tsq.user_running_total_events,
        "user_features_asof": ft.user_features_asof,
        "top_supplier_per_nation": rel.top_supplier_per_nation,
        "supplier_network_hops": rel.supplier_network_hops,
        # ---- temporal windows / streaming joins -------------------------
        "sessionize_events": win.sessionize_events,
        "hopping_1h_15m_events": win.hopping_windows_events,
        "asof_click_purchase": win.asof_join_events,
        "funnel_click_purchase": win.funnel_events,
        # ---- text analysis / dedup -------------------------------------
        "doc_token_counts": tx.token_counts,
        "doc_token_counts_bpe": tx.bpe_token_counts,
        "doc_fingerprints": tx.fingerprints,
        "doc_winnow_fingerprints": tx.winnow_fingerprints,
        "doc_containment_pairs": tx.containment_pairs,
        "vocab_top_tokens": tx.vocab_top_tokens,
        "pmi_collocations_docs": ft.pmi_collocations,
        "vocab_zipf_fit": tx.vocab_zipf_fit,
        "vocab_growth_docs": tx.vocab_growth,
        "sample_stratified_docs": tx.sample_stratified,
        "sample_weighted_docs": tx.sample_weighted_docs,
        "doc_tfidf_scores": tx.tfidf_scores,
        "bm25_topk_docs": tx.bm25_topk_docs,
        "cross_source_dup_prefixes": tx.cross_source_dup_prefixes,
        "dedup_exact_docs": tx.dedup_exact,
        "doc_quality_scores": tx.quality_scores,
        "doc_lang_id": tx.lang_id,
        "minhash_near_dup_candidates": tx.minhash_candidates,
        "near_dup_jaccard_verified": tx.jaccard_verify,
        "dedup_near_docs": tx.dedup_near_docs,
        "dedup_near_keep_best": tx.dedup_near_keep_best,
        "leakage_safe_splits": tx.leakage_safe_splits,
        "near_dup_clusters": tx.near_dup_clusters,
        "shingle_dup_stats": tx.shingle_dup_stats,
        "shingle_hll_estimate": tx.shingle_hll_estimate,
        "ssjoin_exact_docs": tx.ssjoin_exact,
        "dup_graph_triangles_docs": tx.dup_graph_triangles,
        "pagerank_dup_graph_docs": tx.pagerank_dup_graph,
        "token_cms_heavy_hitters": tx.token_cms_heavy_hitters,
        "bloom_semijoin_docs": tx.bloom_semijoin_docs,
        "doc_repetition_stats": tx.repetition_stats,
        "corpus_mix_docs": tx.corpus_mix,
        "decontaminate_docs": tx.decontaminate_docs,
        "pack_sequences_docs": tx.pack_sequences,
        "curate_corpus_docs": cu.curate_corpus,
        "global_shuffle_docs": tx.global_shuffle_order,
        "doc_unigram_lm_scores": tx.unigram_lm_scores,
        "doc_bigram_lm_scores": tx.bigram_lm_scores,
        "doc_pii_scrub": tx.pii_scrub,
        "gopher_filter_docs": tx.gopher_filter,
        "ccnet_lm_buckets": tx.ccnet_lm_buckets,
        "doc_boilerplate_ratio": tx.boilerplate_ratio,
        "doc_novelty_scores": tx.novelty_scores,
        "top_docs_per_lang": tx.top_docs_per_lang,
        "lang_length_quantiles": tx.lang_length_quantiles,
        "docs_length_band": tx.docs_length_band,
        "inverted_index_stats": ivx.inverted_index_stats,
        "doc_simhashes": tx.simhashes,
        "simhash_near_dup_pairs": tx.simhash_near_dup_pairs,
        "repeated_span_pairs": tx.repeated_span_pairs,
        "dedup_spans_docs": tx.dedup_spans_docs,
        # ---- multimodal binary decode -----------------------------------
        "image_decode_stats": mm.image_decode_stats,
        "image_png_decode_stats": mm.image_png_decode_stats,
        "image_jpeg_decode_stats": mm.image_jpeg_decode_stats,
        "video_avi_frame_stats": mm.video_avi_frame_stats,
        "image_gif_decode_stats": mm.image_gif_decode_stats,
        "image_resize_stats": mm.image_resize_stats,
        "audio_resample_stats": mm.audio_resample_stats,
        "audio_decode_stats": mm.audio_decode_stats,
        "frame_sample_stats": mm.frame_sample_stats,
        # ---- similarity search -----------------------------------------
        "embedding_topk_cosine": sim.topk_cosine,
        "embedding_norms": sim.embedding_norms,
        "embedding_label_centroids": sim.label_centroids,
        "embedding_int8_quantize": sim.embedding_int8_quantize,
        "embedding_pca_top1": sim.embedding_pca_top1,
        "embedding_lsh_topk_cosine": sim.lsh_topk_cosine,
        "embedding_topk_dot": sim.topk_dot,
        "embedding_topk_l2": sim.topk_l2,
        "embedding_ivf_topk_cosine": sim.ivf_topk_cosine,
        "ann_recall_eval": sim.ann_recall_eval,
        # threshold 0.4 for the driver check: the synthetic embeddings
        # are near-orthogonal (max pairwise cosine ~0.5), so the 0.98
        # production default would make the check vacuously empty
        "embedding_near_dup_pairs": partial(sim.near_dup_pairs_cosine,
                                            threshold=0.4),
        "embedding_dup_clusters": partial(sim.embedding_dup_clusters,
                                          threshold=0.4),
    }
    return q


_BUCKET = ("make_timestamp(CAST(floor(epoch(ts)/{w}) AS BIGINT)"
           "*{w}*1000000)")


def _sql_set(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in sorted(tx.STOPWORDS[lang]))


# stopword-hit language id: per-language hit counts over the lowercase
# letter-run tokens; winner = max hits with ties resolved in fixed order
# (en, de, fr, ro) — exactly the Python heuristic in textops.LangId
_LANG_ID_SQL = f"""
    WITH t AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z]+') AS toks
        FROM documents
    ),
    h AS (
        SELECT doc_id, len(toks) AS ntoks,
               len(list_filter(toks, x -> x IN ({_sql_set('en')}))) AS en,
               len(list_filter(toks, x -> x IN ({_sql_set('de')}))) AS de,
               len(list_filter(toks, x -> x IN ({_sql_set('fr')}))) AS fr,
               len(list_filter(toks, x -> x IN ({_sql_set('ro')}))) AS ro
        FROM t
    )
    SELECT doc_id,
           CASE WHEN en >= de AND en >= fr AND en >= ro THEN 'en'
                WHEN de >= fr AND de >= ro THEN 'de'
                WHEN fr >= ro THEN 'fr'
                ELSE 'ro' END AS lang_pred,
           round(greatest(en, de, fr, ro)
                 / CAST(greatest(ntoks, 1) AS DOUBLE), 6) AS lang_score
    FROM h
"""


def _rollup_sql(width_s: int) -> str:
    b = _BUCKET.format(w=width_s)
    return f"""
        SELECT user_id,
               {b} AS bucket_ts,
               CAST(count(*) AS INTEGER) AS n_obs,
               round(sum(value), 4) AS v_sum,
               round(min(value), 4) AS v_min,
               round(max(value), 4) AS v_max,
               round(arg_max(value, ts), 4) AS v_last
        FROM events
        GROUP BY user_id, bucket_ts
    """


def oracle_sql() -> dict:
    out = {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc_price,
                   round(sum(l_quantity) / count(*), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        # Q3/Q5 shapes: revenue in exact integer 10⁻⁴ units
        # (cents · (100 − disc_cents)) so summation order is irrelevant
        "q3_shipping_priority": """
            WITH l AS (
                SELECT l_orderkey,
                       CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100, 0)
                                     AS BIGINT)) AS u
                FROM lineitem
                WHERE l_shipdate > TIMESTAMP '1996-07-01'
            ),
            o AS (
                SELECT o_orderkey, o_orderdate, o_orderpriority
                FROM orders JOIN customer ON c_custkey = o_custkey
                WHERE c_mktsegment = 'BUILDING'
                  AND o_orderdate < TIMESTAMP '1996-07-01'
            ),
            g AS (
                SELECT l_orderkey, o_orderdate, o_orderpriority,
                       CAST(sum(u) AS BIGINT) AS units
                FROM l JOIN o ON o_orderkey = l_orderkey
                GROUP BY l_orderkey, o_orderdate, o_orderpriority
            )
            SELECT l_orderkey, units / 10000.0 AS revenue,
                   o_orderdate, o_orderpriority
            FROM g ORDER BY units DESC, o_orderdate, l_orderkey
            LIMIT 10
        """,
        "q5_local_supplier_volume": """
            WITH l AS (
                SELECT l_orderkey, l_suppkey,
                       CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100, 0)
                                     AS BIGINT)) AS u
                FROM lineitem
            ),
            o AS (
                SELECT o_orderkey, o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate < TIMESTAMP '1997-01-01'
            )
            SELECT n.n_name,
                   CAST(sum(l.u) AS BIGINT) / 10000.0 AS revenue
            FROM l
            JOIN o ON o.o_orderkey = l.l_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN customer c ON c.c_custkey = o.o_custkey
                           AND c.c_nationkey = s.s_nationkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'ASIA'
            GROUP BY n.n_name
        """,
        "q6_forecast_revenue": """
            SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                 AS BIGINT)
                            * CAST(round(l_discount * 100, 0)
                                   AS BIGINT)) AS BIGINT) / 10000.0
                       AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND CAST(round(l_discount * 100, 0) AS BIGINT)
                  BETWEEN 5 AND 7
              AND l_quantity < 24.0
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY o_orderpriority
        """,
        "q12_priority_lines": """
            SELECT l_returnflag,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_returnflag
        """,
        "q13_customer_distribution": """
            SELECT c_count, count(*) AS custdist
            FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                  FROM customer LEFT OUTER JOIN orders
                    ON c_custkey = o_custkey
                   AND o_orderdate >= TIMESTAMP '1996-01-01'
                   AND o_orderdate < TIMESTAMP '1996-02-01'
                  GROUP BY c_custkey)
            GROUP BY c_count
        """,
        "q7_volume_shipping": """
            WITH l AS (
                SELECT l_orderkey, l_suppkey,
                       EXTRACT(year FROM l_shipdate) AS l_year,
                       CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100, 0)
                                     AS BIGINT)) AS u
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1998-01-01'
            )
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   l.l_year,
                   CAST(sum(l.u) AS BIGINT) / 10000.0 AS revenue
            FROM l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
            JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
            WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
               OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
            GROUP BY 1, 2, 3
        """,
        "q8_market_share": """
            WITH j AS (
                SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
                       CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100, 0)
                                     AS BIGINT)) AS u,
                       s.s_nationkey AS sn
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                           AND p.p_type = 'STANDARD'
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN nation cn ON cn.n_nationkey = c.c_nationkey
                JOIN region r ON r.r_regionkey = cn.n_regionkey
                WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o.o_orderdate < TIMESTAMP '1998-01-01'
                  AND r.r_name = 'ASIA'
            )
            SELECT o_year,
                   round(sum(CASE WHEN sn = (SELECT n_nationkey
                                             FROM nation
                                             WHERE n_name = 'NATION_5')
                                  THEN u ELSE 0 END) * 1.0
                         / sum(u), 6) AS mkt_share
            FROM j GROUP BY o_year
        """,
        "q9_product_profit": """
            WITH l AS (
                SELECT l.l_orderkey, s.s_nationkey AS sn,
                       CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100, 0)
                                     AS BIGINT))
                       - CAST(round(p.p_retailprice * 100, 0) AS BIGINT)
                         * CAST(round(l.l_quantity * 100, 0) AS BIGINT)
                           AS profit_u
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                           AND p.p_name LIKE '%widget%'
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
            )
            SELECT n.n_name,
                   EXTRACT(year FROM o.o_orderdate) AS o_year,
                   CAST(sum(l.profit_u) AS BIGINT) / 10000.0 AS profit
            FROM l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN nation n ON n.n_nationkey = l.sn
            GROUP BY 1, 2
        """,
        "q10_returned_items": """
            WITH agg AS (
                SELECT o.o_custkey,
                       CAST(sum(
                           CAST(round(l.l_extendedprice * 100, 0)
                                AS BIGINT)
                           * (100 - CAST(round(l.l_discount * 100, 0)
                                         AS BIGINT))) AS BIGINT) AS u
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                WHERE l.l_returnflag = 'R'
                  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o.o_orderdate < TIMESTAMP '1996-04-01'
                GROUP BY o.o_custkey
            )
            SELECT c.c_custkey, c.c_name, n.n_name,
                   agg.u / 10000.0 AS revenue
            FROM agg
            JOIN customer c ON c.c_custkey = agg.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            ORDER BY agg.u DESC, c.c_custkey ASC
            LIMIT 20
        """,
        "q2_min_cost_supplier": """
            WITH pairs AS (
                SELECT l_partkey, l_suppkey,
                       CAST(min(CAST(round(l_extendedprice * 100, 0)
                                     AS BIGINT)) AS BIGINT) AS mc
                FROM lineitem
                JOIN part ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON n_nationkey = s_nationkey
                JOIN region ON r_regionkey = n_regionkey
                WHERE p_size = 15 AND r_name = 'EUROPE'
                GROUP BY 1, 2
            ),
            best AS (
                SELECT l_partkey, min(mc) AS m FROM pairs GROUP BY 1
            )
            SELECT s.s_acctbal, s.s_name, n.n_name,
                   pairs.l_partkey AS p_partkey,
                   CAST(pairs.mc AS BIGINT) / 100.0 AS supply_cost
            FROM pairs
            JOIN best ON best.l_partkey = pairs.l_partkey
                     AND pairs.mc = best.m
            JOIN supplier s ON s.s_suppkey = pairs.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
        """,
        "q11_important_stock": """
            WITH agg AS (
                SELECT l_partkey,
                       CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                     AS BIGINT)) AS BIGINT) AS cents
                FROM lineitem
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON n_nationkey = s_nationkey
                JOIN region ON r_regionkey = n_regionkey
                WHERE r_name = 'ASIA'
                GROUP BY 1
            )
            SELECT l_partkey, cents / 100.0 AS part_value
            FROM agg
            WHERE cents * (SELECT count(*) FROM agg)
                  > (SELECT sum(cents) FROM agg)
        """,
        "q16_supplier_part_counts": """
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT)
                       AS supplier_cnt
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
              AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
        """,
        "q20_dominant_part_suppliers": """
            WITH pq AS (
                SELECT l_partkey, l_suppkey,
                       CAST(sum(CAST(round(l_quantity, 0) AS BIGINT))
                            AS BIGINT) AS q
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE p_name LIKE 'small%'
                  AND l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01'
                GROUP BY 1, 2
            ),
            tot AS (
                SELECT l_partkey, CAST(sum(q) AS BIGINT) AS tq
                FROM pq GROUP BY 1
            )
            SELECT pq.l_suppkey AS s_suppkey, s_name,
                   CAST(count(*) AS BIGINT) AS n_parts_dominated
            FROM pq JOIN tot USING (l_partkey)
            JOIN supplier ON s_suppkey = pq.l_suppkey
            WHERE pq.q * 2 >= tot.tq
            GROUP BY 1, 2
        """,
        "q15_top_supplier": """
            WITH agg AS (
                SELECT l_suppkey,
                       CAST(sum(
                           CAST(round(l_extendedprice * 100, 0)
                                AS BIGINT)
                           * (100 - CAST(round(l_discount * 100, 0)
                                         AS BIGINT))) AS BIGINT) AS u
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name,
                   agg.u / 10000.0 AS total_revenue
            FROM agg JOIN supplier s ON s.s_suppkey = agg.l_suppkey
            WHERE agg.u = (SELECT max(u) FROM agg)
        """,
        "user_click_purchase_corr": """
            WITH d AS (
                SELECT user_id,
                       CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                       CAST(sum(CASE WHEN event_type = 'click'
                                THEN CAST(round(value * 100, 0) AS BIGINT)
                                ELSE 0 END) AS BIGINT) AS a,
                       CAST(sum(CASE WHEN event_type = 'purchase'
                                THEN CAST(round(value * 100, 0) AS BIGINT)
                                ELSE 0 END) AS BIGINT) AS b,
                       sum(CASE WHEN event_type = 'click' THEN 1
                           ELSE 0 END) AS nc,
                       sum(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS nb
                FROM events GROUP BY user_id, day
            ),
            p AS (SELECT user_id, a, b FROM d WHERE nc > 0 AND nb > 0),
            agg AS (
                SELECT user_id, count(*) AS n,
                       sum(a) AS sa, sum(b) AS sb, sum(a * b) AS sab,
                       sum(a * a) AS saa, sum(b * b) AS sbb
                FROM p GROUP BY user_id
            )
            SELECT user_id, n AS n_common_days,
                   round(CAST(n * sab - sa * sb AS DOUBLE)
                         / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                            * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))),
                         6) AS r
            FROM agg
            WHERE n >= 2 AND n * saa - sa * sa > 0
              AND n * sbb - sb * sb > 0
        """,
        "user_autocorr_daily": """
            WITH d AS (
                SELECT user_id,
                       CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                       CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                            AS BIGINT) AS cents
                FROM events GROUP BY user_id, day
            ),
            s AS (
                SELECT user_id, cents AS a,
                       lead(cents) OVER (PARTITION BY user_id
                                         ORDER BY day) AS b
                FROM d
            ),
            agg AS (
                SELECT user_id, count(*) AS n,
                       sum(a) AS sa, sum(b) AS sb, sum(a * b) AS sab,
                       sum(a * a) AS saa, sum(b * b) AS sbb
                FROM s WHERE b IS NOT NULL GROUP BY user_id
            )
            SELECT user_id, n + 1 AS n_days,
                   round(CAST(n * sab - sa * sb AS DOUBLE)
                         / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                            * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))),
                         6) AS r1
            FROM agg
            WHERE n >= 2 AND n * saa - sa * sa > 0
              AND n * sbb - sb * sb > 0
        """,
        "q21_waiting_suppliers": """
            WITH l AS (
                SELECT l_orderkey, l_suppkey,
                       max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
                           END) AS has_r
                FROM lineitem GROUP BY l_orderkey, l_suppkey
            ),
            o AS (
                SELECT l_orderkey, count(*) AS nsupp,
                       sum(has_r) AS nr
                FROM l GROUP BY l_orderkey
            )
            SELECT s.s_name, count(*) AS numwait
            FROM l
            JOIN o USING (l_orderkey)
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            WHERE o.nsupp >= 2 AND o.nr = 1 AND l.has_r = 1
            GROUP BY s.s_name
            ORDER BY numwait DESC, s.s_name ASC
            LIMIT 10
        """,
        # per-day exact discrete value percentiles over integer cents
        # (ceil(n*q)-1 selection == quantile_disc)
        "daily_value_percentiles": r"""
            SELECT make_timestamp(CAST(floor(epoch(ts)/86400) AS BIGINT)
                                  * 86400 * 1000000) AS day_ts,
                   CAST(count(*) AS BIGINT) AS n_obs,
                   quantile_disc(CAST(round(value * 100, 0) AS BIGINT),
                                 0.50) AS p50_cents,
                   quantile_disc(CAST(round(value * 100, 0) AS BIGINT),
                                 0.95) AS p95_cents,
                   quantile_disc(CAST(round(value * 100, 0) AS BIGINT),
                                 0.99) AS p99_cents
            FROM events GROUP BY day_ts
        """,
        "lang_length_quantiles": """
            SELECT lang,
                   quantile_disc(n_chars, 0.25) AS p25,
                   quantile_disc(n_chars, 0.50) AS p50,
                   quantile_disc(n_chars, 0.75) AS p75,
                   quantile_disc(n_chars, 0.90) AS p90
            FROM documents GROUP BY lang
        """,
        "embedding_topk_dot": """
            WITH q AS (
                SELECT embedding AS qe FROM embeddings
                ORDER BY vec_id LIMIT 1
            )
            SELECT vec_id,
                   round(list_dot_product(
                       list_transform(embedding, x -> x::DOUBLE),
                       list_transform((SELECT qe FROM q),
                                      x -> x::DOUBLE)), 5) AS dot
            FROM embeddings
            ORDER BY dot DESC, vec_id DESC LIMIT 10
        """,
        "embedding_topk_l2": """
            WITH q AS (
                SELECT embedding AS qe FROM embeddings
                ORDER BY vec_id LIMIT 1
            )
            SELECT vec_id,
                   round(list_distance(
                       list_transform(embedding, x -> x::DOUBLE),
                       list_transform((SELECT qe FROM q),
                                      x -> x::DOUBLE)), 5) AS l2_dist
            FROM embeddings
            ORDER BY l2_dist ASC, vec_id ASC LIMIT 10
        """,
        "q14_promo_revenue": """
            WITH l AS (
                SELECT l_partkey,
                       CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100, 0)
                                     AS BIGINT)) AS u
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-03-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
            )
            SELECT round(100.0
                       * CAST(sum(CASE WHEN p_type = 'PROMO' THEN u
                                       ELSE 0 END) AS BIGINT)
                       / CAST(sum(u) AS BIGINT), 4) AS promo_revenue_pct
            FROM l JOIN part ON p_partkey = l_partkey
        """,
        "q18_large_volume_orders": """
            WITH big AS (
                SELECT l_orderkey,
                       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(l_quantity) > 250
            )
            SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                   round(o_totalprice, 2) AS o_totalprice, sum_qty
            FROM big
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT) DESC,
                     o_orderdate, o_orderkey
            LIMIT 100
        """,
        "q19_bracketed_revenue": """
            SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                 AS BIGINT)
                            * (100 - CAST(round(l_discount * 100, 0)
                                          AS BIGINT))) AS BIGINT)
                       / 10000.0 AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 20
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "q17_small_quantity_revenue": """
            WITH stats AS (
                SELECT l_partkey AS sk,
                       CAST(sum(l_quantity) AS BIGINT) AS sq,
                       count(*) AS cnt
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE p_brand = 'Brand#9'
                GROUP BY l_partkey
            )
            SELECT round(CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                       AS BIGINT)) AS BIGINT)
                         / 700.0, 2) AS avg_yearly,
                   count(*) AS n_items
            FROM lineitem JOIN stats ON sk = l_partkey
            WHERE CAST(l_quantity AS BIGINT) * 5 * cnt < sq
        """,
        "q22_dormant_customers": """
            WITH stats AS (
                SELECT count(*) AS n,
                       CAST(sum(CAST(round(c_acctbal * 100, 0)
                                     AS BIGINT)) AS BIGINT) AS s
                FROM customer
                WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) > 0
            )
            SELECT c_nationkey,
                   count(*) AS numcust,
                   CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
                        AS BIGINT) / 100.0 AS totacctbal
            FROM customer, stats
            WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) * stats.n
                  > stats.s
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate
                                    >= TIMESTAMP '2000-01-01')
            GROUP BY c_nationkey
        """,
        "filter_project_events": """
            SELECT event_id, user_id, round(value * 1.1, 4) AS value_eur
            FROM events WHERE event_type = 'click' AND value > 50.0
        """,
        "topk_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey DESC
            LIMIT 10
        """,
        "join_orders_customers": """
            SELECT c.c_mktsegment,
                   round(sum(o.o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "customers_per_region": """
            SELECT r.r_name, count(*) AS n_customers
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "lang_distribution": """
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        """,
        "events_head_by_time": """
            SELECT event_id, ts, event_type FROM events
            ORDER BY ts, event_id LIMIT 100
        """,
        "user_value_stats": """
            SELECT user_id,
                   round(sum(value), 4) AS value_sum,
                   round(min(value), 4) AS value_min,
                   round(max(value), 4) AS value_max,
                   count(*) AS n_events
            FROM events GROUP BY user_id
        """,
        "rollup_1h_events": _rollup_sql(3600),
        "rollup_1d_events": _rollup_sql(86400),
        "rollup_1w_events": _rollup_sql(7 * 86400),
        # gap-fill: empty buckets strictly between two observed buckets get
        # count 0 + a linearly interpolated mean (null sum/min/max/last).
        # Ordered-aggregate sums reproduce the engine's time-ordered
        # summation bit-for-bit, so the interpolation matches exactly.
        "rollup_1d_gapfill_events": f"""
            WITH obs AS (
                SELECT user_id,
                       CAST(floor(epoch(ts)/86400) AS BIGINT) AS b,
                       CAST(count(*) AS INTEGER) AS n_obs,
                       sum(value ORDER BY ts) AS vsum,
                       min(value) AS vmin,
                       max(value) AS vmax,
                       arg_max(value, ts) AS vlast,
                       sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0
                           / count(*) AS vmean
                FROM events GROUP BY user_id, b
            ),
            w AS (
                SELECT *,
                       lead(b) OVER (PARTITION BY user_id ORDER BY b)
                           AS nb,
                       lead(vmean) OVER (PARTITION BY user_id ORDER BY b)
                           AS nmean
                FROM obs
            ),
            steps AS (
                SELECT user_id, b, nb, vmean, nmean,
                       unnest(generate_series(
                           1, CAST(nb - b - 1 AS BIGINT))) AS s
                FROM w WHERE nb IS NOT NULL AND nb - b > 1
            ),
            -- interpolate between the ROUNDED neighbour means: exact
            -- decimal doubles on both engines -> bit-identical lerp
            fills AS (
                SELECT user_id, b + s AS b,
                       round(vmean, 4) * (1 - s / CAST(nb - b AS DOUBLE))
                           + round(nmean, 4)
                             * (s / CAST(nb - b AS DOUBLE)) AS fmean
                FROM steps
            )
            SELECT user_id,
                   make_timestamp(b*86400*1000000) AS bucket_ts,
                   n_obs,
                   round(vsum, 4) AS v_sum,
                   round(vmean, 4) AS v_mean,
                   round(vmin, 4) AS v_min,
                   round(vmax, 4) AS v_max,
                   round(vlast, 4) AS v_last,
                   false AS gapfilled
            FROM obs
            UNION ALL
            SELECT user_id,
                   make_timestamp(b*86400*1000000) AS bucket_ts,
                   CAST(0 AS INTEGER) AS n_obs,
                   NULL AS v_sum,
                   round(fmean, 4) AS v_mean,
                   NULL AS v_min,
                   NULL AS v_max,
                   NULL AS v_last,
                   true AS gapfilled
            FROM fills
        """,
        "fit_ols_trend_events": """
            SELECT user_id,
                   round(regr_intercept(value,
                         floor(epoch(ts)/86400)), 5) AS intercept,
                   round(regr_slope(value,
                         floor(epoch(ts)/86400)), 8) AS slope
            FROM events GROUP BY user_id
        """,
        # single-penalized-column lasso has a closed form: soft-threshold
        # the OLS slope in standardized units (see timeseries.fit_lasso_trend
        # — the coordinate-descent kernel converges to exactly this)
        "fit_lasso_trend_events": """
            WITH s AS (
                SELECT user_id,
                       regr_slope(value, floor(epoch(ts)/86400)) AS sl,
                       stddev_pop(floor(epoch(ts)/86400)) AS sdx,
                       avg(value) AS my,
                       avg(floor(epoch(ts)/86400)) AS mx
                FROM events GROUP BY user_id
            ),
            l AS (
                SELECT user_id, my, mx,
                       CASE WHEN sdx = 0 OR sl IS NULL THEN 0.0
                            WHEN abs(sl * sdx) <= 3.0 THEN 0.0
                            ELSE sign(sl) * (abs(sl * sdx) - 3.0) / sdx
                       END AS slope
                FROM s
            )
            SELECT user_id,
                   round(my - slope * mx, 5) AS intercept,
                   round(slope, 8) AS slope,
                   slope <> 0.0 AS selected
            FROM l
        """,
        # cross-key distinct aggregate: distinctness pre-resolved in the
        # per-series kernel, tiny pre-aggregated exchange
        "active_users_1h": """
            SELECT make_timestamp((epoch_us(ts) // 3600000000)
                                  * 3600000000) AS bucket_ts,
                   count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM events GROUP BY 1
        """,
        # discrete quantiles (element selection — exact match by
        # construction, no interpolation float noise)
        "user_value_quantiles": """
            SELECT user_id,
                   quantile_disc(value, 0.5) AS p50,
                   quantile_disc(value, 0.9) AS p90
            FROM events GROUP BY user_id
        """,
        # global exact order statistics (distributed quickselect on the
        # Ray side; quantile_disc = element at rank max(1, ceil(q*n)))
        "value_percentiles_events": """
            SELECT CAST(0.1 AS DOUBLE) AS q, quantile_disc(value, 0.1) AS value
            FROM events
            UNION ALL
            SELECT CAST(0.5 AS DOUBLE), quantile_disc(value, 0.5) FROM events
            UNION ALL
            SELECT CAST(0.9 AS DOUBLE), quantile_disc(value, 0.9) FROM events
            UNION ALL
            SELECT CAST(0.99 AS DOUBLE), quantile_disc(value, 0.99) FROM events
        """,
        # temporal windows: gap sessions, hop-k overlapping windows and
        # the as-of (last-strictly-earlier) join — all window-function /
        # inequality-join expressible
        # fixed-bin histogram: same floor expression as the kernel so
        # boundary rounding is identical on both sides
        "value_histogram_events": """
            SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM (
                SELECT CASE WHEN value < 0.0 THEN 0
                            WHEN value >= 200.0 THEN 41
                            ELSE CAST(floor(value / 5.0) AS BIGINT) + 1
                       END AS bucket
                FROM events)
            GROUP BY bucket
        """,
        # first-order event-type transition matrix with row-normalized
        # probabilities ((user_id, ts) pairs are unique, so lead() is
        # unambiguous)
        "event_transitions": """
            WITH o AS (
                SELECT event_type,
                       lead(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts) AS nxt
                FROM events
            )
            SELECT event_type AS from_type, nxt AS to_type,
                   CAST(count(*) AS BIGINT) AS n,
                   round(count(*) / CAST(sum(count(*)) OVER (
                       PARTITION BY event_type) AS DOUBLE), 6) AS p
            FROM o WHERE nxt IS NOT NULL
            GROUP BY from_type, to_type
        """,
        # per-column data profile (rows / nulls / exact distincts)
        "profile_events": " UNION ALL ".join(
            f"""SELECT '{c}' AS column, count(*) AS n_rows,
                       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
                       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
                FROM events"""
            for c in ("event_id", "ts", "user_id", "event_type",
                      "value", "props")),
        # cohort retention: distinct active users per (signup week,
        # week offset)
        "retention_cohorts_events": """
            WITH s AS (
                SELECT user_id,
                       CAST(floor(epoch(min(ts)) / 604800) AS BIGINT)
                           AS cohort_week
                FROM events WHERE event_type = 'signup'
                GROUP BY user_id
            ),
            w AS (
                SELECT DISTINCT e.user_id, s.cohort_week,
                       CAST(floor(epoch(e.ts) / 604800) AS BIGINT)
                           - s.cohort_week AS week_offset
                FROM events e JOIN s USING (user_id)
            )
            SELECT cohort_week, week_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM w WHERE week_offset >= 0
            GROUP BY cohort_week, week_offset
        """,
        # per-day top-k users: exact-cent sums so ranking is order-free
        "top_users_per_day": """
            WITH s AS (
                SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
                       user_id,
                       sum(CAST(round(value * 100, 0) AS BIGINT))
                           AS cents
                FROM events GROUP BY day, user_id
            ),
            r AS (
                SELECT day, user_id, cents,
                       CAST(row_number() OVER (
                           PARTITION BY day
                           ORDER BY cents DESC, user_id) AS BIGINT)
                           AS rank
                FROM s
            )
            SELECT day, user_id, cents / 100.0 AS v_total, rank
            FROM r WHERE rank <= 5
        """,
        # rolling z-score: exact integer-cent window sums, so the
        # threshold decision is bit-identical (see rolling_zscore_events)
        "rolling_zscore_events": """
            WITH c AS (
                SELECT event_id, user_id, ts,
                       CAST(round(value * 100, 0) AS BIGINT) AS cents
                FROM events
            ),
            w AS (
                SELECT event_id, user_id, cents,
                       sum(cents) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
                           AS s,
                       sum(cents * cents) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
                           AS ss,
                       count(*) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
                           AS n
                FROM c
            ),
            z AS (
                SELECT event_id, user_id,
                       CASE WHEN n * ss - s * s > 0
                            THEN (n * cents - s)
                                 / sqrt(CAST(n * ss - s * s AS DOUBLE))
                            ELSE 0.0 END AS zv
                FROM w WHERE n >= 5
            )
            SELECT event_id, user_id, round(zv, 6) AS z_score,
                   abs(zv) >= 3.0 AS is_anomaly
            FROM z
        """,
        # Theil–Sen: median (quantile_disc semantics) of pairwise
        # cent/µs-delta slopes; same-ts pairs excluded on both sides
        "theilsen_trend_events": """
            WITH c AS (
                SELECT user_id, ts,
                       CAST(round(value * 100, 0) AS BIGINT) AS cents
                FROM events
            ),
            p AS (
                SELECT a.user_id,
                       ((b.cents - a.cents) / 100.0)
                       / ((epoch_us(b.ts) - epoch_us(a.ts))
                          / 86400000000.0) AS slope
                FROM c a JOIN c b
                    ON a.user_id = b.user_id AND b.ts > a.ts
            )
            SELECT user_id, count(*) AS n_pairs,
                   round(quantile_disc(slope, 0.5), 8) AS ts_slope
            FROM p GROUP BY user_id
        """,
        # behavioral entropy: Shannon entropy of each user's event-type
        # mix; 0.0 - sum(...) form avoids IEEE -0.0 on pure users
        "user_entropy_events": """
            WITH s AS (
                SELECT user_id, event_type, count(*) AS n
                FROM events GROUP BY user_id, event_type
            ),
            t AS (
                SELECT user_id, CAST(sum(n) AS DOUBLE) AS tot,
                       CAST(sum(n) AS BIGINT) AS n_events,
                       count(*) AS n_types
                FROM s GROUP BY user_id
            )
            SELECT s.user_id, t.n_events, t.n_types,
                   round(0.0 - sum((s.n / t.tot) * ln(s.n / t.tot)), 6)
                       AS entropy
            FROM s JOIN t USING (user_id)
            GROUP BY s.user_id, t.n_events, t.n_types
        """,
        # hour-of-week seasonal profile: exact integer-cent means
        "user_running_total_events": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                            OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) / 100.0 AS running_total
            FROM events
        """,
        "props_json_stats": """
            SELECT event_type, count(*) AS n_events,
                   CAST(sum(CAST(json_extract(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS sum_k,
                   CAST(min(CAST(json_extract(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS min_k,
                   CAST(max(CAST(json_extract(props, '$.k')
                                 AS BIGINT)) AS BIGINT) AS max_k
            FROM events GROUP BY event_type
        """,
        "clicks_before_purchase_1h": """
            SELECT p.event_id, p.user_id,
                   count(c.event_id) AS n_clicks
            FROM events p LEFT JOIN events c
              ON c.user_id = p.user_id
             AND c.event_type = 'click'
             AND c.ts >= p.ts - INTERVAL 1 HOUR
             AND c.ts < p.ts
            WHERE p.event_type = 'purchase'
            GROUP BY p.event_id, p.user_id
        """,
        "user_ohlc_daily": """
            WITH t AS (
                SELECT user_id, date_trunc('day', ts) AS day,
                       CAST(round(value * 100, 0) AS BIGINT) AS cents,
                       row_number() OVER (
                           PARTITION BY user_id, date_trunc('day', ts)
                           ORDER BY ts, event_id) AS rn_a,
                       row_number() OVER (
                           PARTITION BY user_id, date_trunc('day', ts)
                           ORDER BY ts DESC, event_id DESC) AS rn_d
                FROM events
            )
            SELECT user_id, day, count(*) AS n_obs,
                   CAST(max(CASE WHEN rn_a = 1 THEN cents END)
                        AS BIGINT) / 100.0 AS open,
                   CAST(max(cents) AS BIGINT) / 100.0 AS high,
                   CAST(min(cents) AS BIGINT) / 100.0 AS low,
                   CAST(max(CASE WHEN rn_d = 1 THEN cents END)
                        AS BIGINT) / 100.0 AS close
            FROM t GROUP BY user_id, day
        """,
        "user_time_weighted_avg": """
            WITH t AS (
                SELECT user_id, epoch_us(ts) AS tus,
                       CAST(round(value * 100, 0) AS BIGINT) AS cents,
                       lead(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
                FROM events
            )
            SELECT user_id, count(*) AS n_obs,
                   round(CAST(sum(CAST(cents AS HUGEINT)
                                  * (nxt - tus)) AS DOUBLE)
                         / CAST(max(tus) - min(tus) AS DOUBLE)
                         / 100.0, 6) AS twa
            FROM t GROUP BY user_id
            HAVING max(tus) > min(tus)
        """,
        "counter_increase_daily_events": """
            WITH ord AS (
                SELECT user_id, ts,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       lag(CAST(round(value * 100) AS BIGINT)) OVER
                           (PARTITION BY user_id
                            ORDER BY ts, event_id) AS prev_cents
                FROM events
            )
            SELECT user_id, date_trunc('day', ts) AS day_ts,
                   CAST(sum(CASE WHEN cents >= prev_cents
                                 THEN cents - prev_cents
                                 ELSE cents END) AS BIGINT)
                       AS increase_cents,
                   CAST(sum(CASE WHEN cents < prev_cents THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_resets,
                   count(*) AS n_pairs
            FROM ord WHERE prev_cents IS NOT NULL
            GROUP BY user_id, day_ts
        """,
        "user_interarrival_events": """
            WITH g AS (
                SELECT user_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER
                           (PARTITION BY user_id ORDER BY ts) AS gap
                FROM events
            )
            SELECT user_id,
                   count(gap) AS n_gaps,
                   round(CAST(min(gap) AS BIGINT) / 1000000.0, 6)
                       AS min_gap_s,
                   round(CAST(max(gap) AS BIGINT) / 1000000.0, 6)
                       AS max_gap_s,
                   round((CAST(sum(gap) AS BIGINT) / count(gap))
                         / 1000000.0, 6) AS mean_gap_s
            FROM g WHERE gap IS NOT NULL
            GROUP BY user_id
        """,
        "supplier_network_hops": """
            WITH RECURSIVE e AS (
                SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            ),
            walk(ntype, key, hop) AS (
                SELECT 'c', 0, 0
                UNION
                SELECT CASE WHEN w.ntype = 'c' THEN 's' ELSE 'c' END,
                       CASE WHEN w.ntype = 'c' THEN e.s ELSE e.c END,
                       w.hop + 1
                FROM walk w JOIN e ON (w.ntype = 'c' AND e.c = w.key)
                                  OR (w.ntype = 's' AND e.s = w.key)
                WHERE w.hop < 4
            )
            SELECT ntype, key AS node_key, min(hop) AS hop
            FROM walk GROUP BY ntype, key
        """,
        "top_supplier_per_nation": """
            SELECT n_name, s_suppkey, s_name,
                   round(s_acctbal, 2) AS s_acctbal
            FROM (
                SELECT s_nationkey, s_suppkey, s_name, s_acctbal,
                       row_number() OVER (
                           PARTITION BY s_nationkey
                           ORDER BY CAST(round(s_acctbal * 100, 0)
                                         AS BIGINT) DESC,
                                    s_suppkey) AS rn
                FROM supplier
            ) JOIN nation ON n_nationkey = s_nationkey
            WHERE rn = 1
        """,
        "multigrain_events": """
            WITH e AS (
                SELECT event_type,
                       date_trunc('day', ts) AS day,
                       CAST(round(value * 100, 0) AS BIGINT) AS cents
                FROM events
            )
            SELECT event_type, day, count(*) AS n_events,
                   CAST(sum(cents) AS BIGINT) / 100.0 AS total_value
            FROM e GROUP BY event_type, day
            UNION ALL
            SELECT event_type, TIMESTAMP '1970-01-01', count(*),
                   CAST(sum(cents) AS BIGINT) / 100.0
            FROM e GROUP BY event_type
            UNION ALL
            SELECT '(all)', day, count(*),
                   CAST(sum(cents) AS BIGINT) / 100.0
            FROM e GROUP BY day
            UNION ALL
            SELECT '(all)', TIMESTAMP '1970-01-01', count(*),
                   CAST(sum(cents) AS BIGINT) / 100.0
            FROM e
        """,
        "weekly_profile_events": """
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) % 168
                       AS hour_of_week,
                   count(*) AS n_obs,
                   round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                              AS BIGINT) / 100.0 / count(*), 4) AS v_mean
            FROM events
            GROUP BY event_type, hour_of_week
        """,
        # M4 downsample: four row_number windows pick first/last/min/max
        # per (user, day bucket); DISTINCT collapses shared points
        "m4_downsample_events": """
            WITH c AS (
                SELECT user_id,
                       CAST(floor(epoch(ts) / 86400) AS BIGINT) AS bucket,
                       ts, event_id,
                       CAST(round(value * 100, 0) AS BIGINT) AS cents
                FROM events
            ),
            r AS (
                SELECT *,
                       row_number() OVER (PARTITION BY user_id, bucket
                           ORDER BY ts, event_id) AS rf,
                       row_number() OVER (PARTITION BY user_id, bucket
                           ORDER BY ts DESC, event_id DESC) AS rl,
                       row_number() OVER (PARTITION BY user_id, bucket
                           ORDER BY cents, ts, event_id) AS rmin,
                       row_number() OVER (PARTITION BY user_id, bucket
                           ORDER BY cents DESC, ts, event_id) AS rmax
                FROM c
            )
            SELECT DISTINCT user_id, bucket, ts, cents / 100.0 AS value
            FROM r WHERE rf = 1 OR rl = 1 OR rmin = 1 OR rmax = 1
        """,
        "sessionize_events": win.sessionize_sql(),
        "hopping_1h_15m_events": win.hopping_windows_sql(),
        "asof_click_purchase": win.asof_join_sql(),
        # forward-looking funnel: click followed by purchase within 1h
        "funnel_click_purchase": """
            WITH c AS (
                SELECT user_id, ts FROM events
                WHERE event_type = 'click'
            ),
            conv AS (
                SELECT CAST(floor(epoch(c.ts) / 86400) AS BIGINT) AS day,
                       CAST(EXISTS(
                           SELECT 1 FROM events p
                           WHERE p.event_type = 'purchase'
                             AND p.user_id = c.user_id
                             AND p.ts >= c.ts
                             AND p.ts <= c.ts + INTERVAL 1 HOUR)
                           AS BIGINT) AS conv
                FROM c
            )
            SELECT day,
                   count(*) AS n_first,
                   CAST(sum(conv) AS BIGINT) AS n_converted,
                   round(sum(conv) / CAST(count(*) AS DOUBLE), 6)
                       AS conversion_rate
            FROM conv GROUP BY day
        """,
        "doc_token_counts": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                   END AS n_tokens,
                   length(text) AS n_chars_actual
            FROM documents
        """,
        "doc_token_counts_bpe": f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                        '{tx.BpeishTokenCounter.PATTERN.replace("'", "''")}'
                        )) AS BIGINT) AS n_bpe_pieces
            FROM documents
        """,
        # Efraimidis-Spirakis weighted sample: key = u^(1/w), u from the
        # doc-id hash — same double arithmetic as the pipeline
        "sample_weighted_docs": """
            WITH k AS (
                SELECT doc_id,
                       greatest(n_chars, 1) AS weight,
                       pow((CAST(md5_number_lower(
                                CAST(doc_id AS VARCHAR)) AS DOUBLE)
                            + 1.0) / 18446744073709551616.0,
                           1.0 / greatest(n_chars, 1)) AS skey
                FROM documents
            )
            SELECT doc_id, CAST(weight AS BIGINT) AS weight
            FROM k ORDER BY skey DESC, doc_id LIMIT 25
        """,
        "doc_lang_id": _LANG_ID_SQL,
        "doc_fingerprints": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "doc_winnow_fingerprints": sk.winnow_sql(),
        "doc_containment_pairs": sk.containment_sql(),
        "pmi_collocations_docs": ft.pmi_sql(),
        "user_features_asof": ft.user_features_asof_sql(),
        "vocab_top_tokens": r"""
            SELECT tok AS token, count(*) AS n_total
            FROM (SELECT unnest(regexp_split_to_array(trim(text),
                                                      '\s+')) AS tok
                  FROM documents)
            WHERE tok <> ''
            GROUP BY tok
            ORDER BY n_total DESC, token ASC
            LIMIT 100
        """,
        # Heaps-law growth: new types per doc (in doc order) + running
        # vocabulary size
        "vocab_growth_docs": r"""
            WITH t AS (
                SELECT tok, min(doc_id) AS d
                FROM (SELECT doc_id,
                             unnest(regexp_split_to_array(trim(text),
                                                          '\s+')) AS tok
                      FROM documents)
                WHERE tok <> '' GROUP BY tok
            ),
            n AS (SELECT d AS doc_id, count(*) AS n_new FROM t GROUP BY d)
            SELECT doc_id,
                   CAST(n_new AS BIGINT) AS n_new_types,
                   CAST(sum(n_new) OVER (ORDER BY doc_id) AS BIGINT)
                       AS cum_types
            FROM n
        """,
        # Zipf OLS over ln(rank)/ln(freq), two-pass centered moments —
        # the same closed form the kernel computes
        "vocab_zipf_fit": r"""
            WITH v AS (
                SELECT tok, count(*) AS n
                FROM (SELECT unnest(regexp_split_to_array(trim(text),
                                                          '\s+')) AS tok
                      FROM documents)
                WHERE tok <> '' GROUP BY tok
            ),
            r AS (
                SELECT ln(CAST(row_number() OVER (
                           ORDER BY n DESC, tok) AS DOUBLE)) AS x,
                       ln(CAST(n AS DOUBLE)) AS y, n
                FROM v
            ),
            m AS (SELECT avg(x) AS mx, avg(y) AS my FROM r),
            s AS (
                SELECT count(*) AS n_types,
                       CAST(sum(n) AS BIGINT) AS n_tokens,
                       sum((x - mx) * (y - my))
                           / sum((x - mx) * (x - mx)) AS slope,
                       any_value(my) AS my, any_value(mx) AS mx
                FROM r, m
            ),
            e AS (
                SELECT s.n_types, s.n_tokens, s.slope,
                       s.my - s.slope * s.mx AS icept,
                       sum(pow(r.y - (s.my - s.slope * s.mx
                                      + s.slope * r.x), 2)) AS ss_res,
                       sum(pow(r.y - s.my, 2)) AS ss_tot
                FROM r, s
                GROUP BY s.n_types, s.n_tokens, s.slope, s.my, s.mx
            )
            SELECT n_types, n_tokens,
                   round(slope, 6) AS zipf_slope,
                   round(icept, 6) AS zipf_intercept,
                   round(1.0 - ss_res / ss_tot, 6) AS r2
            FROM e
        """,
        "sample_stratified_docs": """
            SELECT doc_id, lang, sample_rank FROM (
                SELECT doc_id, lang,
                       CAST(row_number() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS BIGINT) AS sample_rank
                FROM documents
            ) WHERE sample_rank <= 20
        """,
        "doc_tfidf_scores": r"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\s+'))
                           AS t
                FROM documents
            ),
            tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
            tf AS (SELECT doc_id, t, count(*) AS tf
                   FROM tok2 GROUP BY doc_id, t),
            df AS (SELECT t, count(DISTINCT doc_id) AS df
                   FROM tok2 GROUP BY t),
            w AS (
                SELECT tf.doc_id,
                       tf.tf * ln((SELECT count(*) FROM documents)
                                  / CAST(df.df AS DOUBLE)) AS w
                FROM tf JOIN df USING (t)
            )
            SELECT d.doc_id,
                   round(coalesce(sum(w.w), 0), 6) AS tfidf_sum,
                   round(coalesce(max(w.w), 0), 6) AS tfidf_max
            FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id
            GROUP BY d.doc_id
        """,
        # BM25: idf/avgdl constants and the per-term contribution chain
        # are written as the SAME float64 expressions, in the SAME
        # left-associated order, as the engine (k1/b appear as literals
        # 1.2 / 0.75, (k1+1) as (1.2 + 1.0) — never pre-folded, so both
        # sides round identically)
        "bm25_topk_docs": r"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\s+'))
                           AS t
                FROM documents
            ),
            tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
            consts AS (
                SELECT (SELECT count(*) FROM documents) AS n,
                       (SELECT CAST(count(*) AS DOUBLE) FROM tok2)
                           / (SELECT count(*) FROM documents) AS avgdl
            ),
            dl AS (
                SELECT d.doc_id, CAST(count(t.t) AS DOUBLE) AS dl
                FROM documents d LEFT JOIN tok2 t USING (doc_id)
                GROUP BY d.doc_id
            ),
            tf AS (
                SELECT doc_id,
                       CAST(count(*) FILTER (t = 'spark') AS DOUBLE)
                           AS tf1,
                       CAST(count(*) FILTER (t = 'join') AS DOUBLE)
                           AS tf2,
                       CAST(count(*) FILTER (t = 'merge') AS DOUBLE)
                           AS tf3,
                       count(*) FILTER (t IN ('spark', 'join', 'merge'))
                           AS hits
                FROM tok2 GROUP BY doc_id
            ),
            df AS (
                SELECT count(DISTINCT CASE WHEN t = 'spark'
                                      THEN doc_id END) AS df1,
                       count(DISTINCT CASE WHEN t = 'join'
                                      THEN doc_id END) AS df2,
                       count(DISTINCT CASE WHEN t = 'merge'
                                      THEN doc_id END) AS df3
                FROM tok2
            ),
            idf AS (
                SELECT ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) AS idf1,
                       ln(1 + (n - df2 + 0.5) / (df2 + 0.5)) AS idf2,
                       ln(1 + (n - df3 + 0.5) / (df3 + 0.5)) AS idf3
                FROM df, consts
            ),
            sc AS (
                SELECT dl.doc_id,
                       ((CASE WHEN tf1 > 0 THEN idf1 * (tf1 * (1.2 + 1.0))
                              / (tf1 + 1.2 * (1 - 0.75
                                              + 0.75 * dl / avgdl))
                         ELSE 0 END
                         + CASE WHEN tf2 > 0
                                THEN idf2 * (tf2 * (1.2 + 1.0))
                                / (tf2 + 1.2 * (1 - 0.75
                                                + 0.75 * dl / avgdl))
                           ELSE 0 END)
                        + CASE WHEN tf3 > 0
                               THEN idf3 * (tf3 * (1.2 + 1.0))
                               / (tf3 + 1.2 * (1 - 0.75
                                               + 0.75 * dl / avgdl))
                          ELSE 0 END) AS score,
                       tf.hits AS hits
                FROM dl JOIN tf USING (doc_id), idf, consts
                WHERE tf.hits > 0
            )
            SELECT doc_id, round(score, 6) AS score,
                   CAST(hits AS BIGINT) AS n_query_hits
            FROM sc
            ORDER BY round(score, 6) DESC, doc_id
            LIMIT 20
        """,
        "cross_source_dup_prefixes": r"""
            WITH fp AS (
                SELECT DISTINCT
                    md5(array_to_string(
                        regexp_split_to_array(trim(text),
                                              '\s+')[1:5], ' ')) AS fp,
                    source
                FROM documents
            )
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*) AS n_shared_prefixes
            FROM fp a JOIN fp b
                 ON a.fp = b.fp AND a.source < b.source
            GROUP BY a.source, b.source
            ORDER BY source_a, source_b
        """,
        "dedup_exact_docs": """
            SELECT md5(text) AS fingerprint,
                   min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "doc_quality_scores": r"""
            SELECT doc_id,
                   round(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                         / greatest(length(text), 1)::DOUBLE, 6)
                       AS upper_ratio,
                   round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                         / greatest(length(text), 1)::DOUBLE, 6)
                       AS digit_ratio,
                   round(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                         / greatest(length(text), 1)::DOUBLE, 6)
                       AS punct_ratio,
                   round(CASE WHEN trim(text) = '' THEN 0
                         ELSE length(regexp_replace(trim(text), '\s+', '',
                                                    'g'))::DOUBLE
                              / len(regexp_split_to_array(trim(text),
                                                          '\s+'))
                         END, 6) AS mean_token_len
            FROM documents
        """,
        # multimodal: the payload formulas are replayed in closed form, so
        # matching the decoded statistics checks BOTH codec directions
        # (encode_bmp/decode_bmp, encode_wav/decode_wav, frame chunking)
        "image_decode_stats": mm.image_stats_sql(),
        # PNG: same closed-form pixel replay — the Ray side must invert
        # zlib + all five scanline filters to produce these sums
        "image_png_decode_stats": mm.image_stats_sql(),
        # real baseline JPEG decode, exactly-invertible fixture
        "image_jpeg_decode_stats": mm.jpeg_stats_sql(),
        # real RIFF/AVI container demux, frame fan-out
        "video_avi_frame_stats": mm.avi_frame_stats_sql(),
        # real LZW GIF decode (lossless), closed-form replay
        "image_gif_decode_stats": mm.gif_stats_sql(),
        "image_resize_stats": mm.resize_stats_sql(),
        "audio_resample_stats": mm.resample_stats_sql(),
        "audio_decode_stats": mm.audio_stats_sql(),
        "frame_sample_stats": mm.frame_stats_sql(),
        # PCA top direction: power iterations unrolled as CTEs with the
        # same per-iteration 6-decimal normalization checkpoints
        "embedding_pca_top1": sk.pca_top1_sql(),
        # int8 scalar quantization: per-dim [min,max] → [0,255]; integer
        # checksums + order-independent max dequant error (bit-exact)
        "embedding_int8_quantize": """
            WITH e AS (
                SELECT vec_id, unnest(embedding) AS x,
                       unnest(generate_series(1, len(embedding))) AS dim
                FROM embeddings
            ),
            st AS (
                SELECT dim, min(CAST(x AS DOUBLE)) AS mn,
                       max(CAST(x AS DOUBLE)) AS mx
                FROM e GROUP BY dim
            ),
            q AS (
                SELECT e.vec_id, CAST(e.x AS DOUBLE) AS xd, st.mn, st.mx,
                       CASE WHEN st.mx > st.mn
                            THEN round((CAST(e.x AS DOUBLE) - st.mn)
                                       * 255.0 / (st.mx - st.mn), 0)
                            ELSE 0.0 END AS qv
                FROM e JOIN st USING (dim)
            ),
            r AS (
                SELECT vec_id, CAST(qv AS BIGINT) AS qi,
                       abs(xd - (mn + qv * (mx - mn) / 255.0)) AS err
                FROM q
            )
            SELECT vec_id, CAST(sum(qi) AS BIGINT) AS q_sum,
                   min(qi) AS q_min, max(qi) AS q_max,
                   round(max(err), 6) AS max_abs_err
            FROM r GROUP BY vec_id
        """,
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_sum(list_transform(embedding,
                         x -> x::DOUBLE * x::DOUBLE))), 5) AS l2_norm
            FROM embeddings
        """,
        # sequential monitors: the full fit → seed → sequential-update →
        # freeze-at-break semantics, expressed with window functions over
        # the unfrozen trajectory + first-crossing extraction (see
        # nrt_ray/pipelines/monitor_oracles.py) — exact incl. status
        # codes, detection dates and the frozen process value
        "monitor_ewma_events": mo.ewma_sql(),
        "monitor_cusum_events": mo.cusum_sql(),
        "monitor_iqr_events": mo.iqr_sql(),
        "monitor_cusum_nofreeze_events": mo.cusum_sql(freeze=False),
        "monitor_ewma_nofreeze_events": mo.ewma_sql(freeze=False),
        "monitor_iqr_nofreeze_events": mo.iqr_sql(freeze=False),
        "monitor_mosum_nofreeze_events": mo.mosum_sql(freeze=False),
        "monitor_ccdc_nofreeze_events": mo.ccdc_sql(freeze=False),
        "monitor_mosum_h50_events": mo.mosum_sql(h=0.5),
        "monitor_ewma_lambda50_events": mo.ewma_sql(lambda_=0.5),
        "monitor_ccdc_events": mo.ccdc_sql(),
        "monitor_mosum_events": mo.mosum_sql(),
        # robust IRLS fit: every iteration of the kernel's control flow
        # unrolled as CTE stages (see monitor_oracles.rirls_sql)
        "fit_rirls_events": mo.rirls_sql(),
        # reverse-ordered-CUSUM stable fit: recursive residuals of the
        # reversed daily-composite series in closed form (distinct days
        # keep every prefix design nonsingular), boundary crossings,
        # centered suffix refit (see monitor_oracles.roc_sql)
        "fit_roc_stable_events": mo.roc_sql(),
        # MinHash/LSH near-dup candidates + exact-Jaccard verification:
        # md5-low-64 token hashes, mod-2^64 rolling polynomial and
        # xorshift-multiply permutations emulated on HUGEINT (see
        # sketch_oracles.py) — the full sketch replayed in SQL
        "minhash_near_dup_candidates": sk.minhash_candidates_sql(),
        "shingle_dup_stats": sk.shingle_dup_stats_sql(),
        # HyperLogLog distinct-shingle estimate, bit-exact replay
        "shingle_hll_estimate": sk.hll_sql(),
        "ssjoin_exact_docs": sk.ssjoin_sql(),
        "dup_graph_triangles_docs": sk.triangles_sql(),
        # integer power iteration (floor-div), bit-exact on both engines
        "pagerank_dup_graph_docs": sk.pagerank_sql(),
        "daily_active_users_hll": sk.hll_daily_sql(),
        "holt_winters_daily_events": tsq.holt_winters_sql(),
        "lttb_downsample_events": tsq.lttb_sql(),
        # 7-day DFT power via 7 integer phase sums (exact on both sides)
        "weekly_spectral_events": tsq.weekly_spectral_sql(),
        "rle_runs_events": tsq.rle_runs_sql(),
        "sax_symbols_events": tsq.sax_symbols_sql(),
        # Bollinger breakouts decided by the all-integer L^2 > 4Q test
        "bollinger_breakouts_events": tsq.bollinger_breakouts_sql(),
        "seasonal_strength_events": tsq.seasonal_strength_sql(),
        "ewma_crossover_events": tsq.ewma_crossover_sql(),
        "drawdown_events": tsq.drawdown_sql(),
        # integer tabular CuSum, recursive-CTE bit-exact replay
        "cusum_breach_events": tsq.cusum_breach_sql(),
        "doc_readability_scores": tx.readability_sql(),
        # local-level Kalman, Holt-style recursive float replay
        "kalman_level_events": tsq.kalman_level_sql(),
        # binary-segmentation split on integer prefix sums
        "changepoint_events": tsq.changepoint_sql(),
        # scaled-integer median/MAD order statistics
        "mad_outlier_days_events": tsq.mad_outlier_days_sql(),
        # Hurst R/S via the n-scaled integer cumulative-deviation walk
        "rescaled_range_events": tsq.rescaled_range_sql(),
        # Gini: tie-order-invariant integer numerator, one float division
        "gini_daily_events": tsq.gini_daily_sql(),
        "wow_growth_events": tsq.wow_growth_sql(),
        "doc_hapax_ratio": tx.hapax_ratio_sql(),
        # HUGEINT gap moments (us^2 overflows int64), identical float B
        "burstiness_events": tsq.burstiness_sql(),
        "fano_factor_events": tsq.fano_factor_sql(),
        # cross-user global rank via the distributed ordered prefix scan
        "user_percentile_rank_events": tsq.user_percentile_rank_sql(),
        # STL-shaped 7-day MA decomposition, all-integer roughness
        "stl_trend_events": tsq.stl_trend_sql(),
        "user_motif_daily": tsq.user_motif_sql(),
        # best click→purchase lead/lag, exact int xcorr, smallest-lag tie
        "user_leadlag_events": tsq.user_leadlag_sql(),
        # OLAP grouping sets composed from one finest-grain pass
        "events_cube": tsq.EVENTS_CUBE_SQL,
        # 7×7 integer DTW, DP unrolled via chained lateral-alias CTEs
        "user_week_shape_dtw": tsq.user_week_shape_dtw_sql(),
        # TSDB absent/staleness: series that stopped reporting
        "stale_users_events": tsq.stale_users_sql(),
        # gap-fill budgeting metric: active/span days per user
        "user_completeness_events": tsq.USER_COMPLETENESS_SQL,
        # SQ8 scalar-quantized ANN: per-dim codebook + integer dots
        "sq8_topk_dot": sim.sq8_topk_sql(),
        # batched multi-query ANN: one matmul per batch, Q queries
        "multi_topk_cosine": sim.multi_topk_sql(),
        # PQ/ADC: per-subspace k-means unrolled, codes + distance table
        "pq_topk_adc": sk.pq_topk_sql(),
        # Naive Bayes doc classifier: fixed-point integer scores
        "nb_classify_docs": clf.NB_CLASSIFY_SQL,
        # DSIR hashed-ngram importance: md5-low-64 unigrams + one
        # rolling-polynomial bigram fold, fixed-point bucket weights
        "dsir_importance_docs": dsr.dsir_importance_sql(),
        # deterministic DSIR selection: exact top-quarter by
        # (logratio DESC, doc_id) via QUALIFY row_number
        "dsir_select_docs": dsr.dsir_select_sql(),
        # ExactSubstr-style per-doc duplicated-window fraction
        "dup_span_stats_docs": tx.dup_span_stats_sql(),
        # Gopher document-quality rules, integer-exact thresholds
        "gopher_rules_docs": tx.gopher_rules_sql(),
        # source overlap matrix: shingle source-bitmask histogram
        "source_overlap_matrix": sk.source_overlap_sql(),
        # weighted corpus blending: largest-remainder quotas + md5 rank
        "mix_sources_docs": tx.mix_sources_sql(),
        # BPE tokenizer training: R merge rounds unrolled as CTEs
        # over delimiter-wrapped symbol strings (replace == BPE rule)
        "bpe_train_merges_docs": bp.bpe_train_sql(),
        # encode with the trained merges; token counts after R rounds
        "bpe_encode_stats_docs": bp.bpe_encode_sql(),
        # 3-step ordered funnel, windowed from the first view
        "funnel_conversion_events": tsq.funnel_conversion_sql(),
        # time-in-state totals (state_agg), exact int64 µs
        "state_durations_events": tsq.STATE_DURATIONS_SQL,
        # last-touch purchase attribution within a click window
        "attribution_events": tsq.attribution_sql(),
        # RFM quartile segmentation over exact integer metrics
        "rfm_segments_events": tsq.RFM_SEGMENTS_SQL,
        # Croston intermittent demand: recursive-CTE float replay
        "croston_events": tsq.croston_sql(),
        # Markov entropy rate, lex-ordered terms under round-6
        "transition_entropy_events": tsq.transition_entropy_sql(),
        # basket lift from the mask histogram (oracle self-joins)
        "basket_lift_events": tsq.basket_lift_sql(),
        # lag-7-vs-lag-1 MAE ratio from two integer sums
        "seasonal_naive_mase_events": tsq.seasonal_naive_mase_sql(),
        # strict local maxima with integer prominence, ±2-day window
        "peak_days_events": tsq.peak_days_sql(),
        # Benford first-digit chi^2 with inlined probability doubles
        "benford_deviation_events": tsq.benford_deviation_sql(),
        # integer token-bucket recursion (admission control replay)
        "token_bucket_drops_events": tsq.token_bucket_sql(),
        # per-source JSD vs corpus unigram distribution
        "source_js_divergence_docs": tx.source_js_divergence_sql(),
        # count-min sketch heavy hitters, integer-exact hash replay
        "token_cms_heavy_hitters": sk.cms_sql(),
        # bloom semi-join prefilter with exact false-positive accounting
        "bloom_semijoin_docs": sk.bloom_sql(),
        # flagship curation composition: band ∧ exact-dedup ∧ near-dedup
        # ∧ decontaminate, then sequence packing of the survivors
        "curate_corpus_docs": cu.curate_sql(),
        # deterministic shuffle: rank in md5(doc_id) order + shard
        "global_shuffle_docs": """
            SELECT doc_id,
                   CAST(row_number() OVER (
                       ORDER BY md5_number_lower(
                           CAST(doc_id AS VARCHAR))) - 1
                       AS BIGINT) AS shuffle_rank,
                   CAST((row_number() OVER (
                       ORDER BY md5_number_lower(
                           CAST(doc_id AS VARCHAR))) - 1) // 64
                       AS BIGINT) AS shard
            FROM documents
        """,
        # inverted-index sink round-trip: the Ray side builds the
        # partitioned postings parquet, reads it BACK and aggregates;
        # the oracle recomputes the same stats straight from documents
        "inverted_index_stats": r"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\s+'))
                           AS t
                FROM documents
            ),
            tf AS (SELECT t, doc_id, count(*) AS c
                   FROM tok WHERE t <> '' GROUP BY t, doc_id),
            df AS (SELECT t, count(*) AS df, sum(c) AS occ
                   FROM tf GROUP BY t)
            SELECT count(*) AS n_tokens,
                   CAST(sum(df) AS BIGINT) AS n_postings,
                   max(df) AS max_df,
                   CAST(sum(occ) AS BIGINT) AS total_occurrences
            FROM df
        """,
        # filter by exact global percentile band (quality-filter shape)
        "docs_length_band": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE n_chars >= (SELECT quantile_disc(n_chars, 0.05)
                              FROM documents)
              AND n_chars <= (SELECT quantile_disc(n_chars, 0.95)
                              FROM documents)
        """,
        # per-group top-k (longest docs per language, doc_id tie-break)
        "top_docs_per_lang": """
            SELECT doc_id, lang, n_chars, rank FROM (
                SELECT doc_id, lang, n_chars,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY n_chars DESC, doc_id) AS rank
                FROM documents)
            WHERE rank <= 3
        """,
        "near_dup_jaccard_verified": sk.jaccard_verified_sql(),
        # end-to-end near-dup dedup: survivors after dropping doc_b of
        # every verified pair (the verification query as a subquery)
        "dedup_near_docs": f"""
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id NOT IN (
                SELECT doc_b FROM ({sk.jaccard_verified_sql()}))
        """,
        # corpus composition table per source (docs/chars/tokens + mix)
        "corpus_mix_docs": r"""
            WITH s AS (
                SELECT source, count(*) AS n_docs,
                       CAST(sum(n_chars) AS BIGINT) AS n_chars,
                       CAST(sum(CASE WHEN trim(text) = '' THEN 0
                                ELSE len(regexp_split_to_array(
                                    trim(text), '\s+')) END) AS BIGINT)
                           AS n_tokens
                FROM documents GROUP BY source
            )
            SELECT source, n_docs, n_chars, n_tokens,
                   round(n_docs / CAST(sum(n_docs) OVER () AS DOUBLE), 6)
                       AS doc_fraction,
                   round(n_tokens
                         / CAST(sum(n_tokens) OVER () AS DOUBLE), 6)
                       AS token_fraction
            FROM s
        """,
        # within-doc repetition profile over positional 5-gram shingles
        "doc_repetition_stats": sk.repetition_stats_sql(),
        # per-doc shared-shingle fraction vs corpus-wide shingle DF
        "doc_boilerplate_ratio": sk.boilerplate_sql(),
        "doc_novelty_scores": sk.novelty_sql(),
        # unigram LM scoring: mean token log-prob + pseudo-perplexity
        # against the corpus unigram distribution
        "doc_unigram_lm_scores": r"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\s+'))
                           AS t
                FROM documents
            ),
            tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
            freq AS (SELECT t, count(*) AS c FROM tok2 GROUP BY t),
            tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq),
            d AS (
                SELECT t2.doc_id, count(*) AS n_tokens,
                       avg(ln(f.c / (SELECT n FROM tot))) AS mlp
                FROM tok2 t2 JOIN freq f ON f.t = t2.t
                GROUP BY t2.doc_id
            )
            SELECT doc.doc_id,
                   coalesce(d.n_tokens, 0) AS n_tokens,
                   round(coalesce(d.mlp, 0), 6) AS mean_logprob,
                   round(exp(-coalesce(d.mlp, 0)), 6)
                       AS pseudo_perplexity
            FROM documents doc LEFT JOIN d USING (doc_id)
        """,
        # bigram LM: conditional p = bigram count / left-continuation
        # total, trained on the corpus itself (every scored bigram
        # exists; no smoothing)
        "doc_bigram_lm_scores": r"""
            WITH d0 AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+')
                           AS arr
                FROM documents
            ),
            tok0 AS (
                SELECT doc_id, unnest(arr) AS t,
                       unnest(generate_series(1, len(arr))) AS pos
                FROM d0
            ),
            tok1 AS (
                SELECT doc_id, t,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY pos) AS idx
                FROM tok0 WHERE t <> ''
            ),
            big AS (
                SELECT doc_id, t AS w1,
                       lead(t) OVER (PARTITION BY doc_id
                                     ORDER BY idx) AS w2
                FROM tok1
            ),
            big2 AS (SELECT * FROM big WHERE w2 IS NOT NULL),
            bf AS (SELECT w1, w2, count(*) AS c FROM big2
                   GROUP BY w1, w2),
            lf AS (SELECT w1, CAST(sum(c) AS DOUBLE) AS cl FROM bf
                   GROUP BY w1),
            d AS (
                SELECT b.doc_id, count(*) AS n_bigrams,
                       avg(ln(f.c / l.cl)) AS mlp
                FROM big2 b
                JOIN bf f ON f.w1 = b.w1 AND f.w2 = b.w2
                JOIN lf l ON l.w1 = b.w1
                GROUP BY b.doc_id
            )
            SELECT doc.doc_id,
                   coalesce(d.n_bigrams, 0) AS n_bigrams,
                   round(coalesce(d.mlp, 0), 6) AS mean_logprob_bi,
                   round(exp(-coalesce(d.mlp, 0)), 6) AS ppl_bi
            FROM documents doc LEFT JOIN d USING (doc_id)
        """,
        # PII scrub: per-pattern RE2 counts on the original text + md5 of
        # the sequentially scrubbed text (email → ipv4 → phone), exactly
        # the Arrow replace_substring_regex chain in textops.pii_scrub
        "doc_pii_scrub": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       AS n_email,
                   len(regexp_extract_all(text,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
                       AS n_ipv4,
                   len(regexp_extract_all(text,
                       '\+[0-9][0-9 ()-]{6,14}[0-9]')) AS n_phone,
                   md5(regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                       '<IP>', 'g'),
                       '\+[0-9][0-9 ()-]{6,14}[0-9]',
                       '<PHONE>', 'g')) AS scrub_md5
            FROM documents
        """,
        # Gopher composite quality filter: every feature an exact-integer
        # derivation, comparisons on the unrounded doubles (identical
        # IEEE divisions both sides)
        "gopher_filter_docs": r"""
            WITH f AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\s+'))
                       END AS n_words,
                       length(regexp_replace(text, '\s', '', 'g'))
                           AS n_nonws,
                       len(regexp_extract_all(text, '#|\.\.\.')) AS n_sym,
                       len(list_intersect(list_distinct(
                               regexp_split_to_array(lower(text),
                                                     '[^a-z]+')),
                           ['the', 'a', 'and', 'of', 'to']))
                           AS n_stop_hits
                FROM documents
            ),
            g AS (
                SELECT doc_id, n_words, n_stop_hits,
                       CASE WHEN n_words > 0
                            THEN n_nonws::DOUBLE / n_words
                            ELSE 0.0 END AS mean_wlen,
                       n_sym::DOUBLE / greatest(n_words, 1) AS sym_ratio
                FROM f
            )
            SELECT doc_id, n_words,
                   round(mean_wlen, 6) AS mean_word_len,
                   round(sym_ratio, 6) AS symbol_ratio,
                   n_stop_hits,
                   (n_words >= 50 AND n_words <= 100000
                    AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
                    AND sym_ratio < 0.1 AND n_stop_hits >= 1) AS keep
            FROM g
        """,
        # CCNet head/middle/tail buckets: per-lang tertile thresholds via
        # quantile_disc over the ROUNDED unigram-LM score (the same
        # rounded column both engines emit), bucket by >= comparisons
        "ccnet_lm_buckets": r"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\s+'))
                           AS t
                FROM documents
            ),
            tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
            freq AS (SELECT t, count(*) AS c FROM tok2 GROUP BY t),
            tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq),
            d AS (
                SELECT t2.doc_id,
                       avg(ln(f.c / (SELECT n FROM tot))) AS mlp
                FROM tok2 t2 JOIN freq f ON f.t = t2.t
                GROUP BY t2.doc_id
            ),
            scores AS (
                SELECT doc.doc_id, doc.lang,
                       round(coalesce(d.mlp, 0), 6) AS mean_logprob
                FROM documents doc LEFT JOIN d USING (doc_id)
            ),
            thr AS (
                SELECT lang,
                       quantile_disc(mean_logprob, 1.0/3) AS t_mid,
                       quantile_disc(mean_logprob, 2.0/3) AS t_head
                FROM scores GROUP BY lang
            )
            SELECT s.doc_id, s.lang, s.mean_logprob,
                   CASE WHEN s.mean_logprob >= t.t_head THEN 'head'
                        WHEN s.mean_logprob >= t.t_mid THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM scores s JOIN thr t USING (lang)
        """,
        # cross-doc repeated spans: positional-shingle self-join +
        # gaps-and-islands maximal diagonal runs (sketch_oracles)
        "repeated_span_pairs": sk.repeated_spans_sql(),
        # span-removal apply: interval merge + cleaned-text md5 replay
        "dedup_spans_docs": sk.span_dedup_sql(),
        # benchmark decontamination: distinct-shingle overlap vs the
        # doc_id % 31 == 0 benchmark subset
        "decontaminate_docs": sk.decontaminate_sql(31),
        # sequence packing: concatenate docs in doc_id order, chunk into
        # 256-token bins; bin range per doc = window cumsum replay of
        # the distributed ordered prefix-scan
        "pack_sequences_docs": r"""
            WITH n AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\s+'))
                       END AS n_tokens
                FROM documents
            ),
            c AS (
                SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                       coalesce(sum(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS cb
                FROM n
            )
            SELECT doc_id, n_tokens,
                   CAST(cb // 256 AS BIGINT) AS start_bin,
                   CAST(CASE WHEN n_tokens = 0 THEN cb // 256
                             ELSE (cb + n_tokens - 1) // 256
                        END AS BIGINT) AS end_bin
            FROM c
        """,
        # keep-best near-dup dedup: survivors after dropping every
        # cluster member except the longest (doc_id tie-break)
        "dedup_near_keep_best": f"""
            WITH RECURSIVE vp AS ({sk.jaccard_verified_sql()}),
            edges AS (
                SELECT doc_a AS a, doc_b AS b FROM vp
                UNION
                SELECT doc_b, doc_a FROM vp
            ),
            reach(n, m) AS (
                SELECT a, b FROM edges
                UNION
                SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
            ),
            lbl AS (
                SELECT n AS doc_id, min(least(n, m)) AS cluster_id
                FROM reach GROUP BY n
            ),
            ranked AS (
                SELECT l.doc_id,
                       row_number() OVER (
                           PARTITION BY l.cluster_id
                           ORDER BY d.n_chars DESC, l.doc_id) AS rk
                FROM lbl l JOIN documents d USING (doc_id)
            )
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id NOT IN
                  (SELECT doc_id FROM ranked WHERE rk > 1)
        """,
        # leakage-safe splits: split hash keyed on the near-dup cluster
        # representative so clusters never straddle train/val
        "leakage_safe_splits": f"""
            WITH RECURSIVE vp AS ({sk.jaccard_verified_sql()}),
            edges AS (
                SELECT doc_a AS a, doc_b AS b FROM vp
                UNION
                SELECT doc_b, doc_a FROM vp
            ),
            reach(n, m) AS (
                SELECT a, b FROM edges
                UNION
                SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
            ),
            lbl AS (
                SELECT n AS doc_id, min(least(n, m)) AS cluster_id
                FROM reach GROUP BY n
            ),
            keyed AS (
                SELECT d.doc_id,
                       coalesce(l.cluster_id, d.doc_id) AS split_key
                FROM documents d LEFT JOIN lbl l USING (doc_id)
            )
            SELECT doc_id, split_key,
                   CASE WHEN CAST(md5_number_lower(
                            CAST(split_key AS VARCHAR)) AS HUGEINT)
                            % 8 = 0
                        THEN 'val' ELSE 'train' END AS split
            FROM keyed
        """,
        # duplicate clusters: transitive closure of the verified pair
        # graph via a recursive CTE; cluster id = min reachable doc id
        "near_dup_clusters": f"""
            WITH RECURSIVE vp AS ({sk.jaccard_verified_sql()}),
            edges AS (
                SELECT doc_a AS a, doc_b AS b FROM vp
                UNION
                SELECT doc_b, doc_a FROM vp
            ),
            reach(n, m) AS (
                SELECT a, b FROM edges
                UNION
                SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
            ),
            lbl AS (
                SELECT n AS doc_id, min(least(n, m)) AS cluster_id
                FROM reach GROUP BY n
            )
            SELECT l.doc_id, l.cluster_id, cs.cluster_size
            FROM lbl l
            JOIN (SELECT cluster_id, count(*) AS cluster_size
                  FROM lbl GROUP BY cluster_id) cs USING (cluster_id)
        """,
        # CCDC-stable fit over the 30-day events table: the shrink loop
        # exits on the half-year span rule after the first full-history
        # OLS, so the oracle is that OLS + the three stability conditions
        # (kernels/fit.py ccdc_stable_fit; reference
        # /root/reference/nrt/fit_methods.py:166-251)
        "fit_ccdc_stable_events": """
            WITH f1 AS (
                SELECT user_id, count(*) AS nh,
                       avg(CAST(floor(epoch(ts)/86400) AS DOUBLE)) AS ad,
                       avg(value) AS av
                FROM events GROUP BY user_id
            ),
            fit0 AS (
                SELECT e.user_id, any_value(f.ad) AS ad,
                       any_value(f.av) AS av,
                       sum((floor(epoch(e.ts)/86400) - f.ad)
                           * (e.value - f.av))
                       / sum((floor(epoch(e.ts)/86400) - f.ad)
                             * (floor(epoch(e.ts)/86400) - f.ad)) AS b1
                FROM events e JOIN f1 f USING (user_id)
                GROUP BY e.user_id
            ),
            fit AS (SELECT user_id, ad, av, b1, av - ad * b1 AS b0
                    FROM fit0),
            resid AS (
                SELECT e.user_id, e.ts,
                       (f.b0 + f.b1 * floor(epoch(e.ts)/86400))
                           - e.value AS r
                FROM events e JOIN fit f USING (user_id)
            ),
            fstat AS (
                SELECT user_id, sqrt(avg(r * r)) AS rmse,
                       arg_min(r, ts) AS r_first, arg_max(r, ts) AS r_last
                FROM resid GROUP BY user_id
            )
            SELECT f.user_id,
                   round(f.b0, 5) AS intercept,
                   round(f.b1, 8) AS slope,
                   (abs(f.b1) / fs.rmse < 3.0
                    AND abs(fs.r_first) / fs.rmse < 3.0
                    AND abs(fs.r_last) / fs.rmse < 3.0) AS stable
            FROM fit f JOIN fstat fs USING (user_id)
        """,
        # compressed 1d segments: every reported quantity is derived from
        # the DECODED dod/xor payloads, so matching the SQL recomputation
        # from raw events checks the whole encode→decode cycle (codec
        # byte format itself is pytest-round-tripped exhaustively)
        "segments_1d_events": r"""
            WITH obs AS (
                SELECT user_id,
                       CAST(floor(epoch(ts)/86400) AS BIGINT) AS b,
                       sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
                FROM events GROUP BY user_id, b
            )
            SELECT user_id, '1d' AS tier,
                   count(*) AS n_points,
                   make_timestamp(min(b)*86400*1000000) AS seg_start,
                   make_timestamp(max(b)*86400*1000000) AS seg_end,
                   CAST(sum(b*86400) AS BIGINT) AS ts_checksum,
                   CAST(sum(cents) AS BIGINT) AS value_cents
            FROM obs GROUP BY user_id
        """,
        # compressed-store range scan: replays the deterministic segment
        # chunking (8 consecutive daily buckets per segment, in bucket
        # order per url) and the metadata prune (segment decoded iff its
        # [first,last] bucket range overlaps [Jan10, Jan20)), so both the
        # decoded values AND the pruning decision are value-checked
        "segment_range_scan_events": r"""
            WITH obs AS (
                SELECT user_id,
                       CAST(floor(epoch(ts)/86400) AS BIGINT) AS b,
                       sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
                FROM events GROUP BY user_id, b
            ),
            ordered AS (
                SELECT user_id, b, cents,
                       (row_number() OVER (PARTITION BY user_id
                                           ORDER BY b) - 1) // 8 AS chunk
                FROM obs
            ),
            decoded AS (
                SELECT user_id, chunk FROM ordered GROUP BY user_id, chunk
                HAVING max(b) >= CAST(epoch(TIMESTAMP '2024-01-10')/86400
                                      AS BIGINT)
                   AND min(b) <  CAST(epoch(TIMESTAMP '2024-01-20')/86400
                                      AS BIGINT)
            )
            SELECT o.user_id,
                   CAST(count(*) FILTER (
                        WHERE o.b >= CAST(epoch(TIMESTAMP '2024-01-10')
                                          /86400 AS BIGINT)
                          AND o.b <  CAST(epoch(TIMESTAMP '2024-01-20')
                                          /86400 AS BIGINT)) AS BIGINT)
                       AS n_points,
                   CAST(coalesce(sum(o.b * 86400) FILTER (
                        WHERE o.b >= CAST(epoch(TIMESTAMP '2024-01-10')
                                          /86400 AS BIGINT)
                          AND o.b <  CAST(epoch(TIMESTAMP '2024-01-20')
                                          /86400 AS BIGINT)), 0) AS BIGINT)
                       AS ts_checksum,
                   CAST(coalesce(sum(o.cents) FILTER (
                        WHERE o.b >= CAST(epoch(TIMESTAMP '2024-01-10')
                                          /86400 AS BIGINT)
                          AND o.b <  CAST(epoch(TIMESTAMP '2024-01-20')
                                          /86400 AS BIGINT)), 0) AS BIGINT)
                       AS value_cents,
                   CAST(count(DISTINCT o.chunk) AS BIGINT)
                       AS n_segments_decoded
            FROM ordered o JOIN decoded d USING (user_id, chunk)
            GROUP BY o.user_id
        """,
        # continuous-aggregate rewrite: weekly numbers recomputed straight
        # from raw events must equal the Ray side's compose-from-daily-tier
        # answer (integer cents make tier composition exact)
        "weekly_from_daily_events": r"""
            WITH day AS (
                SELECT user_id,
                       CAST(floor(epoch(ts)/86400) AS BIGINT) AS d,
                       count(*) AS cnt,
                       sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents,
                       min(CAST(round(value * 100, 0) AS BIGINT)) AS mn,
                       max(CAST(round(value * 100, 0) AS BIGINT)) AS mx
                FROM events GROUP BY user_id, d
            )
            SELECT user_id,
                   make_timestamp(((d * 86400) // 604800) * 604800
                                  * 1000000) AS week_ts,
                   CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(cnt) AS BIGINT) AS n_obs,
                   CAST(sum(cents) AS BIGINT) AS value_cents,
                   CAST(min(mn) AS BIGINT) AS vmin_cents,
                   CAST(max(mx) AS BIGINT) AS vmax_cents
            FROM day GROUP BY user_id, week_ts
        """,
        # 64-bit SimHash over whitespace tokens; token hash = md5 low 64
        # bits = DuckDB md5_number_lower, so the oracle rebuilds the
        # exact bit votes
        "doc_simhashes": r"""
            WITH t AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\s+'))
                           AS tok
                FROM documents
            ),
            t2 AS (SELECT doc_id, md5_number_lower(tok) AS h
                   FROM t WHERE tok <> ''),
            bb AS (SELECT unnest(generate_series(0, 63)) AS bit),
            acc AS (
                SELECT t2.doc_id, bb.bit,
                       sum(CAST((t2.h >> bb.bit) & 1 AS BIGINT) * 2 - 1)
                           AS s
                FROM t2 CROSS JOIN bb GROUP BY t2.doc_id, bb.bit
            ),
            val AS (
                SELECT doc_id,
                       sum(CASE WHEN s > 0 AND bit >= 32
                                THEN (CAST(1 AS BIGINT) << (bit - 32))
                                ELSE 0 END) AS hi,
                       sum(CASE WHEN s > 0 AND bit < 32
                                THEN (CAST(1 AS BIGINT) << bit)
                                ELSE 0 END) AS lo
                FROM acc GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(printf('%08x%08x', CAST(v.hi AS BIGINT),
                                   CAST(v.lo AS BIGINT)),
                            '0000000000000000') AS simhash
            FROM documents d LEFT JOIN val v USING (doc_id)
        """,
        # SimHash LSH near-dup pairs: same hi/lo SimHash rebuild, four
        # 16-bit bands, bucket cap 1000 (mirrors MAX_BUCKET), Hamming via
        # bit_count(xor) on each half — replays the Ray band scheme
        # exactly, so even >3-Hamming approximation never diverges
        "simhash_near_dup_pairs": r"""
            WITH t AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\s+'))
                           AS tok
                FROM documents
            ),
            t2 AS (SELECT doc_id, md5_number_lower(tok) AS h
                   FROM t WHERE tok <> ''),
            bb AS (SELECT unnest(generate_series(0, 63)) AS bit),
            acc AS (
                SELECT t2.doc_id, bb.bit,
                       sum(CAST((t2.h >> bb.bit) & 1 AS BIGINT) * 2 - 1)
                           AS s
                FROM t2 CROSS JOIN bb GROUP BY t2.doc_id, bb.bit
            ),
            val AS (
                SELECT doc_id,
                       sum(CASE WHEN s > 0 AND bit >= 32
                                THEN (CAST(1 AS BIGINT) << (bit - 32))
                                ELSE 0 END) AS hi,
                       sum(CASE WHEN s > 0 AND bit < 32
                                THEN (CAST(1 AS BIGINT) << bit)
                                ELSE 0 END) AS lo
                FROM acc GROUP BY doc_id
            ),
            val2 AS (
                SELECT d.doc_id, CAST(coalesce(v.hi, 0) AS BIGINT) AS hi,
                       CAST(coalesce(v.lo, 0) AS BIGINT) AS lo
                FROM documents d LEFT JOIN val v USING (doc_id)
            ),
            bands AS (
                SELECT doc_id, hi, lo, b,
                       CASE b WHEN 0 THEN lo & 65535
                              WHEN 1 THEN (lo >> 16) & 65535
                              WHEN 2 THEN hi & 65535
                              ELSE (hi >> 16) & 65535 END AS key
                FROM val2
                CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
            ),
            sized AS (
                SELECT *, count(*) OVER (PARTITION BY b, key) AS n
                FROM bands
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
                       bit_count(xor(a.hi, c.hi))
                           + bit_count(xor(a.lo, c.lo)) AS hamming
                FROM sized a JOIN sized c
                  ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id
                WHERE a.n <= 1000
            )
            SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
            FROM cand WHERE hamming <= 3
        """,
        "embedding_topk_cosine": """
            WITH q AS (
                SELECT embedding AS qe FROM embeddings
                ORDER BY vec_id LIMIT 1
            )
            SELECT vec_id,
                   round(list_cosine_similarity(
                       list_transform(embedding, x -> x::DOUBLE),
                       list_transform((SELECT qe FROM q),
                                      x -> x::DOUBLE)), 5) AS cosine_sim
            FROM embeddings
            ORDER BY cosine_sim DESC, vec_id DESC LIMIT 10
        """,
        # hyperplane-LSH embedding ops: the seeded plane matrix inlined
        # as DOUBLE[] literals replays the bucket assignment exactly
        "embedding_lsh_topk_cosine": sk.lsh_topk_sql(),
        # per-label centroid: unnest-with-position mean per dimension
        "embedding_label_centroids": f"""
            WITH e AS (
                SELECT label,
                       unnest(embedding) AS v,
                       unnest(generate_series(
                           0, len(embedding) - 1)) AS dim
                FROM embeddings
            )
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(dim AS BIGINT) AS dim,
                   {rel.round_away_tol_sql('avg(v)', 6)} AS centroid
            FROM e GROUP BY label, dim
        """,
        # IVF: spherical-k-means iterations unrolled relationally over
        # exploded (vec_id, dim, value) rows — see sketch_oracles
        "embedding_ivf_topk_cosine": sk.ivf_topk_sql(),
        # recall@k of the IVF index vs brute-force ground truth: both
        # sides are the catalog queries above, re-used verbatim as
        # nested-CTE subqueries; the join counts the overlap
        "ann_recall_eval": (
            "WITH brute AS (\n"
            """
            WITH q AS (
                SELECT embedding AS qe FROM embeddings
                ORDER BY vec_id LIMIT 1
            )
            SELECT vec_id,
                   round(list_cosine_similarity(
                       list_transform(embedding, x -> x::DOUBLE),
                       list_transform((SELECT qe FROM q),
                                      x -> x::DOUBLE)), 5) AS cosine_sim
            FROM embeddings
            ORDER BY cosine_sim DESC, vec_id DESC LIMIT 10
            """
            "\n), ivf AS (\n" + sk.ivf_topk_sql() + "\n)\n"
            "SELECT CAST(10 AS BIGINT) AS k,\n"
            "       (SELECT count(*) FROM brute JOIN ivf USING (vec_id))"
            " AS n_overlap,\n"
            "       round((SELECT CAST(count(*) AS DOUBLE)\n"
            "              FROM brute JOIN ivf USING (vec_id)) / 10, 6)"
            " AS recall"),
        "embedding_near_dup_pairs": sk.embedding_near_dup_sql(
            threshold=0.4),
        "embedding_dup_clusters": f"""
            WITH RECURSIVE vp AS ({sk.embedding_near_dup_sql(
                threshold=0.4)}),
            edges AS (
                SELECT vec_a AS a, vec_b AS b FROM vp
                UNION
                SELECT vec_b, vec_a FROM vp
            ),
            reach(n, m) AS (
                SELECT a, b FROM edges
                UNION
                SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
            ),
            lbl AS (
                SELECT n AS vec_id, min(least(n, m)) AS cluster_id
                FROM reach GROUP BY n
            )
            SELECT l.vec_id, l.cluster_id, cs.cluster_size
            FROM lbl l
            JOIN (SELECT cluster_id, count(*) AS cluster_size
                  FROM lbl GROUP BY cluster_id) cs USING (cluster_id)
        """,
    }
    # the shuffle-join strategy computes the same relation as the
    # broadcast join — one oracle, two physical plans
    out["join_orders_customers_shuffle"] = out["join_orders_customers"]
    return out
