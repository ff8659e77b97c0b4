"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in etl_ray) calls ray.init()/ray.shutdown().

``queries()`` maps SURVEY.md §2 operator families (+ target-added
training-data ops) to Ray Data pipelines over ``sf_dir``;
``oracle_sql()`` holds the DuckDB-equivalent SQL with IDENTICAL output
column names.  Shared determinism rule: float measures aggregate as
integer cents via floor(x*100) (int64 sums are exact; float sums are
summation-order-sensitive across engines).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from etl_ray.pipelines import queries as Q


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: the CDC/LWW upsert
    shape applied to the `events` change log (latest state per user)."""
    return Q.upsert_lww_events("/root/testdata/sf0.001")


# Round-5 rotation of the driver-checked prefix (the correctness driver
# samples the FIRST 50 registry entries): CORRECTNESS_r01..r04 always saw
# the same 50, so 75 registry entries had never had a driver-recorded row.
# This list front-loads the CDC flagship core PLUS ~20 round-4/5 additions
# (fuzzy join, coalesce upserts, zorder-pruned serving read, percent_rank,
# Q3-flavor, distributed PMI, ...) per the round-4 verdict's task 7.  Every
# name here has a full SQL oracle.  Entries NOT listed keep their original
# relative order after the prefix; the registry's key SET is unchanged.
_DRIVER_PREFIX = [
    # CDC / lake flagship core (north-star shapes)
    "cdc_replay_pages", "cdc_replay_pages_delta", "upsert_lww_events",
    "q1_pricing_summary", "cdc_table_diff", "incremental_domain_stats",
    "scd2_history_pages", "scd2_asof_read_pages", "dlq_quarantine_pages",
    # round-5 CHECK constraints + DLQ requeue loop (swapped in for
    # pages_per_domain and canonical_urls, driver-green in r1-r4)
    "constraint_quarantine_pages", "constraint_requeue_pages",
    "cdc_changelog_pages",
    "lake_training_docs", "lake_recent_hosts", "host_index_read",
    "sparse_attr_latest_events",
    # round-5 schema-evolution triple (rename+drop, metadata-only) —
    # swapped in for wal_update_depth (driver-green in the r5 sweep)
    "schema_evolution_pages",
    # round-5 GDPR predicate delete (swapped in for project_cast_lineitem,
    # driver-green in r1-r4)
    "gdpr_delete_pages",
    # relational core sample
    # (join_orders_lineitem_native rotated out — driver-green in r4 —
    # to make room for scd2_asof_read_pages at the fixed prefix size)
    "anti_join_customers_without_orders",
    "semi_join_customers_with_open_orders",
    # text / dedup / similarity sample
    "minhash_pairs_docs", "knn_brute_embeddings",
    "pack_sequences_docs",
    # round-5 session-3: manifest-stats file skipping + metadata-only
    # count — swapped in for dedup_docs_exact / shingle_jaccard_docs,
    # each driver-green in r1-r4
    "scan_prune_recent_pages", "meta_count_recent_pages",
    # round-4/5 additions never driver-checked before
    "fuzzy_pairs_docs", "coalesce_upsert_users", "coalesce_upsert_users_delta",
    "percent_rank_events_by_type", "top_unshipped_orders", "pmi_bigrams_docs",
    "trailing_1h_sum_per_user", "winsorize_values_by_type",
    "topk_frequent_users", "multimodal_decode_real", "charlm_score_docs",
    "dq_violations_orders",
    # round-5 additions (paragraph-level C4 dedup, Gopher gate, BM25,
    # flagship #3 replay->dedup->gate chain, token-id encode, text
    # normalization, near-dup retention, CCNet bucketing, DSIR weights)
    # — swapped in for json_extract_props / sliding_window_events /
    # session_windows_events / left_join_customer_order_counts /
    # hourly_event_stats / revenue_by_segment / full_outer_join_daily
    # _activity / tfidf_docs / decontaminate_docs, each driver-green in
    # r1-r4
    "paragraph_dedup_docs", "gopher_quality_docs", "bm25_docs",
    "lake_clean_corpus", "encode_docs", "normalize_text_docs",
    "neardup_keep_docs", "ccnet_bucket_docs", "dsir_weights_docs",
    # round-5 batch 2 (byte-budget cut, global training shuffle,
    # temperature language mixing, quality-score calibration) — swapped
    # in for asof_join_events_orders / range_join_events_sessions /
    # topk_events_per_user / token_count_docs, each driver-green in
    # r1-r4
    "budget_select_docs", "global_shuffle_docs", "temperature_mix_docs",
    "quality_calibration_docs",
]


def _rotate(reg: dict[str, Callable[[str], Any]]) -> dict[str, Callable[[str], Any]]:
    head = {k: reg[k] for k in _DRIVER_PREFIX}
    assert len(head) == 50, f"driver prefix must be 50 names, got {len(head)}"
    return head | {k: v for k, v in reg.items() if k not in head}


def queries() -> dict[str, Callable[[str], Any]]:
    return _rotate({
        # relational core (reference operator families)
        "q1_pricing_summary": Q.q1_pricing_summary,
        "project_cast_lineitem": Q.project_cast_lineitem,
        "filter_click_events": Q.filter_click_events,
        "anti_join_customers_without_orders": Q.anti_join_customers_without_orders,
        "semi_join_customers_with_open_orders": Q.semi_join_customers_with_open_orders,
        "upsert_lww_events": Q.upsert_lww_events,
        "topk_orders": Q.topk_orders,
        "distinct_segments": Q.distinct_segments,
        "union_distinct_ids": Q.union_distinct_ids,
        "hourly_event_stats": Q.hourly_event_stats,
        "revenue_by_segment": Q.revenue_by_segment,
        "customers_per_region": Q.customers_per_region,
        "json_extract_props": Q.json_extract_props,
        "join_orders_lineitem_native": Q.join_orders_lineitem_native,
        "asof_join_events_orders": Q.asof_join_events_orders,
        "topk_events_per_user": Q.topk_events_per_user,
        "range_join_events_sessions": Q.range_join_events_sessions,
        "embedding_neardup_pairs": Q.embedding_neardup_pairs,
        "sliding_window_events": Q.sliding_window_events,
        "session_windows_events": Q.session_windows_events,
        # text / dedup / similarity (target-added)
        "token_count_docs": Q.token_count_docs,
        "quality_docs": Q.quality_docs,
        "fingerprint_docs": Q.fingerprint_docs,
        "dedup_docs_exact": Q.dedup_docs_exact,
        "shingle_jaccard_docs": Q.shingle_jaccard_docs,
        "dup_clusters_docs": Q.dup_clusters_docs,
        "knn_brute_embeddings": Q.knn_brute_embeddings,
        "training_prep_docs": Q.training_prep_docs,
        "sample_docs_hash": Q.sample_docs_hash,
        "stratified_sample_docs": Q.stratified_sample_docs,
        "train_eval_split_docs": Q.train_eval_split_docs,
        # oracle-checked via fixture-backed SQL (see oracle_sql notes)
        "text_profile_docs": Q.text_profile_docs,
        "knn_lsh_embeddings": Q.knn_lsh_embeddings,
        "knn_ivf_embeddings": Q.knn_ivf_embeddings,
        "multimodal_features": Q.multimodal_features,
        "multimodal_frames": Q.multimodal_frames,
        "cdc_replay_pages": Q.cdc_replay_pages,
        # same final state served through UNFOLDED merge-on-read delta
        # chains (replay(merge_mode="delta"), 3 incremental txs, no
        # compaction) — same SQL oracle as cdc_replay_pages by design
        "cdc_replay_pages_delta": Q.cdc_replay_pages_delta,
        # replay + live metadata-only rename(lang->language) + drop(html)
        # in one lake — value-hash-checked era mapping (round-5 evolution
        # triple through the driver contract)
        "schema_evolution_pages": Q.schema_evolution_pages,
        # replay + GDPR predicate delete (whole-domain takedown) in one
        # manifest tx; footer-stats pruning picks the rewrite set
        "gdpr_delete_pages": Q.gdpr_delete_pages,
        "pages_per_domain": Q.pages_per_domain,
        "cdc_table_diff": Q.cdc_table_diff,
        "incremental_domain_stats": Q.incremental_domain_stats,
        "quantiles_events": Q.quantiles_events,
        # oracle-checked against fixture-carried per-doc signatures (the
        # crc32 basis is not SQL-expressible; plain-python reference
        # signatures are written at fixture build and DuckDB joins them)
        "minhash_pairs_docs": Q.minhash_pairs_docs,
        "simhash_groups_docs": Q.simhash_groups_docs,
        # round-3 batch 2: window analytics, OLAP pivot/rollup, corpus
        # vocabulary / repetition / inverted index
        "user_event_analytics": Q.user_event_analytics,
        "pivot_orders_status": Q.pivot_orders_status,
        "rollup_customers_region_segment": Q.rollup_customers_region_segment,
        "vocab_topk_docs": Q.vocab_topk_docs,
        "repetition_docs": Q.repetition_docs,
        "inverted_index_docs": Q.inverted_index_docs,
        # SCD2 (type-2 history) from the CDC fixture — sf0.01-pinned
        # oracle path like cdc_replay_pages
        "scd2_history_pages": Q.scd2_history_pages,
        # point-in-time temporal read over the SCD2 history (probe
        # bounds from parquet footer stats — metadata-only)
        "scd2_asof_read_pages": Q.scd2_asof_read_pages,
        # PII redaction over a deterministic PII-laced fixture (sf tables
        # carry no PII-shaped content)
        "pii_redact_docs": Q.pii_redact_docs,
        "left_join_customer_order_counts": Q.left_join_customer_order_counts,
        "full_outer_join_daily_activity": Q.full_outer_join_daily_activity,
        # dead-letter queue: malformed events quarantined exactly-once
        # alongside the replay transaction (stages/validate.py)
        "dlq_quarantine_pages": Q.dlq_quarantine_pages,
        "constraint_quarantine_pages": Q.constraint_quarantine_pages,
        "constraint_requeue_pages": Q.constraint_requeue_pages,
        # HLL sketch — non-SQL-expressible (hash-dependent estimate); the
        # error bound / merge laws / determinism are pytest-pinned
        # (tests/test_sketch.py), driver records the rows-only check
        "approx_distinct_events": Q.approx_distinct_events,
        # global ordered prefix-sum (two-phase scan) -> sequence packing
        "pack_sequences_docs": Q.pack_sequences_docs,
        "chunk_docs": Q.chunk_docs,
        "bigram_counts_docs": Q.bigram_counts_docs,
        "decontaminate_docs": Q.decontaminate_docs,
        "grouped_median_orders": Q.grouped_median_orders,
        "sparse_attr_latest_events": Q.sparse_attr_latest_events,
        # flagship integration: CDC replay -> live lake -> gated,
        # exact-deduped training docs in one streaming chain
        "lake_training_docs": Q.lake_training_docs,
        "mixture_exact_k_docs": Q.mixture_exact_k_docs,
        "histogram_events": Q.histogram_events,
        "percentile_gate_docs": Q.percentile_gate_docs,
        "tfidf_docs": Q.tfidf_docs,
        # column-level partial-image upserts (coalesce merge) — round 4
        "coalesce_upsert_users": Q.coalesce_upsert_users,
        # same merge in merge-on-read delta mode (chains left unfolded;
        # the read path folds base ∪ chain) — same SQL oracle by design
        "coalesce_upsert_users_delta": Q.coalesce_upsert_users_delta,
        # round-4 sampling / extraction / trace / robust-stats additions
        "weighted_sample_docs": Q.weighted_sample_docs,
        # A-ES race key is a float (libm log): pinned by a
        # same-arithmetic differential pytest, not a SQL oracle
        "weighted_topk_docs": Q.weighted_topk_docs,
        "regex_extract_docs": Q.regex_extract_docs,
        "journey_concat_users": Q.journey_concat_users,
        "mad_outliers_events": Q.mad_outliers_events,
        # real (pure-stdlib) PNG/WAV decode roundtrips vs fixture-carried
        # pre-encode truth
        "multimodal_decode_real": Q.multimodal_decode_real,
        "multimodal_audio_real": Q.multimodal_audio_real,
        # webtext hygiene: URL canonicalization + windowed first-seen
        "canonical_urls": Q.canonical_urls,
        "first_event_per_user_hour": Q.first_event_per_user_hour,
        # steady-state ingest dedup: arrivals vs corpus, then arrivals
        "incremental_dedup_docs": Q.incremental_dedup_docs,
        # mergeable quantile summary (rank bound pytest-pinned like the
        # HLL sketch; estimates are summary-dependent, no SQL oracle)
        "approx_quantiles_events": Q.approx_quantiles_events,
        # per-doc duplicated-8-gram ratio (corpus-internal duplication)
        "dup_span_profile_docs": Q.dup_span_profile_docs,
        # per-group exact quantiles at key cardinality
        "grouped_quantiles_users": Q.grouped_quantiles_users,
        # ECDF / rank normalization (bounded-domain broadcast transform)
        "ecdf_normalize_docs": Q.ecdf_normalize_docs,
        # per-group mode (deterministic tie-break, vectorized argmax)
        "user_event_mode": Q.user_event_mode,
        # wide -> long reshape (feature-store ingest format)
        "unpivot_order_metrics": Q.unpivot_order_metrics,
        # per-column profiling (null counts, min/max) in one pass
        "profile_documents": Q.profile_documents,
        # ROWS-frame rolling aggregate (bounded lookback per key)
        "rolling_sum_events": Q.rolling_sum_events,
        # time-series gap fill (dense per-user day grid, zero-filled)
        "gapfill_daily_user_counts": Q.gapfill_daily_user_counts,
        # ordered funnel pattern over per-user journeys
        "funnel_users_events": Q.funnel_users_events,
        # temporal dedup with tolerance (per-user debounce via lag)
        "debounce_events": Q.debounce_events,
        # exact weighted mean (integer accumulators, one IEEE divide)
        "weighted_avg_value_by_type": Q.weighted_avg_value_by_type,
        # exact grouped Pearson correlation (int moment partials)
        "corr_qty_price_by_retflag": Q.corr_qty_price_by_retflag,
        # Markov transition matrix over per-user ordered sequences
        "event_transition_counts": Q.event_transition_counts,
        # cohort retention triangle (first-seen week x week offset)
        "cohort_retention_events": Q.cohort_retention_events,
        # dense_rank<=3 with ties, sort-free (distinct-threshold pass)
        "dense_topk_orders_per_priority": Q.dense_topk_orders_per_priority,
        # LOCF forward-fill over dense per-user day grids
        "locf_daily_user_values": Q.locf_daily_user_values,
        # star-schema rollup (3-hop dim chain pre-joined, broadcast)
        "revenue_by_region_star": Q.revenue_by_region_star,
        # inter-arrival gap quantiles per event type (lag + exact quantiles)
        "interarrival_quantiles_by_type": Q.interarrival_quantiles_by_type,
        # week-over-week count deltas per type (lag over a tiny aggregate)
        "wow_event_counts": Q.wow_event_counts,
        # exact grouped COUNT(DISTINCT) — the exact twin of the HLL sketch
        "distinct_users_per_type": Q.distinct_users_per_type,
        # per-row NTILE(4) equal-frequency binning within each type
        "ntile_events_by_type": Q.ntile_events_by_type,
        # EXACT top-k frequent items, sketch-certified two-pass (no
        # all-to-all key shuffle; falls back to groupby if uncertified)
        "topk_frequent_users": Q.topk_frequent_users,
        # Debezium-style change records (before+after images) produced
        # FROM lake snapshots — the reverse of the ingest direction
        "cdc_changelog_pages": Q.cdc_changelog_pages,
        # Levenshtein<=1 fuzzy-key self-join via SymSpell deletion
        # neighborhoods (lossless blocking; oracle is the quadratic join)
        "fuzzy_pairs_docs": Q.fuzzy_pairs_docs,
        # behavioral-diversity profile: Shannon entropy per user
        "entropy_event_types_per_user": Q.entropy_event_types_per_user,
        # grouped geometric mean via log-sum partials
        "geomean_value_by_type": Q.geomean_value_by_type,
        # chi-square contingency profile (type x day-part)
        "chisq_type_by_daypart": Q.chisq_type_by_daypart,
        # time-RANGE windowed aggregate (peer-inclusive 1h trailing sum)
        "trailing_1h_sum_per_user": Q.trailing_1h_sum_per_user,
        # per-group winsorization (grouped exact quantile bounds + clip)
        "winsorize_values_by_type": Q.winsorize_values_by_type,
        # co-occurrence matrix over a bounded vocabulary (bitmask masks,
        # no pair join of user rows)
        "type_cooccurrence_users": Q.type_cooccurrence_users,
        # interpolated exact quantiles (quantile_cont twin)
        "quantiles_cont_events": Q.quantiles_cont_events,
        # user growth curve (first-seen rollup + running total)
        "cumulative_new_users_daily": Q.cumulative_new_users_daily,
        # star-schema fact->dim broadcasts over the PART / SUPPLIER dims
        "brand_revenue_topk": Q.brand_revenue_topk,
        "supplier_nation_volume": Q.supplier_nation_volume,
        # ratio-to-report (share of total) on the tiny aggregate
        "orders_priority_share": Q.orders_priority_share,
        # flagship chain #2: replay -> zorder -> predicate-pruned read
        # -> host rollup (proves the rewrite under a predicate read)
        "lake_recent_hosts": Q.lake_recent_hosts,
        # manifest-stats file-skipping scan: filters= tuple API prunes
        # whole partitions from writer-recorded column stats (zero
        # footer reads) before row-group pushdown (state/partstats.py)
        "scan_prune_recent_pages": Q.scan_prune_recent_pages,
        # metadata-only counting: manifest stats decide all-match /
        # none-match partitions, only boundary partitions scanned
        "meta_count_recent_pages": Q.meta_count_recent_pages,
        # train-then-score char-bigram LM quality filter (CCNet shape)
        "charlm_score_docs": Q.charlm_score_docs,
        # distributed PCA (moment partials -> driver eigh -> broadcast
        # projection) — rows-only: an eigenbasis is not SQL-expressible;
        # laws pinned by tests/test_pca.py differential
        "pca_project_embeddings": Q.pca_project_embeddings,
        # secondary-index serving: read only the partitions the
        # CDC-maintained host index names
        "host_index_read": Q.host_index_read,
        # percent_rank() per group (ordered row numbers + sizes)
        "percent_rank_events_by_type": Q.percent_rank_events_by_type,
        # collocation mining: count-gated PMI over corpus bigrams
        "pmi_bigrams_docs": Q.pmi_bigrams_docs,
        # 2-D binned activity profile (bounded 7x24 cells)
        "dow_hour_heatmap_events": Q.dow_hour_heatmap_events,
        # CDC churn profile: events-per-key depth histogram over the WAL
        "wal_update_depth": Q.wal_update_depth,
        # TPC-H Q3 flavor: dim filter broadcast + native join + topk
        "top_unshipped_orders": Q.top_unshipped_orders,
        # data-quality rule scan (vectorized masks, partial counts)
        "dq_violations_orders": Q.dq_violations_orders,
        # C4-style paragraph-level exact dedup + document reassembly
        "paragraph_dedup_docs": Q.paragraph_dedup_docs,
        # Gopher-rule quality gate (integer-exact mean-length band)
        "gopher_quality_docs": Q.gopher_quality_docs,
        # BM25 retrieval scoring (two-pass tf/df + corpus scalars)
        "bm25_docs": Q.bm25_docs,
        # flagship #3: replay -> lake -> line-paragraph dedup -> Gopher gate
        "lake_clean_corpus": Q.lake_clean_corpus,
        # token-id encoding (gated vocab broadcast, index_in hash probe)
        "encode_docs": Q.encode_docs,
        # Unicode NFC + lower + whitespace-collapse normalization
        "normalize_text_docs": Q.normalize_text_docs,
        # near-dup RETENTION: clusters -> keep min-id representative
        "neardup_keep_docs": Q.neardup_keep_docs,
        # CCNet-style perplexity head/middle/tail bucketing
        "ccnet_bucket_docs": Q.ccnet_bucket_docs,
        # DSIR hashed-ngram importance weights (target=en vs raw corpus)
        "dsir_weights_docs": Q.dsir_weights_docs,
        # quality-ordered byte-budget selection (distributed prefix scan)
        "budget_select_docs": Q.budget_select_docs,
        # deterministic global training shuffle: hash order -> position/shard
        "global_shuffle_docs": Q.global_shuffle_docs,
        # temperature (tau=0.7) per-language rebalancing sample
        "temperature_mix_docs": Q.temperature_mix_docs,
        # decile calibration table of the charlm quality score vs lang=en
        "quality_calibration_docs": Q.quality_calibration_docs,
        # distributed BPE tokenizer training (iterative; pytest-pinned)
        "bpe_merges_docs": Q.bpe_merges_docs,
        # encode under the trained merges: per-doc piece counts
        "bpe_encode_docs": Q.bpe_encode_docs,
        # C4-style blocklist filter (drop docs containing banned tokens)
        "badwords_filter_docs": Q.badwords_filter_docs,
        # domain-reputation gate: keep sources with >=corpus-average length
        "domain_gate_docs": Q.domain_gate_docs,
        # integer-exact PageRank (3 iterations) on the user<->props.k graph
        "pagerank_user_props": Q.pagerank_user_props,
        # CUBE(status, priority): all four grouping sets, one corpus shuffle
        "cube_orders_status_priority": Q.cube_orders_status_priority,
        # per-group HLL distinct users (estimate; 5-sigma pytest-pinned)
        "approx_distinct_users_per_type": Q.approx_distinct_users_per_type,
        # per-group mergeable quantile summaries (estimate; rank-bound pinned)
        "approx_quantiles_values_per_type": Q.approx_quantiles_values_per_type,
        # FLAGSHIP #4: blocklist -> domain gate -> temperature mix ->
        # LM-quality byte-budget cut, stats re-derived per surviving stage
        "curation_pipeline_docs": Q.curation_pipeline_docs,
        # grouped OLS regression (regr_slope/intercept/r2) from exact
        # integer moments
        "regr_price_on_qty_by_retflag": Q.regr_price_on_qty_by_retflag,
        # grouped skewness + excess kurtosis from exact integer raw moments
        "skew_kurtosis_quantity_by_retflag": Q.skew_kurtosis_quantity_by_retflag,
        # Gini coefficient of per-user spend via the distributed rank scan
        "gini_user_spend": Q.gini_user_spend,
        # per-group Gini via bucketed window ranks
        "gini_spend_by_type": Q.gini_spend_by_type,
        # Mann-Whitney rank-sum / U via the distributed global rank scan
        "mannwhitney_click_vs_purchase": Q.mannwhitney_click_vs_purchase,
        # Theil-T inequality index (rank-free, integer micro-nat terms)
        "theil_index_user_spend": Q.theil_index_user_spend,
    })


def oracle_sql() -> dict[str, str]:
    # Several oracles read fixture parquet from /tmp; materialize those
    # fixtures NOW (cheap, cached, no Ray needed) so the SQL is runnable
    # regardless of whether the driver executes the query or the oracle
    # first.
    #
    # CONTRACT: fixture-backed oracle SQL strings (cdc_replay_pages,
    # minhash_pairs_docs, simhash_groups_docs, multimodal_*) hardcode the
    # sf0.01 fixture paths because SQL is static while queries() scale
    # with sf_dir — the driver's correctness harness compares at sf0.01
    # only.  Run those queries at another sf via queries() directly; their
    # SQL here would compare against the wrong fixture.
    Q._media_fixture_path()
    real_media = Q._real_media_fixture_path()
    messy_urls = Q._messy_urls_fixture()
    Q._pii_fixture_path()
    Q._cdc_fixture(*Q._CDC_SIZES["sf0.01"])
    dlq_root = Q._dlq_fixture()
    constraint_root = Q._constraint_fixture()
    partial_root = Q._partial_wal_fixture()
    truth = Q._dedup_truth_fixture("/root/testdata/sf0.01")
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "project_cast_lineitem": """
            SELECT l_orderkey AS order_key,
                   CAST(l_linenumber AS BIGINT) AS line_number,
                   l_quantity AS quantity,
                   CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS revenue_cents,
                   CAST(extract(year FROM l_shipdate) AS BIGINT) AS ship_year
            FROM lineitem
        """,
        "filter_click_events": """
            SELECT event_id, user_id, value FROM events
            WHERE event_type = 'click' AND value > 100.0
        """,
        "anti_join_customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders
                WHERE o_orderdate < TIMESTAMP '1996-01-01')
        """,
        "semi_join_customers_with_open_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        """,
        "upsert_lww_events": """
            SELECT user_id, ts, event_type, value FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) WHERE rn = 1
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
        """,
        "distinct_segments": """
            SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment
        """,
        "union_distinct_ids": """
            SELECT DISTINCT id FROM (
                SELECT CAST(user_id AS BIGINT) AS id FROM events
                UNION ALL
                SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
            ) ORDER BY id
        """,
        "hourly_event_stats": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
            FROM events GROUP BY 1, 2
        """,
        "revenue_by_segment": """
            SELECT c_mktsegment,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "customers_per_region": """
            SELECT r_name, count(*) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "json_extract_props": """
            SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "join_orders_lineitem_native": """
            SELECT o_orderpriority,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   count(*) AS n_lineitems
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY o_orderpriority
        """,
        # interval self-join: the same user's events in the 2 days up to
        # each event, inclusive both ends (engine offsets are
        # microseconds; BETWEEN is inclusive); self-pairs included
        "range_join_events_sessions": """
            SELECT e.event_id, e.ts, e.user_id,
                   p.ts AS prior_ts, p.event_id AS prior_event_id
            FROM events e
            JOIN events p
              ON p.user_id = e.user_id
             AND p.ts BETWEEN e.ts - INTERVAL 2 DAY AND e.ts
        """,
        "topk_events_per_user": """
            SELECT event_id, user_id, value, rk FROM (
              SELECT event_id, user_id, value,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY value DESC, event_id DESC
                     ) AS rk
              FROM events
            ) WHERE rk <= 3
        """,
        # backward as-of join: per event, the user's latest order at or
        # before the event time; date ties break to the max o_orderkey —
        # same deterministic rule as stages/asof.py
        "asof_join_events_orders": """
            WITH j AS (
              SELECT e.event_id, e.ts, e.user_id, o.o_orderkey, o.o_totalprice,
                     row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                     ) AS rn
              FROM events e
              JOIN orders o
                ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            )
            SELECT event_id, ts, user_id, o_orderkey, o_totalprice
            FROM j WHERE rn = 1
        """,
        "embedding_neardup_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b
              ON a.vec_id < b.vec_id
            WHERE a.vec_id < 1000 AND b.vec_id < 1000
              AND list_cosine_similarity(a.embedding, b.embedding) >= 0.42
        """,
        "sliding_window_events": """
            WITH w AS (
                SELECT date_trunc('hour', ts) AS window_start, event_type,
                       CAST(floor(value * 100) AS BIGINT) AS value_cents FROM events
                UNION ALL
                SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type,
                       CAST(floor(value * 100) AS BIGINT) FROM events
            )
            SELECT window_start, event_type, count(*) AS n_events,
                   CAST(sum(value_cents) AS BIGINT) AS sum_value_cents
            FROM w GROUP BY 1, 2
        """,
        "session_windows_events": """
            WITH g AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN epoch(ts - lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
                SELECT user_id, ts, event_id,
                       sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                              ROWS UNBOUNDED PRECEDING) AS sid
                FROM g
            )
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "token_count_docs": r"""
            SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "quality_docs": r"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_counted,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
                   CAST(len(regexp_extract_all(text, '[!-/:-@\[-`{-~]')) AS BIGINT) AS n_punct,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
                     / greatest(length(text), 1) AS alpha_ratio
            FROM documents
        """,
        "fingerprint_docs": """
            SELECT doc_id,
                   md5(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)))) AS fp_md5
            FROM documents
        """,
        "dedup_docs_exact": """
            SELECT min(doc_id) AS doc_id FROM documents
            GROUP BY md5(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))))
        """,
        "shingle_jaccard_docs": f"""
            WITH {_SHINGLE_CTES}
            SELECT id_a, id_b, inter,
                   sa.n AS n_a, sb.n AS n_b,
                   CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
        """,
        # transitive closure over the same pair predicate: recursive CTE
        # reachability, cluster id = min reachable doc id
        "dup_clusters_docs": f"""
            WITH RECURSIVE {_SHINGLE_CTES},
            pairs AS (
              SELECT id_a, id_b
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
            ),
            e AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs
            ),
            reach(n, m) AS (
              SELECT a, a FROM e
              UNION
              SELECT reach.n, e.b FROM reach JOIN e ON reach.m = e.a
            )
            SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n
        """,
        "knn_brute_embeddings": _KNN_EXACT_SQL,
        # composite training-data prep: quality gate -> exact dedup -> tokens
        "training_prep_docs": r"""
            WITH scored AS (
              SELECT doc_id, text,
                     CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
                     CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
                       / greatest(length(text), 1) AS alpha_ratio
              FROM documents
            ),
            gated AS (
              SELECT doc_id, text, n_tokens FROM scored
              WHERE alpha_ratio >= 0.5 AND n_tokens >= 10
            ),
            winners AS (
              SELECT min(doc_id) AS doc_id FROM gated
              GROUP BY md5(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))))
            )
            SELECT g.doc_id, g.n_tokens FROM gated g JOIN winners USING (doc_id)
        """,
        # deterministic hash sampling: the engine's keep predicate is
        # md5(salt || key)[:8] < threshold_hex (stages/sampling.py);
        # fixed-width lowercase-hex string compare == numeric compare, so
        # the SAME predicate runs verbatim in SQL.  0.25 -> 0x40000000.
        "sample_docs_hash": """
            SELECT doc_id, lang, source FROM documents
            WHERE substr(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'
        """,
        # per-stratum thresholds: en 0.125 -> 0x20000000, zh/de 1.0 (the
        # 9-char 'ffffffff~' sorts above every 8-hex digest = keep all),
        # default 0.5 -> 0x80000000
        "stratified_sample_docs": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE substr(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 8) <
                  CASE lang
                    WHEN 'en' THEN '20000000'
                    WHEN 'zh' THEN 'ffffffff~'
                    WHEN 'de' THEN 'ffffffff~'
                    ELSE '80000000'
                  END
        """,
        # the split is a partition of the corpus: one row per document,
        # labeled by the same signed predicate (eval_rate 0.2 -> 0x33333333)
        "train_eval_split_docs": """
            SELECT doc_id, lang,
                   CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                             < '33333333'
                        THEN 'eval' ELSE 'train' END AS split
            FROM documents
        """,
        # full-probe LSH (probe_radius == bits) and full-scan IVF
        # (nprobe == n_lists) are exactly brute force: the bucket/cell
        # shuffle partitions the corpus, so the per-query top-k merge is
        # lossless.  Partial-probe recall is pinned by pytest instead.
        "knn_lsh_embeddings": _KNN_EXACT_SQL,
        "knn_ivf_embeddings": _KNN_EXACT_SQL,
        # fake decode = (64 + md5[0], 64 + md5[1], 3); this DuckDB has no
        # BLOB md5, so the fixture carries the hex digest (computed at
        # fixture build time, independent of the engine's per-batch hash)
        "multimodal_features": """
            WITH m AS (
              SELECT media_id,
                     strpos('0123456789abcdef', substr(payload_md5, 1, 1)) - 1 AS h1,
                     strpos('0123456789abcdef', substr(payload_md5, 2, 1)) - 1 AS h2,
                     strpos('0123456789abcdef', substr(payload_md5, 3, 1)) - 1 AS h3,
                     strpos('0123456789abcdef', substr(payload_md5, 4, 1)) - 1 AS h4
              FROM read_parquet('/tmp/etlray_media_256.parquet')
            )
            SELECT media_id,
                   CAST(64 + 16 * h1 + h2 AS INTEGER) AS dec_height,
                   CAST(64 + 16 * h3 + h4 AS INTEGER) AS dec_width,
                   CAST(3 AS INTEGER) AS dec_channels
            FROM m
        """,
        # frame sampling is pure byte arithmetic over the payload size
        "multimodal_frames": """
            WITH m AS (
              SELECT media_id, octet_length(payload) AS size
              FROM read_parquet('/tmp/etlray_media_256.parquet')
            )
            SELECT media_id, i AS frame_idx,
                   i * greatest(size // 4, 1) AS "offset",
                   least(greatest(size // 4, 1), size - i * greatest(size // 4, 1)) AS length
            FROM m, (SELECT unnest(range(4)) AS i)
            WHERE i < least(4, size)
        """,
        # replay semantics as SQL: LWW by (warc_ts DESC, lsn DESC) per url,
        # latest-delete wins, v0-segment rows carry NULL lang (additive
        # schema evolution).  The flattened event table (incl. per-event
        # extracted text — regex+entity unescape, not SQL-expressible) is
        # written next to the generated fixture; path is the sf0.01 shape
        # the driver compares at.
        # exact quantiles, "lower" interpolation at floor(q*(n-1)) —
        # row_number predicate mirrors stages/quantiles.py's position rule
        "quantiles_events": """
            WITH r AS (
              SELECT value AS v, row_number() OVER (ORDER BY value) AS rn
              FROM events WHERE value IS NOT NULL
            ),
            n AS (SELECT count(*) AS c FROM r)
            SELECT CAST(q AS DOUBLE) AS q, r.v AS value
            FROM (VALUES (0.25), (0.50), (0.90), (0.99)) AS qs(q)
            CROSS JOIN n
            JOIN r ON r.rn = CAST(floor(q * (c - 1)) AS BIGINT) + 1
            ORDER BY q
        """,
        # reverse CDC between bootstrap and head: LWW winner state vs the
        # base table, classified insert/update/delete (winner lsn > 0 <=>
        # an event produced the live row; mirrors pipelines/diff.py)
        "cdc_table_diff": """
            WITH w AS (
              SELECT url, warc_ts, lsn, op,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            ),
            win AS (SELECT url, warc_ts, lsn, op FROM w WHERE rn = 1),
            b AS (
              SELECT url, warc_ts
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/base/pages.parquet')
            )
            SELECT 'insert' AS op, win.url, win.warc_ts
            FROM win LEFT JOIN b USING (url)
            WHERE b.url IS NULL AND win.op <> 'delete'
            UNION ALL
            SELECT 'delete' AS op, b.url, b.warc_ts
            FROM b JOIN win USING (url) WHERE win.op = 'delete'
            UNION ALL
            SELECT 'update' AS op, win.url, win.warc_ts
            FROM win JOIN b USING (url)
            WHERE win.op <> 'delete' AND win.lsn > 0
        """,
        # full recompute at head of the per-host rollup the engine
        # maintains INCREMENTALLY (build at half-replay + delta refresh);
        # equality proves the retraction algebra in pipelines/views.py
        "incremental_domain_stats": """
            WITH w AS (
              SELECT url, text, op,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            ),
            live AS (SELECT url, text FROM w WHERE rn = 1 AND op <> 'delete')
            SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
                   count(*) AS n_pages,
                   CAST(sum(length(text)) AS BIGINT) AS text_chars
            FROM live
            GROUP BY 1
        """,
        # top hosts by live page count over the same LWW-replayed state
        # (host regex mirrors stages/urlops._URL_RE's host group)
        "pages_per_domain": """
            WITH w AS (
              SELECT url, op,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            ),
            live AS (SELECT url FROM w WHERE rn = 1 AND op <> 'delete')
            SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS domain,
                   count(*) AS n_pages
            FROM live
            GROUP BY 1
            ORDER BY n_pages DESC, domain ASC
            LIMIT 10
        """,
        "cdc_replay_pages": """
            WITH w AS (
              SELECT url, warc_ts, lsn, op, text, lang,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            )
            SELECT url, warc_ts, text, lang FROM w WHERE rn = 1 AND op <> 'delete'
        """,
        # merge-on-read replay serves the IDENTICAL final state, so the
        # oracle is the same LWW window query (delta chains are a storage
        # layout, never a semantic)
        "cdc_replay_pages_delta": """
            WITH w AS (
              SELECT url, warc_ts, lsn, op, text, lang,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            )
            SELECT url, warc_ts, text, lang FROM w WHERE rn = 1 AND op <> 'delete'
        """,
        # same LWW window as cdc_replay_pages; the metadata-only
        # rename is an alias and the drop a column exclusion — if the
        # engine's era mapping misread any stored bytes the value hash
        # would diverge
        "schema_evolution_pages": """
            WITH w AS (
              SELECT url, warc_ts, lsn, op, text, lang,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            )
            SELECT url, warc_ts, text, lang AS language
            FROM w WHERE rn = 1 AND op <> 'delete'
        """,
        # same LWW window with the takedown as a NOT LIKE filter: the
        # engine's delete_where must remove exactly the predicate rows
        "gdpr_delete_pages": """
            WITH w AS (
              SELECT url, warc_ts, lsn, op, text, lang,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            )
            SELECT url, warc_ts, text, lang FROM w
            WHERE rn = 1 AND op <> 'delete'
              AND url NOT LIKE 'https://d1.example.%'
        """,
        # LSH candidate pairs verified by signature agreement, reproduced
        # from the fixture-carried reference signatures: candidates = docs
        # sharing a band hash (bucket cap 64, matching max_bucket), est
        # Jaccard = agreeing components / 64, kept at >= 0.6 (same IEEE
        # double compare as the engine's numpy mean)
        "minhash_pairs_docs": f"""
            WITH bands AS (
              SELECT doc_id, band_hash
              FROM read_parquet('{truth}/minhash_bands.parquet')
            ),
            sigs AS (
              SELECT doc_id, sig FROM read_parquet('{truth}/minhash_sigs.parquet')
            ),
            ok AS (
              SELECT band_hash FROM bands GROUP BY band_hash HAVING count(*) <= 64
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a
              JOIN bands b USING (band_hash)
              JOIN ok USING (band_hash)
              WHERE a.doc_id < b.doc_id
            ),
            scored AS (
              SELECT id_a, id_b,
                     CAST(len(list_filter(range(1, 65),
                                          i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 64
                       AS est_jaccard
              FROM cand
              JOIN sigs sa ON sa.doc_id = cand.id_a
              JOIN sigs sb ON sb.doc_id = cand.id_b
            )
            SELECT id_a, id_b, est_jaccard FROM scored WHERE est_jaccard >= 0.6
        """,
        # exact-simhash duplicate groups over the fixture-carried reference
        # simhash values (query() projects the group key + size)
        "simhash_groups_docs": f"""
            SELECT simhash, count(*) AS n
            FROM read_parquet('{truth}/simhash.parquet')
            GROUP BY simhash HAVING count(*) >= 2
        """,
        "text_profile_docs": r"""
            WITH base AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z'']+') AS ws_en,
                     regexp_extract_all(lower(text), '[a-zà-ÿäöüß'']+') AS ws_l
              FROM documents
            ),
            scores AS (
              SELECT doc_id, ws_en,
                len(list_filter(ws_l, w -> list_contains(['der','die','und','das','in','von','zu','den','mit','ist'], w))) AS s_de,
                len(list_filter(ws_l, w -> list_contains(['the','and','of','to','a','in','is','that','it','for'], w))) AS s_en,
                len(list_filter(ws_l, w -> list_contains(['de','la','que','el','en','y','los','del','se','las'], w))) AS s_es,
                len(list_filter(ws_l, w -> list_contains(['de','la','le','et','les','des','en','un','du','une'], w))) AS s_fr,
                len(list_filter(ws_l, w -> list_contains(['de','que','e','o','a','do','da','em','um','para'], w))) AS s_pt
              FROM base
            )
            SELECT doc_id,
              CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_pt) = 0 THEN 'und'
                   WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_pt) THEN 'de'
                   WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_pt) THEN 'en'
                   WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_pt) THEN 'es'
                   WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_pt) THEN 'fr'
                   ELSE 'pt' END AS lang_pred,
              CASE WHEN len(ws_en) = 0 THEN 0.0
                   ELSE CAST(len(list_filter(ws_en, w -> list_contains(['the','and','of','to','a','in','is','that','it','for'], w))) AS DOUBLE) / len(ws_en)
              END AS stop_ratio_en
            FROM scores
        """,
        # round-3 batch 2 ------------------------------------------------
        "user_event_analytics": """
            SELECT event_id, user_id,
                   row_number() OVER w AS rn,
                   CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS gap_us,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value_cents
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "pivot_orders_status": """
            SELECT c_mktsegment,
                   count(*) FILTER (o_orderstatus = 'O') AS n_open,
                   count(*) FILTER (o_orderstatus = 'F') AS n_filled,
                   count(*) FILTER (o_orderstatus = 'P') AS n_partial,
                   CAST(coalesce(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                        FILTER (o_orderstatus = 'O'), 0) AS BIGINT) AS open_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "rollup_customers_region_segment": """
            SELECT r_name, c_mktsegment, count(*) AS n_customers,
                   CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                       AS acctbal_cents
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP(r_name, c_mktsegment)
        """,
        "vocab_topk_docs": r"""
            WITH toks AS (
              SELECT unnest(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS token
              FROM documents)
            SELECT token, count(*) AS n FROM toks
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 50
        """,
        "repetition_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS token
              FROM documents),
            cnt AS (SELECT doc_id, token, count(*) AS c FROM toks
                    GROUP BY doc_id, token)
            SELECT d.doc_id,
                   CAST(coalesce(sum(c), 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(max(c), 0) AS BIGINT) AS top_token_n,
                   CAST(count(cnt.doc_id) AS BIGINT) AS n_distinct
            FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.doc_id
            GROUP BY d.doc_id
        """,
        "inverted_index_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS token
              FROM documents)
            SELECT DISTINCT token, doc_id FROM toks
        """,
        # SCD2: every non-delete event is a version; the NEXT event (any
        # op, deletes included) closes its validity window
        "scd2_history_pages": """
            WITH ev AS (
              SELECT url, warc_ts, lsn, op, lang,
                     lead(warc_ts) OVER (
                       PARTITION BY url ORDER BY warc_ts, lsn) AS valid_to
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            )
            SELECT url, warc_ts AS valid_from, valid_to, lsn, lang,
                   valid_to IS NULL AS is_current
            FROM ev WHERE op <> 'delete'
        """,
        # point-in-time read: live version per url at the three event-
        # time-span quartile probes; window containment with null
        # valid_to = open.  Probe arithmetic is integer µs on both sides
        # ((t1-t0)*k//4) so the timestamps match exactly.
        "scd2_asof_read_pages": """
            WITH ev AS (
              SELECT url, warc_ts, lsn, op, lang,
                     lead(warc_ts) OVER (
                       PARTITION BY url ORDER BY warc_ts, lsn) AS valid_to
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            ),
            hist AS (
              SELECT url, warc_ts AS valid_from, valid_to, lsn, lang
              FROM ev WHERE op <> 'delete'
            ),
            b AS (
              SELECT epoch_us(min(warc_ts)) AS t0,
                     epoch_us(max(warc_ts)) AS t1
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            ),
            probes AS (
              SELECT CAST(k AS BIGINT) AS probe_q,
                     make_timestamp(t0 + (t1 - t0) * k // 4) AS probe_ts
              FROM b, (VALUES (1), (2), (3)) v(k)
            )
            SELECT probe_q, probe_ts, url, lsn, lang
            FROM probes JOIN hist
              ON valid_from <= probe_ts
             AND (valid_to IS NULL OR valid_to > probe_ts)
        """,
        # redaction order mirrors the engine (emails first, then phones
        # over the email-redacted text); ASCII-only patterns so Python re
        # and RE2 agree byte-for-byte
        "pii_redact_docs": r"""
            WITH em AS (
              SELECT doc_id, text,
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS text_em
              FROM read_parquet('/tmp/etlray_pii_400.parquet')
            )
            SELECT doc_id,
                   regexp_replace(text_em,
                     '\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}',
                     '<PHONE>', 'g') AS text_redacted,
                   CAST(len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                     AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(text_em,
                     '\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}'))
                     AS BIGINT) AS n_phones
            FROM em
        """,
        "left_join_customer_order_counts": """
            SELECT c_custkey, c_name,
                   CAST(count(o_orderkey) AS BIGINT) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey, c_name
        """,
        "dlq_quarantine_pages": f"""
            SELECT lsn,
                   CASE WHEN url IS NULL THEN 'null_key'
                        WHEN warc_ts IS NULL THEN 'null_ts'
                        WHEN op IS NULL
                             OR op NOT IN ('insert','update','delete')
                             THEN 'bad_op'
                   END AS reason
            FROM read_parquet('{dlq_root}/wal/segment-dirty-00001.parquet')
            WHERE url IS NULL OR warc_ts IS NULL
               OR op IS NULL OR op NOT IN ('insert','update','delete')
        """,
        # manifest CHECK constraints: built-in reasons first, then
        # constraints in name order; nulls pass except notnull; deletes
        # exempt — the SQL statement of stages/validate.constraint_reasons
        "constraint_quarantine_pages": f"""
            SELECT lsn, reason FROM (
              SELECT lsn,
                     CASE WHEN url IS NULL THEN 'null_key'
                          WHEN warc_ts IS NULL THEN 'null_ts'
                          WHEN op IS NULL
                               OR op NOT IN ('insert','update','delete')
                               THEN 'bad_op'
                          WHEN op <> 'delete' AND html IS NULL
                               THEN 'constraint:html_present'
                          WHEN op <> 'delete' AND lang IS NOT NULL
                               AND lang NOT IN ('en','pt','de','es','fr','ja')
                               THEN 'constraint:lang_known'
                          WHEN op <> 'delete' AND url NOT LIKE 'https://%'
                               THEN 'constraint:url_https'
                     END AS reason
              FROM read_parquet('{constraint_root}/wal/segment-mixed-00001.parquet')
            ) WHERE reason IS NOT NULL
        """,
        # the quarantine loop's end-state: after drop + requeue the table
        # is the plain LWW window over every structurally-valid event
        "constraint_requeue_pages": f"""
            WITH ev AS (
              SELECT url, warc_ts, lsn, op, lang
              FROM read_parquet('{constraint_root}/wal/segment-mixed-00001.parquet')
              WHERE url IS NOT NULL AND warc_ts IS NOT NULL
                AND op IN ('insert','update','delete')
            ),
            w AS (
              SELECT url, warc_ts, lang, op,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC
                     ) AS rn
              FROM ev
            )
            SELECT url, warc_ts, lang FROM w WHERE rn = 1 AND op <> 'delete'
        """,
        "histogram_events": """
            SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY bin
        """,
        # per-column arg_max after the key's last delete — the SQL
        # statement of the coalesce (partial-image) merge contract
        "coalesce_upsert_users": f"""
            WITH ev AS (
              SELECT *, CAST(epoch_us(ts) AS HUGEINT) * 1000000 + lsn AS p
              FROM read_parquet('{partial_root}/wal/*.parquet')
            ),
            d AS (
              SELECT user_id,
                     coalesce(max(p) FILTER (op = 'delete'),
                              CAST(-1 AS HUGEINT)) AS dp
              FROM ev GROUP BY user_id
            ),
            u AS (
              SELECT e.user_id,
                     arg_max(e.ts, e.p) FILTER (
                       e.op <> 'delete' AND e.p > d.dp) AS ts,
                     arg_max(e.email, e.p) FILTER (e.op <> 'delete'
                       AND e.p > d.dp AND e.email IS NOT NULL) AS email,
                     arg_max(e.city, e.p) FILTER (e.op <> 'delete'
                       AND e.p > d.dp AND e.city IS NOT NULL) AS city,
                     arg_max(e.score, e.p) FILTER (e.op <> 'delete'
                       AND e.p > d.dp AND e.score IS NOT NULL) AS score,
                     count(*) FILTER (
                       e.op <> 'delete' AND e.p > d.dp) AS n_up
              FROM ev e JOIN d USING (user_id)
              GROUP BY e.user_id
            )
            SELECT user_id, ts, email, city, score
            FROM u WHERE n_up > 0
        """,
"coalesce_upsert_users_delta": f"""
            WITH ev AS (
              SELECT *, CAST(epoch_us(ts) AS HUGEINT) * 1000000 + lsn AS p
              FROM read_parquet('{partial_root}/wal/*.parquet')
            ),
            d AS (
              SELECT user_id,
                     coalesce(max(p) FILTER (op = 'delete'),
                              CAST(-1 AS HUGEINT)) AS dp
              FROM ev GROUP BY user_id
            ),
            u AS (
              SELECT e.user_id,
                     arg_max(e.ts, e.p) FILTER (
                       e.op <> 'delete' AND e.p > d.dp) AS ts,
                     arg_max(e.email, e.p) FILTER (e.op <> 'delete'
                       AND e.p > d.dp AND e.email IS NOT NULL) AS email,
                     arg_max(e.city, e.p) FILTER (e.op <> 'delete'
                       AND e.p > d.dp AND e.city IS NOT NULL) AS city,
                     arg_max(e.score, e.p) FILTER (e.op <> 'delete'
                       AND e.p > d.dp AND e.score IS NOT NULL) AS score,
                     count(*) FILTER (
                       e.op <> 'delete' AND e.p > d.dp) AS n_up
              FROM ev e JOIN d USING (user_id)
              GROUP BY e.user_id
            )
            SELECT user_id, ts, email, city, score
            FROM u WHERE n_up > 0
        """,
        "percentile_gate_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '[^ \t\n\r\f\v]+'))
                          AS BIGINT) AS n_tokens
              FROM documents
            ),
            q AS (SELECT quantile_disc(n_tokens, 0.25) AS v FROM toks)
            SELECT doc_id, n_tokens FROM toks, q WHERE n_tokens >= v
        """,
        "mixture_exact_k_docs": """
            SELECT doc_id, source, rk FROM (
              SELECT doc_id, source,
                     CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR))) AS BIGINT) AS rk
              FROM documents
            ) WHERE rk <= 10
        """,
        "lake_training_docs": r"""
            WITH w AS (
              SELECT url, warc_ts, lsn, op, text,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            ),
            live AS (SELECT url, text FROM w WHERE rn = 1 AND op <> 'delete'),
            feat AS (
              SELECT url,
                     md5(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13)
                                          || chr(11) || chr(12)))) AS md5_norm,
                     CAST(len(regexp_extract_all(text, '[^ \t\n\r\f\v]+'))
                          AS BIGINT) AS n_tokens
              FROM live
            )
            SELECT min(url) AS url, md5_norm, min(n_tokens) AS n_tokens
            FROM feat WHERE n_tokens >= 5
            GROUP BY md5_norm
        """,
        "sparse_attr_latest_events": """
            SELECT user_id,
                   arg_max(value, ts) FILTER (event_type = 'click')
                       AS last_click_value,
                   arg_max(value, ts) FILTER (event_type = 'error')
                       AS last_error_value,
                   arg_max(value, ts) FILTER (event_type = 'purchase')
                       AS last_purchase_value,
                   arg_max(value, ts) FILTER (event_type = 'signup')
                       AS last_signup_value,
                   arg_max(value, ts) FILTER (event_type = 'view')
                       AS last_view_value,
                   max(ts) AS ts_last
            FROM events GROUP BY user_id
        """,
        "grouped_median_orders": """
            SELECT o_orderpriority,
                   CAST(quantile_disc(CAST(floor(o_totalprice * 100)
                                           AS BIGINT), 0.5) AS BIGINT)
                       AS median_cents
            FROM orders GROUP BY o_orderpriority
        """,
        "decontaminate_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(text, '[^ \t\n\r\f\v]+') AS l
              FROM documents
            ),
            grams AS (
              SELECT DISTINCT doc_id,
                     array_to_string(l[i:i+7], ' ') AS gram
              FROM (SELECT doc_id, l, unnest(range(1, len(l) - 6)) AS i
                    FROM toks WHERE len(l) >= 8)
            ),
            bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0)
            SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
            FROM grams g JOIN bench b USING (gram)
            GROUP BY g.doc_id
        """,
        "bigram_counts_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(text, '[^ \t\n\r\f\v]+') AS l
              FROM documents
            )
            SELECT doc_id, l[i] || ' ' || l[i+1] AS bigram,
                   CAST(count(*) AS BIGINT) AS n
            FROM (SELECT doc_id, l, unnest(range(1, len(l))) AS i
                  FROM toks WHERE len(l) > 1)
            GROUP BY doc_id, bigram
        """,
        "chunk_docs": """
            SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
                   substr(text, CAST(i*400+1 AS BIGINT), 500) AS chunk
            FROM (
              SELECT doc_id, text,
                     unnest(range(0, CAST(floor((len(text)-1)/400)+1
                                          AS BIGINT))) AS i
              FROM documents WHERE len(text) > 0
            )
        """,
        "pack_sequences_docs": r"""
            SELECT doc_id, n_tokens,
                   CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT)
                       AS cum_n_tokens,
                   CAST(floor((SUM(n_tokens) OVER (ORDER BY doc_id)
                               - n_tokens) / 2048) AS BIGINT) AS seq_id
            FROM (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '[^ \t\n\r\f\v]+'))
                          AS BIGINT) AS n_tokens
              FROM documents
            )
        """,
        "full_outer_join_daily_activity": """
            WITH e AS (SELECT date_trunc('day', ts) AS d,
                              count(*) AS n_events
                       FROM events GROUP BY 1),
                 o AS (SELECT date_trunc('day', o_orderdate) AS d,
                              count(*) AS n_orders
                       FROM orders GROUP BY 1)
            SELECT coalesce(e.d, o.d) AS d,
                   CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
                   CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders
            FROM e FULL JOIN o ON e.d = o.d
        """,
        "tfidf_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS token
              FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS c FROM toks
                   GROUP BY doc_id, token),
            df AS (SELECT token, count(*) AS d FROM tf GROUP BY token)
            SELECT tf.doc_id, tf.token,
                   CAST(tf.c AS BIGINT) AS tf, CAST(df.d AS BIGINT) AS df
            FROM tf JOIN df USING (token)
        """,
        # weighted Bernoulli sample: the engine's keep predicate is
        # digest32 * scale < n_chars * 2^32 in pure integer arithmetic
        # (stages/sampling.weighted_mask) — the identical expression runs
        # here (BIGINT is wide enough: digest32*400 < 2^41)
        "weighted_sample_docs": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE ('0x' || substr(md5('wb1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  * 400 < n_chars * 4294967296
        """,
        # parallel unnests in one SELECT zip positionally: term list and
        # its 1-based ordinal stay aligned
        "regex_extract_docs": """
            SELECT doc_id,
                   unnest(regexp_extract_all(text, '[a-z]{8,}')) AS term,
                   unnest(range(1, len(regexp_extract_all(text, '[a-z]{8,}')) + 1)) AS idx
            FROM documents
            WHERE len(regexp_extract_all(text, '[a-z]{8,}')) > 0
        """,
        "journey_concat_users": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id) AS journey
            FROM events GROUP BY user_id
        """,
        # median/MAD gate: every step (IEEE subtract, abs, 3*MAD, compare)
        # is correctly rounded, so the float threshold is bit-identical to
        # the engine's — unlike mean/stddev, whose summation order differs
        "mad_outliers_events": """
            WITH med AS (SELECT quantile_disc(value, 0.5) AS m FROM events),
                 mad AS (SELECT quantile_disc(abs(value - med.m), 0.5) AS d
                         FROM events, med)
            SELECT event_id, value FROM events, med, mad
            WHERE abs(value - med.m) > 3 * mad.d
        """,
        # REAL decode roundtrip proofs: the engine reconstructs pixels /
        # PCM samples from the encoded payload (pure-stdlib PNG + WAV
        # decoders, stages/codecs.py) and emits dims/counts/crc32 of the
        # DECODED bytes; the oracle reads the fixture's PRE-ENCODE truth.
        # Equal == the decoder bit-exactly inverts the encoder.
        "multimodal_decode_real": f"""
            SELECT media_id, width, height, channels, crc32_pre AS crc32
            FROM read_parquet('{real_media}') WHERE kind = 'image'
        """,
        "multimodal_audio_real": f"""
            SELECT media_id, sample_rate, n_samples, channels, peak,
                   crc32_pre AS crc32
            FROM read_parquet('{real_media}') WHERE kind = 'audio'
        """,
        # identical RE2 pattern chain, identical op order to
        # stages/urlops.canonicalize_urls (pyarrow.compute and DuckDB
        # share the RE2 engine, so this is dialect-risk-free)
        "canonical_urls": rf"""
            WITH s1 AS (
              SELECT url_id, url AS orig,
                     regexp_replace(regexp_replace(url, '#.*$', ''),
                                    '[?&]utm_[a-z_]*=[^&#]*', '', 'g') AS u
              FROM read_parquet('{messy_urls}')
            ),
            s2 AS (
              SELECT url_id, orig,
                     CASE WHEN u NOT LIKE '%?%' AND u LIKE '%&%'
                          THEN regexp_replace(u, '&', '?') ELSE u END AS u
              FROM s1
            ),
            s3 AS (
              SELECT url_id, orig,
                     regexp_replace(regexp_replace(u,
                       '^([hH][tT][tT][pP]://[^/:?#]+):80([/?#]|$)', '\1\2'),
                       '^([hH][tT][tT][pP][sS]://[^/:?#]+):443([/?#]|$)', '\1\2') AS u
              FROM s2
            ),
            s4 AS (
              SELECT url_id, orig,
                     CASE WHEN regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*') <> ''
                          THEN lower(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*'))
                               || substr(u, len(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*')) + 1)
                          ELSE u END AS u
              FROM s3
            )
            SELECT url_id,
                   CASE WHEN orig LIKE '%://%'
                        THEN regexp_replace(u, '[?&]+$', '')
                        ELSE orig END AS url_canon
            FROM s4
        """,
        "first_event_per_user_hour": """
            SELECT user_id, hour, event_id FROM (
              SELECT user_id,
                     CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
                     event_id,
                     row_number() OVER (
                       PARTITION BY user_id, epoch_us(ts) // 3600000000
                       ORDER BY ts, event_id) AS rn
              FROM events)
            WHERE rn = 1
        """,
        "debounce_events": """
            SELECT event_id, user_id FROM (
              SELECT event_id, user_id, ts,
                     lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS ts_prev
              FROM events)
            WHERE ts_prev IS NULL
               OR epoch_us(ts) - epoch_us(ts_prev) > 60000000
        """,
        "weighted_avg_value_by_type": """
            SELECT event_type,
                   CAST(sum(user_id % 7 + 1) AS BIGINT) AS w_total,
                   CAST(sum((user_id % 7 + 1) *
                            CAST(floor(value * 100) AS BIGINT)) AS DOUBLE)
                   / CAST(sum(user_id % 7 + 1) AS DOUBLE) AS wavg_cents
            FROM events GROUP BY event_type
        """,
        # BIGINT sums promote to HUGEINT (exact 128-bit) in DuckDB; the
        # engine combines int64 batch partials with Python bigints — both
        # sides take the identical cast-to-double / multiply / sqrt /
        # divide path, so the correlation is bit-identical.
        "corr_qty_price_by_retflag": """
            WITH s AS (
              SELECT l_returnflag,
                     count(*) AS n,
                     sum(x) AS sx, sum(y) AS sy,
                     sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
              FROM (SELECT l_returnflag,
                           CAST(floor(l_quantity * 100) AS BIGINT) AS x,
                           CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
                    FROM lineitem) t
              GROUP BY 1)
            SELECT l_returnflag,
                   CAST(n AS BIGINT) AS n_rows,
                   CAST(n*sxy - sx*sy AS DOUBLE)
                   / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                          * CAST(n*syy - sy*sy AS DOUBLE)) AS corr_qty_price
            FROM s
        """,
        "event_transition_counts": """
            SELECT prev AS from_type, event_type AS to_type,
                   count(*) AS n
            FROM (SELECT event_type,
                         lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS prev
                  FROM events)
            WHERE prev IS NOT NULL
            GROUP BY 1, 2
        """,
        "cohort_retention_events": """
            WITH uw AS (
              SELECT DISTINCT user_id,
                     CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
              FROM events),
            f AS (SELECT user_id, min(week) AS cohort FROM uw GROUP BY 1)
            SELECT f.cohort AS cohort_week,
                   uw.week - f.cohort AS week_offset,
                   count(*) AS n_users
            FROM uw JOIN f USING (user_id)
            GROUP BY 1, 2
        """,
        "dense_topk_orders_per_priority": """
            SELECT o_orderpriority, o_orderkey, price_c, rnk FROM (
              SELECT o_orderpriority, o_orderkey,
                     CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
                     CAST(dense_rank() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC
                     ) AS BIGINT) AS rnk
              FROM orders)
            WHERE rnk <= 3
        """,
        "locf_daily_user_values": """
            WITH v AS (
              SELECT user_id, day, value_c FROM (
                SELECT user_id,
                       CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                       CAST(floor(value * 100) AS BIGINT) AS value_c,
                       row_number() OVER (
                         PARTITION BY user_id,
                                      epoch_us(ts) // 86400000000
                         ORDER BY ts DESC, event_id DESC) AS rn
                FROM events)
              WHERE rn = 1),
            b AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM v GROUP BY 1),
            g AS (SELECT user_id, unnest(range(lo, hi + 1)) AS day FROM b),
            j AS (SELECT g.user_id, CAST(g.day AS BIGINT) AS day, v.value_c
                  FROM g LEFT JOIN v USING (user_id, day))
            SELECT user_id, day,
                   last_value(value_c IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS value_c
            FROM j
        """,
        # ts ties within a user leave the per-user sorted ts sequence —
        # and hence the gap multiset and its quantiles — unchanged, so
        # the engine's (ts, event_id) tiebreak matches any SQL ordering
        "interarrival_quantiles_by_type": """
            WITH g AS (
              SELECT event_type,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
              FROM events)
            SELECT event_type,
                   quantile_disc(gap_us, 0.5)   AS p50_us,
                   quantile_disc(gap_us, 0.875) AS p875_us
            FROM g WHERE gap_us IS NOT NULL
            GROUP BY event_type
        """,
        "ntile_events_by_type": """
            SELECT event_type, event_id,
                   CAST(floor(value * 100) AS BIGINT) AS value_c,
                   CAST(ntile(4) OVER (
                     PARTITION BY event_type
                     ORDER BY CAST(floor(value * 100) AS BIGINT), event_id
                   ) AS BIGINT) AS tile
            FROM events
        """,
        "distinct_users_per_type": """
            SELECT event_type,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "topk_frequent_users": """
            SELECT CAST(user_id AS VARCHAR) AS item, count(*) AS cnt
            FROM events GROUP BY user_id
            ORDER BY cnt DESC, item ASC LIMIT 20
        """,
        # same WAL (incl. the redelivered duplicate segment) flattened:
        # lsn > 0 rows are exactly the change events the engine reads
        "wal_update_depth": """
            WITH c AS (
              SELECT url, count(*) AS depth
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
              WHERE lsn > 0 GROUP BY url)
            SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_keys
            FROM c GROUP BY 1
        """,
        "pmi_bigrams_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(text, '[^ \t\n\r\f\v]+') AS l
              FROM documents
            ),
            uc AS (
              SELECT tok, count(*) AS c
              FROM (SELECT unnest(l) AS tok FROM toks)
              WHERE tok <> '' GROUP BY 1
            ),
            bc AS (
              SELECT l[i] AS t1, l[i+1] AS t2, count(*) AS c12
              FROM (SELECT l, unnest(range(1, len(l))) AS i
                    FROM toks WHERE len(l) > 1)
              GROUP BY 1, 2
            ),
            tot AS (
              SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM uc) AS N,
                     (SELECT CAST(sum(c12) AS DOUBLE) FROM bc) AS B
            )
            SELECT t1 || ' ' || t2 AS bigram,
                   CAST(c12 AS BIGINT) AS c12,
                   CAST(floor((
                     ln(CAST(c12 AS DOUBLE) / B)
                     - ln(CAST(u1.c AS DOUBLE) / N)
                     - ln(CAST(u2.c AS DOUBLE) / N)
                   ) * 1000000) AS BIGINT) AS pmi_unats
            FROM bc
            JOIN uc u1 ON bc.t1 = u1.tok
            JOIN uc u2 ON bc.t2 = u2.tok
            CROSS JOIN tot
            WHERE c12 >= 20
        """,
        "dow_hour_heatmap_events": """
            SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hour,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "percent_rank_events_by_type": """
            SELECT event_type, event_id,
                   percent_rank() OVER (
                     PARTITION BY event_type
                     ORDER BY CAST(floor(value * 100) AS BIGINT), event_id
                   ) AS pct_rank
            FROM events
        """,
        "top_unshipped_orders": """
            SELECT o_orderkey,
                   CAST(sum(CAST(floor(
                     l_extendedprice * (1 - l_discount) * 100
                   ) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND epoch_us(o_orderdate) < 883612800000000
              AND epoch_us(l_shipdate) >= 883612800000000
            GROUP BY 1
            ORDER BY revenue_cents DESC, o_orderkey ASC
            LIMIT 10
        """,
        # LWW winners filtered to the same two rule-selected hosts the
        # engine serves through the index's pruned partition reads
        "host_index_read": """
            WITH w AS (
              SELECT url, warc_ts, lang, op,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            ),
            live AS (
              SELECT url, warc_ts, lang,
                     regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)
                       AS host
              FROM w WHERE rn = 1 AND op <> 'delete'
            ),
            hs AS (SELECT DISTINCT host FROM live ORDER BY host LIMIT 2)
            SELECT url, warc_ts, lang
            FROM live WHERE host IN (SELECT host FROM hs)
        """,
        # same smoothed bigram model recomputed in SQL: global per-doc
        # pair counts -> conditional (c+1)/(rowtotal+256) -> sum of lns
        "charlm_score_docs": """
            WITH pairs AS (
              SELECT doc_id, substr(text, i, 2) AS pg
              FROM documents, unnest(range(1, length(text))) AS t(i)
              WHERE length(text) >= 2
            ),
            cnt AS (SELECT pg, count(*) AS c FROM pairs GROUP BY 1),
            rowt AS (
              SELECT substr(pg, 1, 1) AS c1, sum(c) AS rt
              FROM cnt GROUP BY 1
            )
            SELECT p.doc_id,
                   count(*) AS n_pairs,
                   CAST(floor(sum(ln(
                     (cnt.c + 1.0) / (rowt.rt + 256.0)
                   )) * 1000000) AS BIGINT) AS lm_score_unats
            FROM pairs p
            JOIN cnt ON p.pg = cnt.pg
            JOIN rowt ON substr(p.pg, 1, 1) = rowt.c1
            GROUP BY 1
        """,
        # flagship #2 oracle: LWW live winners, p50 event-time cutoff
        # (quantile_disc == the engine's lower rank at q=0.5), host rollup
        "lake_recent_hosts": """
            WITH w AS (
              SELECT url, warc_ts, op,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            ),
            live AS (SELECT url, warc_ts FROM w WHERE rn = 1 AND op <> 'delete'),
            cut AS (SELECT quantile_disc(warc_ts, 0.5) AS c FROM live)
            SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)
                     AS host,
                   count(*) AS n_pages,
                   CAST(max(epoch_us(warc_ts)) AS BIGINT) AS latest_ts_us
            FROM live, cut
            WHERE warc_ts >= c
            GROUP BY 1
        """,
        "scan_prune_recent_pages": """
            WITH w AS (
              SELECT url, warc_ts, op,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            ),
            live AS (SELECT url, warc_ts FROM w WHERE rn = 1 AND op <> 'delete'),
            cut AS (SELECT quantile_disc(warc_ts, 0.5) AS c FROM live)
            SELECT url, CAST(epoch_us(warc_ts) AS BIGINT) AS ts_us
            FROM live, cut
            WHERE warc_ts >= c
        """,
        "meta_count_recent_pages": """
            WITH w AS (
              SELECT url, warc_ts, op,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            ),
            live AS (SELECT url, warc_ts FROM w WHERE rn = 1 AND op <> 'delete'),
            cut AS (SELECT quantile_disc(warc_ts, 0.5) AS c FROM live)
            SELECT CAST(count(*) AS BIGINT) AS n_recent
            FROM live, cut
            WHERE warc_ts >= c
        """,
        "brand_revenue_topk": """
            SELECT p_brand,
                   CAST(sum(CAST(floor(
                     l_extendedprice * (1 - l_discount) * 100
                   ) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
            ORDER BY revenue_cents DESC, p_brand ASC
            LIMIT 10
        """,
        "supplier_nation_volume": """
            SELECT n_name,
                   CAST(sum(CAST(floor(
                     l_extendedprice * (1 - l_discount) * 100
                   ) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   count(*) AS n_lineitems
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1
        """,
        "orders_priority_share": """
            WITH a AS (
              SELECT o_orderpriority,
                     CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS revenue_cents
              FROM orders GROUP BY 1)
            SELECT o_orderpriority, revenue_cents,
                   CAST(revenue_cents AS DOUBLE) /
                   CAST(sum(revenue_cents) OVER () AS DOUBLE) AS share
            FROM a
        """,
        "cumulative_new_users_daily": """
            WITH f AS (
              SELECT user_id,
                     min(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS day
              FROM events GROUP BY 1),
            d AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
            SELECT day, new_users,
                   CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT)
                     AS cum_users
            FROM d
        """,
        "dq_violations_orders": """
            SELECT 'null_orderkey' AS rule,
                   CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT)
                     AS n_violations FROM orders
            UNION ALL
            SELECT 'nonpositive_price',
                   CAST(count(*) FILTER (
                     o_totalprice IS NULL OR o_totalprice <= 0) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'unknown_status',
                   CAST(count(*) FILTER (
                     o_orderstatus IS NULL
                     OR o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'date_out_of_range',
                   CAST(count(*) FILTER (
                     o_orderdate IS NULL
                     OR o_orderdate < TIMESTAMP '1992-01-01'
                     OR o_orderdate >= TIMESTAMP '2026-01-01') AS BIGINT)
            FROM orders
        """,
        "quantiles_cont_events": """
            SELECT 0.25 AS q, quantile_cont(value, 0.25) AS value FROM events
            UNION ALL
            SELECT 0.5, quantile_cont(value, 0.5) FROM events
            UNION ALL
            SELECT 0.875, quantile_cont(value, 0.875) FROM events
        """,
        "type_cooccurrence_users": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS n_users
            FROM d a JOIN d b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        "winsorize_values_by_type": """
            WITH c AS (
              SELECT event_id, event_type,
                     CAST(floor(value * 100) AS BIGINT) AS cents
              FROM events),
            b AS (
              SELECT event_type,
                     quantile_disc(cents, 0.125) AS lo,
                     quantile_disc(cents, 0.875) AS hi
              FROM c GROUP BY 1)
            SELECT c.event_id, c.event_type,
                   CAST(least(greatest(c.cents, b.lo), b.hi) AS BIGINT)
                     AS clipped_cents
            FROM c JOIN b USING (event_type)
        """,
        "trailing_1h_sum_per_user": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS trail_1h_cents
            FROM events
        """,
        "entropy_event_types_per_user": """
            WITH c AS (
              SELECT user_id, event_type, count(*) AS c
              FROM events GROUP BY 1, 2),
            u AS (
              SELECT user_id, sum(c) AS n, sum(c * ln(c)) AS s
              FROM c GROUP BY 1)
            SELECT user_id, CAST(n AS BIGINT) AS n_events,
                   CAST(floor((ln(n) - s / n) * 1000000) AS BIGINT)
                     AS entropy_unats
            FROM u
        """,
        "geomean_value_by_type": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_pos,
                   CAST(floor(exp(sum(ln(value)) / count(*)) * 1000000)
                        AS BIGINT) AS geomean_micros
            FROM events WHERE value > 0 GROUP BY 1
        """,
        "chisq_type_by_daypart": """
            WITH c AS (
              SELECT event_type,
                     CAST(hour(ts) // 6 AS BIGINT) AS daypart,
                     count(*) AS n
              FROM events GROUP BY 1, 2),
            m AS (
              SELECT event_type, daypart, CAST(n AS BIGINT) AS n,
                     CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE) AS rt,
                     CAST(sum(n) OVER (PARTITION BY daypart) AS DOUBLE) AS ct,
                     CAST(sum(n) OVER () AS DOUBLE) AS g
              FROM c)
            SELECT event_type, daypart, n,
                   rt * ct / g AS expected,
                   (n - rt * ct / g) * (n - rt * ct / g) / (rt * ct / g)
                     AS chi2_cell
            FROM m
        """,
        "fuzzy_pairs_docs": """
            WITH k AS (
              SELECT doc_id, substr(text, 1, 32) AS key FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM k a JOIN k b
              ON a.doc_id < b.doc_id
             AND abs(length(a.key) - length(b.key)) <= 1
             AND levenshtein(a.key, b.key) <= 1
        """,
        # Debezium-style change records between bootstrap and head:
        # before image = base-snapshot row, after image = LWW winner
        # (same classification rules as cdc_table_diff, plus md5 images)
        "cdc_changelog_pages": """
            WITH w AS (
              SELECT url, warc_ts, lsn, op, text,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            ),
            win AS (SELECT url, warc_ts, lsn, op, text FROM w WHERE rn = 1),
            b AS (
              SELECT url, warc_ts, text
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/base/pages.parquet')
            )
            SELECT 'insert' AS op, win.url,
                   CAST(NULL AS TIMESTAMP) AS before_warc_ts,
                   win.warc_ts AS after_warc_ts,
                   CAST(NULL AS VARCHAR) AS before_text_md5,
                   md5(win.text) AS after_text_md5
            FROM win LEFT JOIN b USING (url)
            WHERE b.url IS NULL AND win.op <> 'delete'
            UNION ALL
            SELECT 'delete' AS op, b.url,
                   b.warc_ts, CAST(NULL AS TIMESTAMP),
                   md5(b.text), CAST(NULL AS VARCHAR)
            FROM b JOIN win USING (url) WHERE win.op = 'delete'
            UNION ALL
            SELECT 'update' AS op, win.url,
                   b.warc_ts, win.warc_ts,
                   md5(b.text), md5(win.text)
            FROM win JOIN b USING (url)
            WHERE win.op <> 'delete' AND win.lsn > 0
        """,
        "wow_event_counts": """
            WITH w AS (
              SELECT event_type,
                     CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week,
                     count(*) AS n
              FROM events GROUP BY 1, 2)
            SELECT event_type, week, n,
                   n - lag(n) OVER (
                     PARTITION BY event_type ORDER BY week) AS wow_delta
            FROM w
        """,
        "revenue_by_region_star": """
            SELECT r_name,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     AS revenue_cents,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1
        """,
        "funnel_users_events": """
            WITH j AS (
              SELECT user_id,
                     string_agg(event_type, ',' ORDER BY ts, event_id) AS journey
              FROM events GROUP BY user_id)
            SELECT user_id FROM j
            WHERE regexp_matches(journey,
                  'view(,[a-z]+)*,click(,[a-z]+)*,purchase')
        """,
        "gapfill_daily_user_counts": """
            WITH c AS (
              SELECT user_id,
                     CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                     count(*) AS n
              FROM events GROUP BY 1, 2
            ),
            b AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM c GROUP BY 1),
            g AS (SELECT user_id, unnest(range(lo, hi + 1)) AS day FROM b)
            SELECT g.user_id, CAST(g.day AS BIGINT) AS day,
                   CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
            FROM g LEFT JOIN c USING (user_id, day)
        """,
        "rolling_sum_events": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(floor(value * 100) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
                     AS roll4_cents
            FROM events
        """,
        "profile_documents": """
            SELECT 'doc_id' AS column, CAST(count(*) FILTER (doc_id IS NULL) AS BIGINT) AS null_count,
                   CAST(min(doc_id) AS VARCHAR) AS min_v, CAST(max(doc_id) AS VARCHAR) AS max_v FROM documents
            UNION ALL
            SELECT 'lang', count(*) FILTER (lang IS NULL), min(lang), max(lang) FROM documents
            UNION ALL
            SELECT 'source', count(*) FILTER (source IS NULL), min(source), max(source) FROM documents
            UNION ALL
            SELECT 'n_chars', count(*) FILTER (n_chars IS NULL),
                   CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents
        """,
        "unpivot_order_metrics": """
            SELECT o_orderkey, 'total_cents' AS metric,
                   CAST(floor(o_totalprice * 100) AS BIGINT) AS value
            FROM orders
            UNION ALL
            SELECT o_orderkey, 'cust_key' AS metric,
                   CAST(o_custkey AS BIGINT) AS value
            FROM orders
        """,
        "user_event_mode": """
            SELECT user_id, mode_event, mode_count FROM (
              SELECT user_id, event_type AS mode_event,
                     CAST(count(*) AS BIGINT) AS mode_count,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY count(*) DESC, event_type) AS rn
              FROM events GROUP BY user_id, event_type)
            WHERE rn = 1
        """,
        "ecdf_normalize_docs": """
            SELECT doc_id, n_chars,
                   cume_dist() OVER (ORDER BY n_chars) AS pct
            FROM documents
        """,
        "grouped_quantiles_users": """
            SELECT user_id,
                   quantile_disc(value, 0.25)  AS p25,
                   quantile_disc(value, 0.5)   AS p50,
                   quantile_disc(value, 0.875) AS p875
            FROM events GROUP BY user_id
        """,
        # same token/8-gram CTEs as decontaminate_docs; grams are
        # per-doc DISTINCT so a per-gram row count is a doc count
        "dup_span_profile_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(text, '[^ \t\n\r\f\v]+') AS l
              FROM documents
            ),
            grams AS (
              SELECT DISTINCT doc_id,
                     array_to_string(l[i:i+7], ' ') AS gram
              FROM (SELECT doc_id, l, unnest(range(1, len(l) - 6)) AS i
                    FROM toks WHERE len(l) >= 8)
            ),
            shared AS (
              SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
            ),
            tot AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
            sh AS (SELECT g.doc_id, count(*) AS n FROM grams g
                   JOIN shared USING (gram) GROUP BY g.doc_id)
            SELECT t.doc_id,
                   CAST(t.n AS BIGINT) AS n_grams,
                   CAST(coalesce(sh.n, 0) AS BIGINT) AS n_shared,
                   CAST(coalesce(sh.n, 0) AS DOUBLE) / t.n AS dup_ratio
            FROM tot t LEFT JOIN sh USING (doc_id)
        """,
        # same digest expression as fingerprint_docs / dedup_docs_exact
        "incremental_dedup_docs": """
            WITH fp AS (
              SELECT doc_id,
                     md5(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)))) AS d
              FROM documents
            ),
            corpus AS (SELECT d FROM fp WHERE doc_id % 5 <> 0),
            arrivals AS (SELECT doc_id, d FROM fp WHERE doc_id % 5 = 0)
            SELECT min(doc_id) AS doc_id FROM arrivals a
            WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.d = a.d)
            GROUP BY d
        """,
        # C4 semantics: a paragraph (16-word window) survives only at its
        # first (doc_id, para_idx) occurrence corpus-wide; docs reassemble
        # from survivors (docs with none drop out)
        "paragraph_dedup_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS tok,
                     unnest(range(0, len(regexp_extract_all(text, '[^ \t\n\r\f\v]+')))) AS pos
              FROM documents),
            paras AS (
              SELECT doc_id, CAST(pos // 16 AS BIGINT) AS para_idx,
                     string_agg(tok, ' ' ORDER BY pos) AS para
              FROM toks GROUP BY doc_id, para_idx),
            firsts AS (
              SELECT doc_id, para_idx, para,
                     row_number() OVER (PARTITION BY para
                                        ORDER BY doc_id, para_idx) AS rn
              FROM paras)
            SELECT doc_id, string_agg(para, ' ' ORDER BY para_idx) AS clean_text
            FROM firsts WHERE rn = 1 GROUP BY doc_id
        """,
        # integer-exact Gopher gate: mean word length in [3,10] as a
        # cross-multiply, stopword floor, word-count band
        "gopher_quality_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS tok
              FROM documents),
            agg AS (
              SELECT doc_id,
                     count(*) AS n_words,
                     sum(length(tok)) AS sum_word_len,
                     sum(CASE WHEN list_contains(
                           ['a','and','for','in','is','it','of','that','the','to'],
                           lower(tok)) THEN 1 ELSE 0 END) AS stop_hits
              FROM toks GROUP BY doc_id)
            SELECT doc_id,
                   CAST(n_words AS BIGINT) AS n_words,
                   CAST(sum_word_len AS BIGINT) AS sum_word_len,
                   CAST(stop_hits AS BIGINT) AS stop_hits,
                   CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                              AND 3 * n_words <= sum_word_len
                              AND sum_word_len <= 10 * n_words
                              AND stop_hits >= 2
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM agg
        """,
        # BM25 with every float step in the SAME order as the engine
        # (ln via libm on both sides; remaining ops single correctly-
        # rounded IEEE steps), compared as floor(1e6 * score)
        "bm25_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS tok
              FROM documents),
            tf AS (SELECT doc_id, tok AS token, count(*) AS tf FROM toks
                   GROUP BY doc_id, tok),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
            df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
            tot AS (SELECT count(*) AS n FROM documents),
            sdl AS (SELECT sum(dl) AS sumdl FROM dl)
            SELECT tf.doc_id, tf.token,
                   CAST(tf.tf AS BIGINT) AS tf,
                   CAST(df.df AS BIGINT) AS df,
                   CAST(dl.dl AS BIGINT) AS dl,
                   CAST(floor(1000000.0 * (
                     (ln(1.0 + (CAST(tot.n - df.df AS DOUBLE) + 0.5)
                               / (CAST(df.df AS DOUBLE) + 0.5))
                      * (CAST(tf.tf AS DOUBLE) * 2.2))
                     / (CAST(tf.tf AS DOUBLE)
                        + 1.2 * (0.25 + 0.75 * (CAST(dl.dl * tot.n AS DOUBLE)
                                                / CAST(sdl.sumdl AS DOUBLE))))
                   )) AS BIGINT) AS bm25_fp
            FROM tf
            JOIN df USING (token)
            JOIN dl USING (doc_id), tot, sdl
        """,
        # flagship #3: live lake (LWW window) -> newline-paragraph
        # first-occurrence dedup -> per-url reassembly -> integer-exact
        # Gopher gate on the cleaned text (min 40 words, mean-length
        # cross-multiply; stopword floor 0 — the synthetic page
        # vocabulary has no English stopwords)
        "lake_clean_corpus": r"""
            WITH w AS (
              SELECT url, warc_ts, lsn, op, text,
                     row_number() OVER (
                       PARTITION BY url ORDER BY warc_ts DESC, lsn DESC) AS rn
              FROM read_parquet('/tmp/etlray_cdc_1000_8000/data/oracle_events.parquet')
            ),
            live AS (SELECT url, text FROM w WHERE rn = 1 AND op <> 'delete'),
            lines AS (
              SELECT url,
                     unnest(string_split(text, chr(10))) AS para,
                     unnest(range(0, len(string_split(text, chr(10))))) AS para_idx
              FROM live),
            nonempty AS (SELECT * FROM lines WHERE para <> ''),
            firsts AS (
              SELECT url, para_idx, para,
                     row_number() OVER (PARTITION BY para
                                        ORDER BY url, para_idx) AS rn
              FROM nonempty),
            clean AS (
              SELECT url, string_agg(para, chr(10) ORDER BY para_idx) AS clean_text
              FROM firsts WHERE rn = 1 GROUP BY url),
            toks AS (
              SELECT url,
                     unnest(regexp_extract_all(clean_text, '[^ \t\n\r\f\v]+')) AS tok
              FROM clean),
            agg AS (
              SELECT url, count(*) AS n_words, sum(length(tok)) AS sum_word_len
              FROM toks GROUP BY url)
            SELECT c.url, c.clean_text,
                   CAST(a.n_words AS BIGINT) AS n_words,
                   CAST(a.sum_word_len AS BIGINT) AS sum_word_len,
                   CAST(CASE WHEN a.n_words BETWEEN 40 AND 100000
                              AND 3 * a.n_words <= a.sum_word_len
                              AND a.sum_word_len <= 10 * a.n_words
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM clean c JOIN agg a USING (url)
        """,
        # token-id encoding: dense ids by (count DESC, token ASC) over the
        # count>=5 vocabulary, OOV -> 0, one row per token occurrence
        "encode_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS tok,
                     unnest(range(0, len(regexp_extract_all(text, '[^ \t\n\r\f\v]+')))) AS pos
              FROM documents),
            counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
            vocab AS (
              SELECT tok, row_number() OVER (ORDER BY c DESC, tok ASC) AS tid
              FROM counts WHERE c >= 5)
            SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
                   CAST(COALESCE(v.tid, 0) AS BIGINT) AS token_id
            FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        """,
        # NFC(lower) -> edge-trim -> whitespace collapse; RE2 on both
        # engines, so the regex dialect is shared
        "normalize_text_docs": r"""
            WITH n AS (
              SELECT doc_id,
                     regexp_replace(
                       regexp_replace(nfc_normalize(lower(text)),
                                      '^[ \t\n\r\f\v]+|[ \t\n\r\f\v]+$',
                                      '', 'g'),
                       '[ \t\n\r\f\v]+', ' ', 'g') AS norm_text
              FROM documents)
            SELECT doc_id, norm_text,
                   CAST(length(norm_text) AS BIGINT) AS n_chars_norm
            FROM n
        """,
        # same pair predicate + transitive closure as dup_clusters_docs,
        # then keep = (not clustered) OR (cluster representative)
        "neardup_keep_docs": f"""
            WITH RECURSIVE {_SHINGLE_CTES},
            pairs AS (
              SELECT id_a, id_b
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
            ),
            e AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs
            ),
            reach(n, m) AS (
              SELECT a, a FROM e
              UNION
              SELECT reach.n, e.b FROM reach JOIN e ON reach.m = e.a
            ),
            clusters AS (
              SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n
            )
            SELECT d.doc_id,
                   CAST(CASE WHEN c.cluster_id IS NULL
                              OR c.cluster_id = d.doc_id
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
        """,
        # same smoothed byte-bigram model as charlm_score_docs; mean =
        # floor(lm/n_pairs) over doubles (single IEEE div, identical both
        # engines); tertile thresholds via the floor(q*(n-1)) rank rule
        # shared with quantiles_events
        "ccnet_bucket_docs": r"""
            WITH pairs AS (
              SELECT doc_id, substr(text, i, 2) AS pg
              FROM documents, unnest(range(1, length(text))) AS t(i)
              WHERE length(text) >= 2
            ),
            cnt AS (SELECT pg, count(*) AS c FROM pairs GROUP BY 1),
            rowt AS (
              SELECT substr(pg, 1, 1) AS c1, sum(c) AS rt
              FROM cnt GROUP BY 1
            ),
            scored AS (
              SELECT p.doc_id,
                     count(*) AS n_pairs,
                     CAST(floor(sum(ln(
                       (cnt.c + 1.0) / (rowt.rt + 256.0)
                     )) * 1000000) AS BIGINT) AS lm
              FROM pairs p
              JOIN cnt ON p.pg = cnt.pg
              JOIN rowt ON substr(p.pg, 1, 1) = rowt.c1
              GROUP BY 1
            ),
            m AS (
              SELECT doc_id,
                     CAST(floor(CAST(lm AS DOUBLE) / CAST(n_pairs AS DOUBLE))
                          AS BIGINT) AS mean_unats
              FROM scored
            ),
            r AS (
              SELECT mean_unats AS v,
                     row_number() OVER (ORDER BY mean_unats) AS rn
              FROM m
            ),
            nn AS (SELECT count(*) AS c FROM r),
            th1 AS (SELECT v FROM r, nn
                    WHERE rn = CAST(floor((1.0/3.0) * (c - 1)) AS BIGINT) + 1),
            th2 AS (SELECT v FROM r, nn
                    WHERE rn = CAST(floor((2.0*(1.0/3.0)) * (c - 1)) AS BIGINT) + 1)
            SELECT m.doc_id, m.mean_unats,
                   CASE WHEN m.mean_unats >= (SELECT v FROM th2) THEN 'head'
                        WHEN m.mean_unats >= (SELECT v FROM th1) THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM m
        """,
        # DSIR hashed-unigram importance: md5-prefix bucket (the engine's
        # md5_bucket), Laplace-smoothed target/raw log-ratio per bucket
        # (float sequence op-identical to the engine), per-doc INTEGER sum
        "dsir_weights_docs": r"""
            WITH toks AS (
              SELECT doc_id, lang,
                     unnest(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS tok
              FROM documents),
            b AS (
              SELECT doc_id,
                     CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)
                       % 4096 AS bucket,
                     lang
              FROM toks),
            cnt AS (
              SELECT bucket,
                     count(*) AS cr,
                     sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
              FROM b GROUP BY bucket),
            tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM cnt),
            fp AS (
              SELECT bucket,
                     CAST(floor(1000000.0 * ln(
                       ((ct + 1.0) * (nr + 4096.0))
                       / ((cr + 1.0) * (nt + 4096.0))
                     )) AS BIGINT) AS lr
              FROM cnt, tot)
            SELECT b.doc_id,
                   count(*) AS n_tokens,
                   CAST(sum(fp.lr) AS BIGINT) AS weight_fp
            FROM b JOIN fp USING (bucket)
            GROUP BY 1
        """,
        # same charlm model + integer mean as ccnet_bucket_docs; keep
        # docs while the running byte total (best mean first, doc_id
        # tiebreak) fits half the scorable corpus bytes
        "budget_select_docs": r"""
            WITH pairs AS (
              SELECT doc_id, substr(text, i, 2) AS pg
              FROM documents, unnest(range(1, length(text))) AS t(i)
              WHERE length(text) >= 2
            ),
            cnt AS (SELECT pg, count(*) AS c FROM pairs GROUP BY 1),
            rowt AS (
              SELECT substr(pg, 1, 1) AS c1, sum(c) AS rt
              FROM cnt GROUP BY 1
            ),
            scored AS (
              SELECT p.doc_id,
                     count(*) AS n_pairs,
                     CAST(floor(sum(ln(
                       (cnt.c + 1.0) / (rowt.rt + 256.0)
                     )) * 1000000) AS BIGINT) AS lm
              FROM pairs p
              JOIN cnt ON p.pg = cnt.pg
              JOIN rowt ON substr(p.pg, 1, 1) = rowt.c1
              GROUP BY 1
            ),
            m AS (
              SELECT doc_id,
                     CAST(n_pairs + 1 AS BIGINT) AS n_bytes,
                     CAST(floor(CAST(lm AS DOUBLE) / CAST(n_pairs AS DOUBLE))
                          AS BIGINT) AS mean_unats
              FROM scored
            ),
            tot AS (SELECT CAST(sum(n_bytes) // 2 AS BIGINT) AS b FROM m),
            cum AS (
              SELECT doc_id, mean_unats, n_bytes,
                     CAST(SUM(n_bytes) OVER (
                       ORDER BY mean_unats DESC, doc_id ASC
                     ) AS BIGINT) AS cum_bytes
              FROM m
            )
            SELECT doc_id, mean_unats, n_bytes, cum_bytes
            FROM cum, tot WHERE cum_bytes <= b
        """,
        # deterministic global shuffle: md5-prefix order key (same 24-bit
        # prefix + doc_id tiebreak as the engine's packed key), global
        # row_number position, round-robin shard
        "global_shuffle_docs": r"""
            WITH k AS (
              SELECT doc_id,
                     CAST(concat('0x', substr(
                       md5(concat('shuf:', CAST(doc_id AS VARCHAR))), 1, 6
                     )) AS BIGINT) AS h
              FROM documents),
            r AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY h, doc_id) AS pos
              FROM k)
            SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                   CAST((pos - 1) % 16 AS BIGINT) AS shard_id
            FROM r
        """,
        # temperature mixing: per-language integer acceptance threshold
        # floor(pow(cmin/c, 0.3) * 2^32) (libm pow, op-identical to the
        # engine), md5-32-bit acceptance per doc
        "temperature_mix_docs": r"""
            WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
            mn AS (SELECT min(n) AS m FROM c),
            thr AS (
              SELECT lang,
                     CAST(floor(pow(CAST(m AS DOUBLE) / CAST(n AS DOUBLE), 0.3)
                                * 4294967296.0) AS BIGINT) AS t
              FROM c, mn)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN thr USING (lang)
            WHERE CAST(concat('0x', substr(
                    md5(concat('mix:', CAST(d.doc_id AS VARCHAR))), 1, 8
                  )) AS BIGINT) < thr.t
        """,
        # charlm decile calibration: same model CTE as ccnet/budget;
        # thresholds at the floor(q*(n-1)) rank rule; bin = #thr <= mean
        "quality_calibration_docs": r"""
            WITH pairs AS (
              SELECT doc_id, substr(text, i, 2) AS pg
              FROM documents, unnest(range(1, length(text))) AS t(i)
              WHERE length(text) >= 2
            ),
            cnt AS (SELECT pg, count(*) AS c FROM pairs GROUP BY 1),
            rowt AS (
              SELECT substr(pg, 1, 1) AS c1, sum(c) AS rt
              FROM cnt GROUP BY 1
            ),
            scored AS (
              SELECT p.doc_id,
                     count(*) AS n_pairs,
                     CAST(floor(sum(ln(
                       (cnt.c + 1.0) / (rowt.rt + 256.0)
                     )) * 1000000) AS BIGINT) AS lm
              FROM pairs p
              JOIN cnt ON p.pg = cnt.pg
              JOIN rowt ON substr(p.pg, 1, 1) = rowt.c1
              GROUP BY 1
            ),
            m AS (
              SELECT s.doc_id,
                     CAST(floor(CAST(s.lm AS DOUBLE) / CAST(s.n_pairs AS DOUBLE))
                          AS BIGINT) AS mean_unats,
                     CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_en
              FROM scored s JOIN documents d USING (doc_id)
            ),
            q AS (
              SELECT mean_unats AS v,
                     row_number() OVER (ORDER BY mean_unats) AS rn
              FROM m),
            n AS (SELECT count(*) AS c FROM m),
            thr AS (
              SELECT v FROM q, n
              WHERE rn IN (
                CAST(floor(0.1 * (c - 1)) AS BIGINT) + 1,
                CAST(floor(0.2 * (c - 1)) AS BIGINT) + 1,
                CAST(floor(0.3 * (c - 1)) AS BIGINT) + 1,
                CAST(floor(0.4 * (c - 1)) AS BIGINT) + 1,
                CAST(floor(0.5 * (c - 1)) AS BIGINT) + 1,
                CAST(floor(0.6 * (c - 1)) AS BIGINT) + 1,
                CAST(floor(0.7 * (c - 1)) AS BIGINT) + 1,
                CAST(floor(0.8 * (c - 1)) AS BIGINT) + 1,
                CAST(floor(0.9 * (c - 1)) AS BIGINT) + 1))
            SELECT (SELECT count(*) FROM thr WHERE thr.v <= m.mean_unats)
                     AS bin,
                   count(*) AS n_docs,
                   CAST(sum(is_en) AS BIGINT) AS n_en
            FROM m GROUP BY 1
        """,
        # C4 blocklist: drop any doc whose whitespace tokens intersect
        # the banned set
        "badwords_filter_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS tok
              FROM documents)
            SELECT d.doc_id, d.lang
            FROM documents d
            WHERE NOT EXISTS (
              SELECT 1 FROM toks t
              WHERE t.doc_id = d.doc_id
                AND t.tok IN ('dup'))
        """,
        # domain gate: keep sources whose INTEGER floor-mean n_chars is
        # >= the corpus floor-mean (exact integer division both sides)
        "domain_gate_docs": r"""
            WITH c AS (
              SELECT source, sum(n_chars) AS s, count(*) AS n
              FROM documents GROUP BY 1),
            g AS (SELECT sum(s) // sum(n) AS gate FROM c),
            keep AS (SELECT source FROM c, g WHERE s // n >= gate)
            SELECT d.doc_id, d.source, d.n_chars
            FROM documents d JOIN keep USING (source)
        """,
        # integer-exact PageRank, 3 unrolled iterations over the
        # bipartite user<->props.k graph: ranks in 1e9 fixed-point,
        # contribution = r // outdeg, damping = 15e7 + (85*sum)//100 —
        # every op exact int64, so the hash matches the engine's
        # distributed join/groupby iterations
        "pagerank_user_props": r"""
            WITH e0 AS (
              SELECT DISTINCT user_id,
                     CAST(json_extract(props, '$.k') AS BIGINT) AS k
              FROM events WHERE props IS NOT NULL
                AND CAST(json_extract(props, '$.k') AS BIGINT) >= 0),
            edges AS (
              SELECT 'u:' || CAST(user_id AS VARCHAR) AS src,
                     'k:' || CAST(k AS VARCHAR) AS dst FROM e0
              UNION ALL
              SELECT 'k:' || CAST(k AS VARCHAR),
                     'u:' || CAST(user_id AS VARCHAR) FROM e0),
            deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
            r0 AS (SELECT src AS node, CAST(1000000000 AS BIGINT) AS r
                   FROM deg),
            r1 AS (
              SELECT e.dst AS node,
                     CAST(150000000 + (85 * sum(r0.r // deg.d)) // 100
                          AS BIGINT) AS r
              FROM edges e
              JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
              GROUP BY 1),
            r2 AS (
              SELECT e.dst AS node,
                     CAST(150000000 + (85 * sum(r1.r // deg.d)) // 100
                          AS BIGINT) AS r
              FROM edges e
              JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
              GROUP BY 1),
            r3 AS (
              SELECT e.dst AS node,
                     CAST(150000000 + (85 * sum(r2.r // deg.d)) // 100
                          AS BIGINT) AS r
              FROM edges e
              JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
              GROUP BY 1)
            SELECT node, r FROM r3
        """,
        # FLAGSHIP #4: the whole curation chain as one CTE pipeline —
        # every stage's statistics derive from the previous stage's
        # survivors, mirroring the engine stage-for-stage (same integer
        # gates, same libm pow/ln, same md5 predicates)
        "curation_pipeline_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS tok
              FROM documents),
            bad AS (SELECT DISTINCT doc_id FROM toks
                    WHERE tok IN ('dup')),
            s1 AS (SELECT d.* FROM documents d
                   WHERE NOT EXISTS (SELECT 1 FROM bad b
                                     WHERE b.doc_id = d.doc_id)),
            c2 AS (SELECT source, sum(n_chars) AS s, count(*) AS n
                   FROM s1 GROUP BY 1),
            g2 AS (SELECT sum(s) // sum(n) AS gate FROM c2),
            s2 AS (SELECT d.* FROM s1 d
                   JOIN c2 USING (source), g2
                   WHERE c2.s // c2.n >= g2.gate),
            c3 AS (SELECT lang, count(*) AS n FROM s2 GROUP BY 1),
            mn3 AS (SELECT min(n) AS m FROM c3),
            thr3 AS (SELECT lang,
                            CAST(floor(pow(CAST(m AS DOUBLE) / CAST(n AS DOUBLE),
                                           0.3) * 4294967296.0) AS BIGINT) AS t
                     FROM c3, mn3),
            s3 AS (SELECT d.* FROM s2 d JOIN thr3 USING (lang)
                   WHERE CAST(concat('0x', substr(
                           md5(concat('mix:', CAST(d.doc_id AS VARCHAR))), 1, 8
                         )) AS BIGINT) < thr3.t),
            pairs AS (
              SELECT doc_id, substr(text, i, 2) AS pg
              FROM s3, unnest(range(1, length(text))) AS t(i)
              WHERE length(text) >= 2),
            cnt AS (SELECT pg, count(*) AS c FROM pairs GROUP BY 1),
            rowt AS (SELECT substr(pg, 1, 1) AS c1, sum(c) AS rt
                     FROM cnt GROUP BY 1),
            scored AS (
              SELECT p.doc_id,
                     count(*) AS n_pairs,
                     CAST(floor(sum(ln(
                       (cnt.c + 1.0) / (rowt.rt + 256.0)
                     )) * 1000000) AS BIGINT) AS lm
              FROM pairs p
              JOIN cnt ON p.pg = cnt.pg
              JOIN rowt ON substr(p.pg, 1, 1) = rowt.c1
              GROUP BY 1),
            m AS (
              SELECT s.doc_id, d.lang, d.source,
                     CAST(floor(CAST(s.lm AS DOUBLE) / CAST(s.n_pairs AS DOUBLE))
                          AS BIGINT) AS mean_unats,
                     CAST(s.n_pairs + 1 AS BIGINT) AS n_bytes
              FROM scored s JOIN s3 d USING (doc_id)),
            tot AS (SELECT CAST(sum(n_bytes) // 2 AS BIGINT) AS b FROM m),
            cum AS (
              SELECT doc_id, lang, source, mean_unats, n_bytes,
                     CAST(SUM(n_bytes) OVER (
                       ORDER BY mean_unats DESC, doc_id ASC
                     ) AS BIGINT) AS cum_bytes
              FROM m)
            SELECT doc_id, lang, source, mean_unats, n_bytes, cum_bytes
            FROM cum, tot WHERE cum_bytes <= b
        """,
        # CUBE: all four grouping sets with count + integer-cent revenue
        "cube_orders_status_priority": r"""
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_orders,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        # grouped OLS: slope / intercept / r2 from exact integer moments;
        # the double expressions mirror the engine operand-for-operand
        "regr_price_on_qty_by_retflag": """
            WITH s AS (
              SELECT l_returnflag,
                     count(*) AS n,
                     sum(x) AS sx, sum(y) AS sy,
                     sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
              FROM (SELECT l_returnflag,
                           CAST(floor(l_quantity * 100) AS BIGINT) AS x,
                           CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
                    FROM lineitem) t
              GROUP BY 1)
            SELECT l_returnflag,
                   CAST(n AS BIGINT) AS n_rows,
                   CAST(n*sxy - sx*sy AS DOUBLE)
                     / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
                   (CAST(sy AS DOUBLE)
                    - (CAST(n*sxy - sx*sy AS DOUBLE)
                       / CAST(n*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE) AS intercept,
                   CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)
                     / (CAST(n*sxx - sx*sx AS DOUBLE)
                        * CAST(n*syy - sy*sy AS DOUBLE)) AS r2
            FROM s
        """,
        # grouped skewness/kurtosis from exact integer raw moments
        # (HUGEINT keeps the scaled central moments exact at test scale)
        "skew_kurtosis_quantity_by_retflag": """
            WITH s AS (
              SELECT l_returnflag, count(*) AS n,
                     sum(x) AS s1, sum(x*x) AS s2,
                     sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
              FROM (SELECT l_returnflag,
                           CAST(floor(l_quantity) AS BIGINT) AS x
                    FROM lineitem) t
              GROUP BY 1),
            m AS (
              SELECT l_returnflag, n,
                     CAST(n AS HUGEINT)*s2 - CAST(s1 AS HUGEINT)*s1 AS m2,
                     CAST(n AS HUGEINT)*n*s3
                       - 3*CAST(n AS HUGEINT)*s1*s2
                       + 2*CAST(s1 AS HUGEINT)*s1*s1 AS m3,
                     CAST(n AS HUGEINT)*n*n*s4
                       - 4*CAST(n AS HUGEINT)*n*s1*s3
                       + 6*CAST(n AS HUGEINT)*s1*s1*s2
                       - 3*CAST(s1 AS HUGEINT)*s1*s1*s1 AS m4
              FROM s)
            SELECT l_returnflag,
                   CAST(n AS BIGINT) AS n_rows,
                   CAST(m3 AS DOUBLE)
                     / (CAST(m2 AS DOUBLE) * sqrt(CAST(m2 AS DOUBLE)))
                     AS skewness,
                   CAST(m4 AS DOUBLE) / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE))
                     - 3.0 AS kurtosis_excess
            FROM m
        """,
        # Gini over per-user spend; ties broken by user_id in both engines
        "gini_user_spend": """
            WITH spend AS (
              SELECT user_id,
                     sum(CAST(floor(value * 100) AS BIGINT)) AS x
              FROM events GROUP BY 1),
            r AS (SELECT x, row_number() OVER (ORDER BY x, user_id) AS rk
                  FROM spend),
            t AS (SELECT count(*) AS n, sum(x) AS sx, sum(rk * x) AS srx
                  FROM r)
            SELECT CAST(n AS BIGINT) AS n_users,
                   CAST(2*srx - (n+1)*sx AS DOUBLE)
                     / CAST(CAST(n AS HUGEINT) * sx AS DOUBLE) AS gini
            FROM t
        """,
        # per-group Gini; ranks partition by event_type, ties by user_id
        "gini_spend_by_type": """
            WITH spend AS (
              SELECT event_type, user_id,
                     sum(CAST(floor(value * 100) AS BIGINT)) AS x
              FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, x,
                         row_number() OVER (
                           PARTITION BY event_type ORDER BY x, user_id) AS rk
                  FROM spend),
            t AS (SELECT event_type, count(*) AS n, sum(x) AS sx,
                         sum(rk * x) AS srx
                  FROM r GROUP BY 1)
            SELECT event_type,
                   CAST(n AS BIGINT) AS n_users,
                   CAST(2*srx - (n+1)*sx AS DOUBLE)
                     / CAST(CAST(n AS HUGEINT) * sx AS DOUBLE) AS gini
            FROM t
        """,
        # Mann-Whitney: global row_number ranks over the combined sample,
        # tie order (value, event_id) pinned on both sides
        "mannwhitney_click_vs_purchase": """
            WITH s AS (
              SELECT event_type,
                     CAST(floor(value * 100) AS BIGINT) AS x, event_id
              FROM events WHERE event_type IN ('click', 'purchase')),
            r AS (SELECT event_type,
                         row_number() OVER (ORDER BY x, event_id) AS rk
                  FROM s),
            t AS (SELECT event_type, count(*) AS n, sum(rk) AS sr
                  FROM r GROUP BY 1)
            SELECT event_type,
                   CAST(n AS BIGINT) AS n_rows,
                   CAST(sr AS BIGINT) AS rank_sum,
                   CAST(sr - (CAST(n AS HUGEINT) * (n + 1)) // 2 AS BIGINT)
                     AS u_stat
            FROM t
        """,
        # Theil-T: integer micro-nat x*ln(x) terms summed exactly, float
        # tail operand-mirrored
        "theil_index_user_spend": """
            WITH spend AS (
              SELECT user_id,
                     sum(CAST(floor(value * 100) AS BIGINT)) AS x
              FROM events GROUP BY 1),
            t AS (SELECT count(*) AS n, sum(x) AS sx,
                         sum(CAST(floor(CAST(x AS DOUBLE)
                                        * ln(CAST(x AS DOUBLE))
                                        * 1000000.0) AS BIGINT)) AS sxl
                  FROM spend)
            SELECT CAST(n AS BIGINT) AS n_users,
                   (CAST(sxl AS DOUBLE) / 1000000.0)
                     / (CAST(n AS DOUBLE)
                        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                     - ln(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS theil_t
            FROM t
        """,
    }


# shingle-Jaccard pair CTE chain, shared by shingle_jaccard_docs and the
# dup_clusters_docs transitive-closure oracle (kept byte-identical so the
# two oracles agree on the pair predicate)
_SHINGLE_CTES = r"""words AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9'']+') AS w
              FROM documents
            ),
            sh AS (
              SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(w) < 3 THEN
                       CASE WHEN len(w) = 0 THEN [] ELSE [array_to_string(w, ' ')] END
                     ELSE list_transform(range(1, len(w) - 1),
                                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                END)) AS shingle
              FROM words
            ),
            rare AS (
              SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64
            ),
            rs AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
            sizes AS (SELECT doc_id, count(*) AS n FROM rs GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
              FROM rs a JOIN rs b USING (shingle)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2
            )"""

_KNN_EXACT_SQL = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 4),
    s AS (
      SELECT q.qid, e.vec_id,
             list_cosine_similarity(q.qv, e.embedding) AS sim
      FROM q CROSS JOIN embeddings e
    ),
    r AS (
      SELECT qid AS query_id, vec_id,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
      FROM s
    )
    SELECT query_id, vec_id FROM r WHERE rn <= 10
"""
