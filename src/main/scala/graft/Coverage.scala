package graft

/** SURVEY.md §2 component → oracle-gate coverage map, so any round's driver
  * output can self-report per-component correctness instead of reconstructing
  * the mapping from verdict archaeology. Keys 01–43 are the same
  * 43-component enumeration the round verdicts audit (SURVEY §2.1–§2.5 +
  * the CLI front-end); the `llm:` keys are the LLM-training-data operator
  * families graded alongside them; `extra:` keys are capability families
  * beyond the reference (relational/streaming/lakehouse analytics) that the
  * remaining gates exercise.
  *
  * Invariant (spec-checked): every name below is a key of
  * [[SparkEntry.queries]], and every query appears in at least one component.
  */
object Coverage {

  val components: Map[String, Seq[String]] = Map(
    "01 HybridSplitAssigner (chunk->log phase switch)" ->
      Seq("c_incremental", "c_incremental_jdbc"),
    "02 SnapshotSplitAssigner (chunk plan, HW tracking, resume)" ->
      Seq("c_incremental", "c_savepoint_kill", "c_snapshot"),
    "03 StreamSplitAssigner (log start position)" ->
      Seq("c_startup_offset"),
    "04 JdbcSourceChunkSplitter (even/uneven chunking)" ->
      Seq("c_chunks", "c_chunk_boundaries"),
    "05 AbstractScanFetchTask (LW/HW + backfill)" ->
      Seq("c_incremental"),
    "06 IncrementalSourceStreamFetcher (per-chunk HW suppression)" ->
      Seq("c_incremental", "c_stream_ddl"),
    "07 Startup modes (initial/snapshot/earliest/latest/offset/timestamp/committed/GTID)" ->
      Seq("c_startup_offset", "c_startup_committed", "c_startup_gtid"),
    "08 MySQL pipeline source (binlog, DDL->SchemaChangeEvent, multi-clause ALTER)" ->
      Seq("c_mysql_socket", "c_debezium_file", "c_ddl_evolution", "c_stream_ddl",
        "c_startup_gtid", "c_multiclause_alter"),
    "09 MySQL type mapping (unsigned widening, TINYINT(1), JSON, TIME)" ->
      Seq("t_timestamp_tz"),
    "10 Generic 9-DB dialect source builder" ->
      Seq("c_mysql_socket", "c_postgres_socket", "c_postgres_pgoutput", "c_postgres_wire",
        "c_postgres_file", "c_pgoutput_truncate", "c_mongo_socket", "c_mongo_style",
        "c_sqlserver_ct", "c_sqlserver_migration", "c_oracle_logminer", "c_db2_asn",
        "c_vitess_vgtid", "c_vitess_reshard", "c_tidb_resolved", "c_multi_source_merge"),
    "11 ValuesDataSource (scripted fixtures)" ->
      Seq("c_snapshot", "c_incremental"),
    "12 PreTransformOperator (column pruning)" ->
      Seq("t_projection"),
    "13 PostTransformOperator (projection/filter both images, multi-rule dispatch)" ->
      Seq("t_projection", "t_filter", "c_conformance_calculated_columns",
        "c_conformance_wildcard_evolution", "c_conformance_multi_dispatch",
        "c_conformance_dispatch_ref_cols", "c_conformance_schema_nullability",
        "c_conformance_multi_transform_asterisk",
        "c_conformance_multi_transform_missing_proj",
        "c_conformance_multi_transform_null_empty_asterisk",
        "c_conformance_multi_transform_incompatible",
        "c_conformance_merging_incompatible_rules",
        // round 17: e2e transform crossings
        "c_e2e_transform_hetero", "c_e2e_multiple_hitting",
        "c_e2e_transform_cast", "c_e2e_bypass_transform",
        "c_e2e_evolving_transform_evolve"),
    "14 Projection spec (* expansion, computed cols)" ->
      Seq("t_projection", "c_conformance_calculated_columns",
        "c_conformance_multi_ref_projection", "c_conformance_large_literals",
        "c_e2e_transform_evolution"),
    "15 Filter spec (original + computed cols)" ->
      Seq("t_filter", "c_conformance_filter_rules", "c_conformance_multi_ref_filter"),
    "16 Metadata columns" ->
      Seq("t_metadata", "c_conformance_metadata_wildcard",
        "c_conformance_metadata_literal", "c_conformance_column_name_map"),
    "17 SchemaMetadataTransform (PK/partition/options override)" ->
      Seq("c_cli_pipeline", "c_conformance_metadata_info",
        "c_conformance_metadata_info_unchanged",
        "c_conformance_explicit_pk_nullable"),
    "18 SoftDeleteConverter" ->
      Seq("t_soft_delete"),
    "19 UDF surface (0-6-arg typed eval, lifecycle, ScalarFunction-shaped, typed returns)" ->
      Seq("t_udf", "t_udf2", "c_conformance_udf_lifecycle",
        "c_conformance_udf_return_types", "c_conformance_udf_flink_transform",
        "c_conformance_complicated_udf"),
    "20 Model functions (AI_CHAT_PREDICT, GET_EMBEDDING, AI_LANGCHAIN_PREDICT)" ->
      Seq("t_model_chat", "t_model_embedding", "t_model_langchain",
        "c_conformance_transform_model"),
    "21 SchemaOperator (evolve + coerce data path)" ->
      Seq("c_ddl_evolution", "c_schema_coerce", "c_conformance_schema_evolution"),
    "22 SchemaCoordinator -> micro-batch flush barrier" ->
      Seq("c_ddl_evolution", "c_stream_ddl", "c_multiclause_alter"),
    "23 SchemaDerivator (lenient-ize, coerce, merged CREATE, deduce-diff)" ->
      Seq("c_ddl_evolution", "s_lenient_union",
        "c_conformance_lenient_single_table", "c_conformance_merge_route",
        "c_conformance_lenient_evolves", "c_conformance_fine_grained",
        "c_conformance_lenient_tweaks",
        "c_e2e_evolving_transform_merge", "c_e2e_lenient_route"),
    "24 Schema merging/widening lattice" ->
      Seq("s_lenient_union", "c_conformance_merge_route"),
    "25 Behaviors (IGNORE/LENIENT/TRY_EVOLVE/EVOLVE/EXCEPTION)" ->
      Seq("c_ddl_evolution", "c_conformance_single_table",
        "c_conformance_lenient_single_table", "c_conformance_ignore_behavior",
        "c_conformance_exception_behavior", "c_conformance_try_evolve_behavior",
        "c_conformance_try_evolve_failure", "c_conformance_evolve_failure",
        // round 17: the SchemaEvolvingTransformE2e behavior matrix
        "c_e2e_evolving_transform_evolve", "c_e2e_evolving_transform_merge",
        "c_e2e_evolving_transform_evolve_error",
        "c_e2e_evolving_transform_try_evolve_error",
        "c_e2e_evolving_transform_ignore", "c_e2e_evolving_transform_exception",
        "c_e2e_evolving_transform_lenient", "c_e2e_evolving_transform_fine_grained",
        "c_e2e_unexpected_behavior"),
    "26 Sink-side schema-change type filtering (TAG grammar + fine-grained support)" ->
      Seq("c_cli_pipeline", "c_conformance_fine_grained",
        "c_e2e_evolving_transform_fine_grained"),
    "27 TableIdRouter + Selectors (rename/merge/<>)" ->
      Seq("c_route", "c_multi_source_merge",
        "c_conformance_route_one_to_one", "c_conformance_route_replace",
        "c_conformance_merge_route",
        // round 17: the YAML-driven RouteE2eITCase tree
        "c_e2e_route_default", "c_e2e_route_merge", "c_e2e_route_partial",
        "c_e2e_route_multiple", "c_e2e_route_one_to_many",
        "c_e2e_route_merge_transform", "c_e2e_route_replace_symbol",
        "c_e2e_route_extreme", "c_e2e_route_extreme_stream"),
    "28 Distributed schema variant" ->
      Seq("c_multi_source_merge", "c_conformance_parallelized_single",
        "c_conformance_parallelized_multi",
        "c_conformance_distributed_runner_multi",
        "c_conformance_distributed_interleaved",
        "c_conformance_distributed_ignore",
        "c_conformance_distributed_exception",
        "c_conformance_regular_parallelism",
        "c_conformance_regular_merged",
        "c_conformance_distributed_lenient",
        "c_conformance_distributed_ignore_trim",
        "c_conformance_unixtime_functions", "c_conformance_to_timestamp",
        "c_conformance_schema_nullability",
        "c_conformance_mid_asterisk_evolution"),
    "29 Batch schema variant + runtime-mode BATCH" ->
      Seq("c_schema_coerce", "c_conformance_batch_single_table",
        "c_conformance_batch_transform", "c_conformance_batch_multi_tables",
        "c_conformance_batch_transform_twice", "c_conformance_batch_merge_route",
        "c_conformance_batch_transform_merge",
        "c_conformance_batch_streaming_mode", "c_conformance_batch_multi_splits",
        "c_conformance_batch_two_transform", "c_conformance_batch_optype_metadata",
        "c_conformance_batch_route_one_to_one",
        "c_conformance_batch_route_identical",
        // round 17: RouteE2e batch-mode params (snapshot + BATCH runtime)
        "c_e2e_route_default_batch", "c_e2e_route_merge_batch",
        "c_e2e_route_partial_batch", "c_e2e_route_multiple_batch",
        "c_e2e_route_one_to_many_batch", "c_e2e_route_merge_transform_batch",
        "c_e2e_route_replace_symbol_batch", "c_e2e_route_extreme",
        "c_e2e_transform_hetero_batch", "c_e2e_multiple_hitting_batch"),
    "30 PK-hash pre-partition" ->
      Seq("c_upsert"),
    "31 EventPartitioner / per-key ordered delivery" ->
      Seq("c_upsert", "c_deleted_keys"),
    "32 DataSink SPI (writer + MetadataApplier)" ->
      Seq("c_upsert"),
    "33 DataSinkWriterOperator (flush@boundary, restore, replay-skip, 2PC)" ->
      Seq("c_jdbc_2pc", "c_savepoint_kill"),
    "34 Concrete sinks (12-connector inventory + interchange formats)" ->
      Seq("c_delta_interchange", "c_delta_mirror", "c_delta_cdf", "c_delta_checkpoint",
        "c_delta_colmap_import", "c_delta_dv_import", "c_delta_partitioned_cdf",
        "c_delta_partitioned_mirror", "c_iceberg_interchange", "c_iceberg_mirror",
        "c_iceberg_mor", "c_iceberg_partitioned", "c_iceberg_partitioned_mirror",
        "c_iceberg_v1_import", "c_iceberg_bucket_import", "c_iceberg_rename_import",
        "c_iceberg_v3_dv", "c_iceberg_v3_defaults",
        "c_paimon_interchange", "c_paimon_mirror", "c_paimon_append",
        "c_paimon_append_mirror", "c_paimon_changelog", "c_paimon_compact",
        "c_paimon_delta", "c_paimon_partitioned", "c_paimon_partitioned_changelog",
        "c_paimon_partitioned_mirror", "c_part_mirror_copy", "c_time_travel_import",
        "c_pipeline_delta_sink", "c_pipeline_iceberg_sink", "c_pipeline_paimon_sink",
        "c_es_sink", "c_starrocks_sink", "c_maxcompute_sink", "c_fluss_sink",
        "c_oceanbase_sink", "c_jdbc_2pc", "c_upsert"),
    "35 Kafka sink formats + wire protocol + topic change source" ->
      Seq("c_kafka_pipeline_sink", "c_kafka_stream_source", "c_kafka_source",
        "t_kafka_debezium", "t_kafka_canal", "c_e2e_kafka_debezium_schema"),
    "36 ValuesDataSink / PK-upsert materializer" ->
      Seq("c_upsert", "c_deleted_keys"),
    "37 Comparison ops (LIKE-as-regex + ESCAPE, BETWEEN, IN)" ->
      Seq("t_filter", "t_like_regex"),
    "38 Logical ops" ->
      Seq("t_filter"),
    "39 Arithmetic/math (type-preserving CEIL/FLOOR/ROUND/ABS)" ->
      Seq("t_arith", "c_conformance_floor_ceil_round", "c_conformance_abs_function"),
    "40 String fns (incl. SUBSTR/SUBSTRING edges)" ->
      Seq("t_projection", "t_json_path", "c_conformance_string_functions",
        "c_conformance_substring_functions"),
    "41 Temporal fns (epoch-bound tz-aware NOW family, SDF DATE_FORMAT, FROM_UNIXTIME/UNIX_TIMESTAMP)" ->
      Seq("t_temporal", "t_timestamp_tz", "c_conformance_temporal_functions",
        "c_conformance_timestamp_formats", "c_conformance_unixtime_functions",
        "c_conformance_to_timestamp"),
    "42 Conditional (CASE, COALESCE, IF, NULLIF)" ->
      Seq("t_conditional", "c_conformance_conditional_functions"),
    "43 CAST matrix (ANSI overflow)" ->
      Seq("t_cast"),
    "44 CLI front-end (global-config, -D, savepoints, uid manifests)" ->
      Seq("c_cli_pipeline", "c_savepoint_kill"),
    "45 Reference conformance corpus (composer/transform ITCase event scripts)" ->
      Seq("c_conformance_single_table", "c_conformance_lenient_single_table",
        "c_conformance_multi_tables", "c_conformance_multi_splits",
        "c_conformance_route_one_to_one", "c_conformance_route_replace",
        "c_conformance_merge_route", "c_conformance_schema_evolution",
        "c_conformance_wildcard_evolution", "c_conformance_calculated_columns",
        "c_conformance_filter_rules", "c_conformance_multi_dispatch",
        "c_conformance_dispatch_ref_cols", "c_conformance_metadata_wildcard",
        "c_conformance_metadata_literal",
        // round 14: transform × schema-evolution interplay, fallback rules,
        // column shading, dialect function/cast blocks, precision merging
        "c_conformance_fallback_rules", "c_conformance_explicit_evolution",
        "c_conformance_pre_asterisk_evolution", "c_conformance_post_asterisk_evolution",
        "c_conformance_unmatched_evolution", "c_conformance_shade_different_type",
        "c_conformance_comparison_functions", "c_conformance_numeric_castings",
        "c_conformance_merge_decimal_precisions",
        "c_conformance_merge_temporal_precisions",
        "c_conformance_delete_as_insert", "c_conformance_logical_functions",
        "c_conformance_string_functions", "c_conformance_filter_no_projection",
        "c_conformance_datetime_casting", "c_conformance_lenient_merge_route",
        "c_conformance_transform_merge_route", "c_conformance_arithmetic_functions",
        "c_conformance_udf_transform", "c_conformance_udf_filter",
        "c_conformance_batch_single_table", "c_conformance_batch_transform",
        "c_conformance_lenient_optype_metadata", "c_conformance_lenient_transform_twice",
        "c_conformance_ignore_behavior",
        // round 15: change-order merge twin + event-SEQUENCE assertions
        // (image pairs, op order) on the richest existing gates + the
        // epoch-bound tz-aware temporal-function block
        "c_conformance_merge_change_order", "c_conformance_temporal_functions",
        "c_conformance_substring_functions", "c_conformance_conditional_functions",
        "c_conformance_udf_overloaded", "c_conformance_udf_lifecycle",
        "c_conformance_udf_typehint", "c_conformance_udf_flink_transform",
        "c_conformance_udf_flink_filter", "c_conformance_udf_flink_overloaded",
        "c_conformance_batch_multi_tables", "c_conformance_batch_transform_twice",
        "c_conformance_batch_merge_route", "c_conformance_batch_transform_merge",
        "c_conformance_parallelized_single", "c_conformance_parallelized_multi",
        "c_conformance_lenient_default_value", "c_conformance_lenient_transform",
        "c_conformance_transform_merge_events", "c_conformance_route_identical",
        "c_conformance_udf_return_types", "c_conformance_column_name_map",
        "c_conformance_floor_ceil_round", "c_conformance_abs_function",
        "c_conformance_timestamp_formats", "c_conformance_comments_default_expr",
        "c_conformance_exception_behavior", "c_conformance_try_evolve_behavior",
        "c_conformance_try_evolve_failure", "c_conformance_evolve_failure",
        "c_conformance_metadata_info",
        // round 16: multi-transform interaction block + literal typing
        "c_conformance_multi_ref_projection", "c_conformance_multi_ref_filter",
        "c_conformance_multi_transform_asterisk",
        "c_conformance_multi_transform_missing_proj",
        "c_conformance_multi_transform_null_empty_asterisk",
        "c_conformance_multi_transform_incompatible",
        "c_conformance_merging_incompatible_rules",
        "c_conformance_large_literals",
        // round 16: parallelized variants through the REAL streaming runner
        "c_conformance_distributed_runner_multi",
        // round 17: round-robin interleaved drain
        "c_conformance_distributed_interleaved",
        "c_conformance_distributed_ignore",
        "c_conformance_distributed_exception",
        "c_conformance_regular_parallelism",
        "c_conformance_regular_merged",
        "c_conformance_distributed_lenient",
        "c_conformance_distributed_ignore_trim",
        // round 16: UdfITCase completion
        "c_conformance_complicated_udf", "c_conformance_transform_model",
        // round 16: fine-grained sink-supported types + tolerant coercion
        "c_conformance_fine_grained", "c_conformance_lenient_evolves",
        "c_conformance_lenient_tweaks",
        // round 16: unicode + error-path + metadata-surface gates
        "c_conformance_unicode_projection", "c_conformance_unicode_filter",
        "c_conformance_unicode_matrix", "c_conformance_transform_error_message",
        "c_conformance_metadata_info_unchanged",
        "c_conformance_explicit_pk_nullable",
        // round 16: batch composer breadth
        "c_conformance_batch_streaming_mode",
        "c_conformance_batch_multi_splits",
        "c_conformance_batch_two_transform",
        "c_conformance_batch_optype_metadata",
        "c_conformance_batch_route_one_to_one",
        "c_conformance_batch_route_identical",
        // round 17: the YAML e2e tree (RouteE2eITCase ×15, run through the
        // parsed-YAML PipelineRunner — stream + batch params)
        "c_e2e_route_default", "c_e2e_route_default_batch",
        "c_e2e_route_merge", "c_e2e_route_merge_batch",
        "c_e2e_route_partial", "c_e2e_route_partial_batch",
        "c_e2e_route_multiple", "c_e2e_route_multiple_batch",
        "c_e2e_route_one_to_many", "c_e2e_route_one_to_many_batch",
        "c_e2e_route_merge_transform", "c_e2e_route_merge_transform_batch",
        "c_e2e_route_replace_symbol", "c_e2e_route_replace_symbol_batch",
        "c_e2e_route_extreme", "c_e2e_route_extreme_stream",
        // round 17: SchemaEvolvingTransformE2e + TransformE2e/SchemaEvolveE2e
        // remainder (subsumption citations in QueriesE2e.scala)
        "c_e2e_evolving_transform_evolve", "c_e2e_evolving_transform_merge",
        "c_e2e_evolving_transform_evolve_error",
        "c_e2e_evolving_transform_try_evolve_error",
        "c_e2e_evolving_transform_ignore", "c_e2e_evolving_transform_exception",
        "c_e2e_evolving_transform_lenient", "c_e2e_evolving_transform_fine_grained",
        "c_e2e_unexpected_behavior",
        "c_e2e_transform_hetero", "c_e2e_transform_hetero_batch",
        "c_e2e_multiple_hitting", "c_e2e_multiple_hitting_batch",
        "c_e2e_transform_cast", "c_e2e_transform_evolution",
        "c_e2e_lenient_route", "c_e2e_bypass_transform",
        "c_e2e_kafka_debezium_schema"),

    "llm: exact/span/incremental dedup + clustering + canonical" ->
      Seq("d_exact_fingerprint", "d_span_dedup", "d_dup_spans", "d_incremental_dedup",
        "d_dup_clusters", "d_dup_canonical", "x_fingerprint"),
    "llm: MinHash-LSH / SimHash / n-gram / embedding near-dup / SemDeDup" ->
      Seq("d_minhash_lsh", "d_simhash", "d_ngram_jaccard", "d_embedding_dup",
        "d_semdedup", "d_incremental_lsh"),
    "llm: ANN (brute/LSH/IVF/PQ/IVF-PQ/filtered/incremental)" ->
      Seq("a_ann_bruteforce", "a_ann_lsh_self", "a_ann_ivf_self", "a_ann_pq_self",
        "a_ann_ivfpq_self", "a_ann_ivf_filtered", "a_ann_ivf_filtered_disk",
        "a_ann_incremental", "a_embed_centroids"),
    "llm: inverted index / BM25 / phrase / fuzzy / hybrid retrieval" ->
      Seq("x_inverted_index", "x_phrase_search", "x_fuzzy_lookup", "x_bm25_search",
        "x_hybrid_search"),
    "llm: materialized rollup + HLL approx-distinct" ->
      Seq("s_rollup_view", "s_rollup_distinct"),
    "llm: BPE tokenizer / perplexity LM / Naive Bayes" ->
      Seq("x_bpe", "x_perplexity_lm", "x_nb_classify"),
    "llm: text analysis (tokens/quality/langid/repetition/stats/TF-IDF)" ->
      Seq("x_tokens", "x_quality", "x_langid", "x_repetition", "x_corpus_stats",
        "x_tfidf"),
    "llm: mixture sampling / shard shuffle / boilerplate" ->
      Seq("x_mix_budget", "x_shard_shuffle", "x_boilerplate",
        "x_sample_stratified", "x_sample_topk"),
    "llm: curation (PII, packing, decontam, chunking, e2e, continuous)" ->
      Seq("x_pii_redact", "x_pack_bins", "x_decontam", "x_chunk_windows",
        "x_curate_e2e", "x_curate_continuous"),
    "llm: multimodal (codecs, features, frames, resize)" ->
      Seq("m_media_features", "m_media_frames", "m_media_resize"),

    "extra: relational core (TPC-H-ish + window/percentile/topk)" ->
      Seq("q1_agg", "q3_join", "q4_order_priority", "q5_local_supplier", "q10_returned",
        "q12_priority_class", "q18_large_orders", "q_window", "q_topk", "q_percentiles",
        "q_events_daily", "q_lead_lag", "q_moving_range"),
    "extra: relational ops (joins/setops/rollup/pivot/subquery/arrays)" ->
      Seq("r_semi_join", "r_anti_join", "r_asof_join", "r_range_join", "r_setops",
        "r_rollup", "r_cube", "r_grouping_sets", "r_pivot", "r_unpivot", "r_subquery",
        "r_exists_corr", "r_arrays"),
    "extra: streaming analytics (sessionize/dedup/join/windows/enrich)" ->
      Seq("s_sessionize", "s_stream_dedup", "s_stream_join", "s_windowed_counts",
        "s_enrich"),
    "extra: lakehouse analytics (append/upsert/agg/zorder/bloom/streams)" ->
      Seq("c_lakehouse_append", "c_lakehouse_upsert", "c_lakehouse_agg",
        "c_lakehouse_zorder", "c_lakehouse_bloom", "c_lakehouse_concurrent",
        "c_lakehouse_mor_delete", "c_lakehouse_out_of_order",
        "c_lakehouse_partial_update", "s_lakehouse_cdf", "s_lakehouse_changelog",
        "s_lakehouse_changelog_stream", "s_lakehouse_stream", "c_bucketed_join"))
}
