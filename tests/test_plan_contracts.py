"""Physical-plan contracts: the scale properties the engine promises
(broadcast small sides, one shuffle per hash aggregation, top-k without
a global sort, column pruning at the scan) pinned as tests so a future
change that silently degrades the plan — not just the answer — fails CI.

Assertions target coarse, stable plan features (operator presence /
exchange counts), not full plan text, so Spark-version formatting
changes don't break them.
"""

import pytest

from pdf_parser_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_top_customers_broadcasts_the_dim(spark):
    plan = _plan(spark, "top_customers")
    assert "BroadcastHashJoin" in plan
    # the fact side must NOT be shuffled for the join
    assert "SortMergeJoin" not in plan


def test_dedup_exact_single_shuffle_with_partial_agg(spark):
    plan = _plan(spark, "dedup_exact")
    assert plan.count("Exchange") <= 2  # hash shuffle (+AQE read)
    # map-side partial aggregation before the exchange
    assert plan.count("HashAggregate") >= 2


def test_windowed_host_stats_single_shuffle(spark):
    plan = _plan(spark, "windowed_host_stats")
    assert plan.count("Exchange") <= 2
    assert plan.count("HashAggregate") >= 2


def test_host_running_totals_no_global_sort(spark):
    plan = _plan(spark, "host_running_totals")
    assert "Window" in plan
    # partition-scoped sort only — a global orderBy would add a
    # rangepartitioning exchange
    assert "rangepartitioning" not in plan.lower()


def test_embedding_topk_avoids_global_sort(spark):
    plan = _plan(spark, "dedup_embedding")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_ann_queries_broadcast_query_side(spark):
    for name in ("ann_topk_bruteforce", "ann_ivf_bucketed"):
        plan = _plan(spark, name)
        assert "Broadcast" in plan, name


def test_scalar_chain_prunes_scan_columns(spark):
    plan = _plan(spark, "scalar_chain")
    # ReadSchema at the parquet scan must not drag the full row in
    start = plan.find("ReadSchema")
    assert start != -1
    schema_line = plan[start : plan.find("\n", start)]
    assert "l_comment" not in schema_line
    assert schema_line.count(",") <= 3


def test_bucketed_neardup_equi_join_no_cartesian(spark):
    """The scale-path near-dup must stay an equi-join on cell id — a
    plan regression to a cartesian/broadcast-nested-loop product is the
    100 TB failure mode this query exists to avoid."""
    for name in ("dedup_embedding_bucketed", "dedup_embedding_multiprobe"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
            "ShuffledHashJoin" in plan
        ), name


def test_repetition_score_partial_agg_and_pruned_scan(spark):
    plan = _plan(spark, "repetition_score")
    # count/count-distinct per doc: partial aggregation before the
    # exchange; both documents scans are pruned — the id-join side to
    # doc_id alone, the shingle side to (doc_id, text)
    assert plan.count("HashAggregate") >= 2
    schema_lines = [
        l for l in plan.splitlines() if l.strip().startswith("ReadSchema")
    ]
    assert schema_lines
    assert all("lang" not in l for l in schema_lines)
    assert any("text" in l for l in schema_lines)
    assert any("text" not in l for l in schema_lines)  # id-only side


def test_stream_twin_no_global_sort(spark):
    plan = _plan(spark, "dedup_stream_twin")
    assert "Window" in plan
    assert "rangepartitioning" not in plan.lower()


def test_dedup_pipeline_final_plan_constant_size(spark):
    """The iterative connected-components collapse must leave a final
    plan that reads only the localCheckpointed (id, comp) labels — no
    shingle explosion (Generate) or band self-join may leak into the
    decision-table plan, whatever the iteration count. At 100 TB this
    is the difference between a keeper election that joins two slim
    tables and one that re-runs the whole LSH DAG per downstream use."""
    plan = _plan(spark, "dedup_pipeline")
    assert "Generate" not in plan  # shingle/band explode collapsed
    assert "Scan ExistingRDD" in plan  # checkpointed labels
    # keeper election: docs2 ⋈ labels is a single equi-join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_host_cap_no_global_sort_two_scoped_windows(spark):
    """Both cap phases sort only within hash partitions — a global
    orderBy (rangepartitioning) would serialize the corpus through one
    range exchange at 100 TB."""
    plan = _plan(spark, "host_cap")
    assert "Window" in plan
    assert "rangepartitioning" not in plan.lower()
    schema_lines = [
        l for l in plan.splitlines() if l.strip().startswith("ReadSchema")
    ]
    # scan pruned to (doc_id, source) — never ships text into the cap
    assert schema_lines and all("text" not in l for l in schema_lines)


def test_chunk_docs_shuffle_free(spark):
    """Chunking is projection + explode only: any Exchange here means
    a regression copied the corpus across the wire to slice arrays."""
    plan = _plan(spark, "chunk_docs")
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode


def test_top_terms_vocab_only_window(spark):
    """tf/df aggregations partially aggregate map-side; the corpus
    count joins as a broadcast; no rangepartitioning anywhere."""
    plan = _plan(spark, "top_terms")
    assert plan.count("HashAggregate") >= 4  # partial+final × two rollups
    assert "BroadcastExchange" in plan
    assert "rangepartitioning" not in plan.lower()


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key with matching bucket counts
    must join with NO Exchange on either side (and, being sortBy'd, no
    extra Sort) — the co-located-join guarantee that removes the
    dominant shuffle of a 100 TB key-key join."""
    from pyspark.sql import functions as F

    from pdf_parser_spark.engine.bucketing import (
        cogrouped_join,
        write_bucketed,
    )

    left = spark.range(0, 1000).select(
        (F.col("id") % 37).cast("string").alias("host"), F.col("id").alias("l")
    )
    right = spark.range(0, 500).select(
        (F.col("id") % 37).cast("string").alias("host"), F.col("id").alias("r")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for name, df in (("bkt_left", left), ("bkt_right", right)):
            write_bucketed(
                df, name, "host", buckets=8, path=str(tmp_path / name)
            )
        joined = cogrouped_join(spark, "bkt_left", "bkt_right", "host")
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and the result is actually right
        assert joined.count() == sum(
            (1000 // 37 + (1 if h < 1000 % 37 else 0))
            * (500 // 37 + (1 if h < 500 % 37 else 0))
            for h in range(37)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_host_outlinks_single_shuffle_partial_agg(spark):
    plan = _plan(spark, "host_outlinks")
    # extract → explode → one hash shuffle with map-side partials
    assert plan.count("Exchange") <= 2
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_host_pagerank_constant_plan_after_checkpoint(spark):
    # ranks are localCheckpointed per iteration: the returned frame's
    # plan must be flat (scan of the checkpoint), not a 4-iteration
    # join tree — the property that keeps lineage bounded at any iters
    plan = _plan(spark, "host_pagerank")
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_host_quality_prior_broadcasts_rank_table(spark):
    # the doc side must not shuffle: rank table broadcasts
    plan = _plan(spark, "host_quality_prior")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_line_dedup_broadcasts_frequent_lines(spark):
    # the frequent-line (boilerplate) table is small → broadcast; the
    # exploded corpus line stream must never be sort-merge joined
    plan = _plan(spark, "line_dedup")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_broadcasts_benchmark_shingles(spark):
    plan = _plan(spark, "decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_model_quality_score_map_only(spark):
    # hashed linear scorer: a pure per-row fold — zero exchanges
    plan = _plan(spark, "model_quality_score")
    assert "Exchange" not in plan


def test_nfc_normalize_arrow_batched_map_only(spark):
    plan = _plan(spark, "nfc_normalize")
    assert "ArrowEvalPython" in plan  # pandas UDF, not row-at-a-time
    assert "Exchange" not in plan


def test_inverted_index_single_shuffle_no_expand(spark):
    # count(*) over pre-distinct (doc, term) pairs — no countDistinct
    # Expand, one hash shuffle with map-side partials
    plan = _plan(spark, "inverted_index")
    assert plan.count("Exchange") <= 2
    assert "Expand" not in plan


def test_pack_sequences_no_global_sort(spark):
    # per-(host, shard) prefix sum — a window sort, never a global
    # rangepartitioning exchange
    plan = _plan(spark, "pack_sequences")
    assert "Window" in plan
    assert "rangepartitioning" not in plan.lower()


def test_mix_corpus_broadcasts_thresholds(spark):
    plan = _plan(spark, "mix_corpus")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_substring_dup_spans_no_global_sort(spark):
    # island detection is a per-document window; the dup-gram join is
    # an honest shuffle join (the dup set scales with the corpus)
    plan = _plan(spark, "substring_dup_spans")
    assert "Window" in plan
    assert "rangepartitioning" not in plan.lower()


def test_unigram_surprisal_broadcasts_vocab(spark):
    plan = _plan(spark, "unigram_surprisal")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dsir_select_broadcasts_weight_table(spark):
    """DSIR's per-bucket weight table (≤ 4096 rows) must broadcast back
    onto the token stream; the only allowed nested-loop is the 1×1
    totals crossJoin. Token buckets must never sort-merge."""
    plan = _plan(spark, "dsir_select")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_single_shuffle_no_theta_join(spark):
    """The as-of join must stay union-merge: one hash exchange on the
    keys feeding a window sort — never the per-left-row range join
    (BroadcastNestedLoop / cartesian) the naive formulation plans."""
    plan = _plan(spark, "asof_join")
    assert "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_is_equi_hash_join(spark):
    """Bucketized interval join must plan a hash equi-join on
    (keys, bucket) with the interval predicate as a residual."""
    plan = _plan(spark, "range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_rollup_hypertable_single_expand_shuffle(spark):
    """GROUPING SETS = one Expand feeding one hash aggregation — not a
    union of per-granularity scans (which would double the exchanges)."""
    plan = _plan(spark, "rollup_hypertable")
    assert "Expand" in plan
    assert plan.count("Exchange") <= 2  # agg shuffle (+AQE read)
    # exactly one scan (formatted output names each scan twice:
    # once in the tree, once in the detail section)
    assert plan.count("ReadSchema") == 1


def test_bigram_surprisal_broadcasts_count_tables(spark):
    """The (bg → surprisal) vocab table must broadcast back onto the
    bigram stream; the corpus side must never sort-merge."""
    plan = _plan(spark, "bigram_surprisal")
    assert "BroadcastHashJoin" in plan


def test_bpe_pair_counts_no_global_sort(spark):
    plan = _plan(spark, "bpe_pair_counts")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_length_percentiles_no_global_sort(spark):
    plan = _plan(spark, "length_percentiles")
    assert "Window" in plan
    assert "rangepartitioning" not in plan.lower()


def test_mojibake_score_map_only(spark):
    # substring counting + replace chain: pure projection, no exchange,
    # no Python evaluator
    plan = _plan(spark, "mojibake_score")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_hll_distinct_bounded_aggregations(spark):
    # register fold = (group, bucket) hash agg, per-group harmonic sum =
    # second hash agg; partial state bounded by m=4096 per group. The
    # exact-distinct ride-along adds its Expand; no global sort anywhere.
    plan = _plan(spark, "hll_distinct")
    assert "HashAggregate" in plan
    assert "rangepartitioning" not in plan.lower()


def test_ann_topk_int8_broadcast_query_side(spark):
    # quantized brute-force twin keeps the broadcast-queries/streaming-
    # corpus shape: no shuffle of the corpus before scoring
    plan = _plan(spark, "ann_topk_int8")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_countmin_bounded_sketch_and_topk_cut(spark):
    # sketch build = hash aggregations (bounded d·w state); the top-20
    # probe cut is TakeOrderedAndProject, never a global sort exchange
    plan = _plan(spark, "countmin_freq")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_mix_temperature_broadcast_filter(spark):
    # threshold table broadcasts; the corpus side is a pure filter —
    # never shuffled for the join, no sort anywhere
    plan = _plan(spark, "mix_temperature")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "rangepartitioning" not in plan.lower()


def test_ann_ivf_int8_equi_join_on_cell(spark):
    # the candidate cut is a hash equi-join on the cell id, not a
    # nested-loop cross join
    plan = _plan(spark, "ann_ivf_int8")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_host_blocklist_is_map_only(spark):
    plan = _plan(spark, "host_blocklist")
    assert "Exchange" not in plan  # literal-list test: no join, no shuffle
    assert "Join" not in plan


def test_embed_project_is_map_only(spark):
    plan = _plan(spark, "embed_project")
    assert "Exchange" not in plan  # matrix rides as plan literals
    assert "Join" not in plan
    # column pruning: only vec_id + embedding leave the scan
    assert "label" not in plan.split("ReadSchema")[-1][:400]


def test_compaction_plan_partition_scoped_window(spark):
    plan = _plan(spark, "compaction_plan")
    assert "Window" in plan
    assert "rangepartitioning" not in plan.lower()  # no global sort
    assert plan.count("Exchange") <= 2


def test_snapshot_diff_prunes_scan_and_equi_joins(spark):
    plan = _plan(spark, "snapshot_diff")
    # equi-join on url (either strategy), never a nested-loop/cartesian
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    # payload never leaves the scans: only doc_id + text are read
    tail = plan.split("ReadSchema")[-1]
    assert "lang" not in tail[:400] and "source" not in tail[:400]


def test_bloom_prefilter_filter_is_inlined(spark):
    plan = _plan(spark, "bloom_prefilter")
    # membership test compiled into the plan (shift arithmetic), not a join
    assert "shiftright" in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_stream_join_twin_is_equi_join(spark):
    plan = _plan(spark, "stream_join_twin")
    # user_id equi-key carries the time residual — never a cross product
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "Join" in plan


def test_zorder_layout_is_map_only(spark):
    plan = _plan(spark, "zorder_layout")
    assert "Exchange" not in plan and "Join" not in plan


def test_bpe_tokenize_topk_without_unpartitioned_window(spark):
    """The apply-census top-20 must be TakeOrderedAndProject
    (per-partition top-k) with the rank Window running over only the
    20 survivors — never the full subword census through a single
    unpartitioned-Window task (vocab-bounded but millions of rows at
    crawl scale)."""
    plan = _plan(spark, "bpe_tokenize")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_training_order_sort_is_shard_partitioned(spark):
    """The training-order rank must run over hashpartitioning(shard),
    never an unpartitioned Window or a global range sort: the writer
    shape at scale is one exchange keyed on shards with per-shard
    sorts."""
    plan = _plan(spark, "training_order")
    assert "Window" in plan
    assert "hashpartitioning(shard" in plan
    assert "rangepartitioning" not in plan.lower()


def test_upsample_repeat_is_map_only(spark):
    """Epoch-repeat upsampling must be a pure map-side explode: no
    Exchange anywhere — copy counts derive from the row itself."""
    plan = _plan(spark, "upsample_repeat")
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode


def test_derived_shard_counts_bound_window_partitions(spark):
    """Scale contract of the derived n_shards default: as the corpus
    grows, the shard count grows so the max per-shard row count stays
    near the target instead of growing linearly with the corpus (the
    per-reducer sort that breaks first at 100x)."""
    from pyspark.sql import functions as F

    from pdf_parser_spark.functions.sampling import (
        derive_n_shards,
        training_order,
    )

    # pure arithmetic: floor at small scale, linear growth at large
    assert derive_n_shards(0, 1_000_000) == 16
    assert derive_n_shards(60_000, 1_000_000) == 16
    assert derive_n_shards(10**12, 1_000_000) == 10**6
    assert derive_n_shards(10**12 + 1, 1_000_000) == 10**6 + 1

    # executed: a 10x corpus growth with a small target keeps the max
    # per-shard row count within hash variance of the target, because
    # the shard count scales instead of the shard size
    small = spark.range(800).withColumnRenamed("id", "doc_id")
    big = spark.range(8000).withColumnRenamed("id", "doc_id")
    target = 100
    caps = {}
    for name, df in (("small", small), ("big", big)):
        shards = training_order(
            df, key_col="doc_id", target_docs_per_shard=target
        )
        per = shards.groupBy("shard").count()
        caps[name] = per.agg(F.max("count")).collect()[0][0]
        n = per.count()
        assert n >= df.count() // target, f"{name}: too few shards ({n})"
    # both scales stay near the target (generous 3x hash-variance bound)
    assert caps["small"] <= 3 * target
    assert caps["big"] <= 3 * target


def test_pack_sequences_derived_shards_bound_token_windows(spark):
    """pack_sequences' derived shard count keeps the per-(host, shard)
    prefix-sum window's token total near the target as the corpus
    scales."""
    from pyspark.sql import functions as F

    from pdf_parser_spark.functions.packing import pack_sequences

    def corpus(n):
        return (
            spark.range(n)
            .withColumnRenamed("id", "doc_id")
            .withColumn("host", F.concat(F.lit("h"), F.col("doc_id") % 4))
            .withColumn("text", F.lit("one two three four five"))
        )

    target = 500  # tokens per shard (5 tokens/doc)
    for n in (400, 4000):
        placed = pack_sequences(
            corpus(n), seq_len=64, target_tokens_per_shard=target
        )
        per = placed.groupBy("host", "shard").agg(
            F.sum("n_tokens").alias("toks")
        )
        # each (host, shard) window holds ~target/hosts tokens; bound
        # the max generously — the point is it does NOT grow 10x with n
        cap = per.agg(F.max("toks")).collect()[0][0]
        assert cap <= 3 * target, (n, cap)


def test_gopher_rules_map_only(spark):
    # every signal is an array expression over the doc's own lines:
    # the whole query must run without a single exchange
    plan = _plan(spark, "gopher_rules")
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan


def test_paragraph_dedup_hash_equi_join_never_cartesian(spark):
    # the keeper join must stay a HASH EQUI-join on md5(para) — never
    # a cartesian/nested-loop, never a global sort. At sf0.001 the
    # stats-based planner broadcasts the (currently tiny) keeper side;
    # at corpus scale the same equi-join becomes a shuffle join — both
    # are the honest shapes, so the contract pins the join KIND only.
    plan = _plan(spark, "paragraph_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "rangepartitioning" not in plan.lower()


def test_robots_gate_broadcasts_rules_no_cartesian(spark):
    """The rule table must broadcast against the corpus (rules are
    per-host, tiny) and the RFC winner must be a hash aggregate —
    no sort-merge join, no cartesian, no global sort."""
    plan = _plan(spark, "robots_gate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Cartesian" not in plan
    assert "rangepartitioning" not in plan.lower()


def test_crawl_schedule_broadcast_meta_host_window(spark):
    """Politeness metadata (one row per host) must broadcast against
    the corpus, and the slot assignment must be a host-partitioned
    window — never a rangepartitioning (global sort) exchange."""
    plan = _plan(spark, "crawl_schedule")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Cartesian" not in plan
    assert "rangepartitioning" not in plan.lower()


def test_soft404_filter_map_only(spark):
    """Phrase scoring is pure projection: any Exchange means the
    scorer stopped being a map-side expression."""
    plan = _plan(spark, "soft404_filter")
    assert "Exchange" not in plan


def test_wet_export_map_only(spark):
    """The export manifest is JVM string concatenation over the scan:
    no Exchange, no Python stage."""
    plan = _plan(spark, "wet_export")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
