"""Physical-plan assertions: the plans we designed for must materialize
(pushdown, broadcast, partial agg / map-side combine, codegen)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_spark_pspd_spark.catalog import Tables
from hadoop_spark_pspd_spark.operators.relational import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier_volume,
)
from hadoop_spark_pspd_spark.operators.wordcount import wc_words
from hadoop_spark_pspd_spark.plans.checks import (
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregate,
    has_pushed_filters,
    has_wholestage_codegen,
)

from conftest import SF_SMOKE


def test_filter_pushdown_reaches_parquet(spark):
    t = Tables(spark, SF_SMOKE)
    df = t.lineitem.filter(F.col("l_quantity") > 30).select("l_orderkey")
    assert has_pushed_filters(df)
    plan = formatted_plan(df)
    # column pruning: scan must read only the 2 needed columns
    assert "l_extendedprice" not in plan


def test_q1_partial_aggregate_and_codegen(spark):
    df = q1_pricing_summary(spark, SF_SMOKE)
    assert has_partial_aggregate(df)  # the reference's combiner analog
    assert has_wholestage_codegen(df)
    assert has_pushed_filters(df)  # shipdate filter reaches the scan


def test_join_queries_broadcast_dims(spark):
    assert has_broadcast_join(q3_shipping_priority(spark, SF_SMOKE))
    assert has_broadcast_join(q5_local_supplier_volume(spark, SF_SMOKE))


def test_wordcount_is_partial_final_agg(spark):
    df = wc_words(spark, SF_SMOKE)
    assert has_partial_aggregate(df)
    assert has_wholestage_codegen(df)


def test_tpch_shapes_broadcast_all_dims(spark):
    from hadoop_spark_pspd_spark.operators.tpch_like import (
        q7_nation_volume,
        q8_market_share,
        q10_returned_items,
        q15_top_supplier,
        q22_idle_customers,
    )

    for q in (
        q7_nation_volume,
        q8_market_share,
        q10_returned_items,
        q15_top_supplier,
        q22_idle_customers,
    ):
        df = q(spark, SF_SMOKE)
        assert has_broadcast_join(df), q.__name__
        # dims broadcast => the only SortMergeJoin allowed is fact-fact
        plan = formatted_plan(df)
        assert plan.count("SortMergeJoin") <= 1, q.__name__


def test_q10_date_filter_pushdown(spark):
    from hadoop_spark_pspd_spark.operators.tpch_like import q10_returned_items

    assert has_pushed_filters(q10_returned_items(spark, SF_SMOKE))


def test_asof_join_is_joinless_single_window(spark):
    """The union+window as-of strategy must not plan a join at all — the
    whole point is resolving each event without fanout."""
    from hadoop_spark_pspd_spark.operators.advanced import q_asof_join

    plan = formatted_plan(q_asof_join(spark, SF_SMOKE))
    assert "Window" in plan
    assert "Join" not in plan
    assert "Union" in plan


def test_dynamic_partition_pruning(spark, tmp_path):
    """A dim-filtered star join on a fact's partition column must prune
    fact partitions at runtime (the 100 TB path: scan only joined shards)."""
    t = Tables(spark, SF_SMOKE)
    fact_dir = str(tmp_path / "orders_by_status")
    t.orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(
        fact_dir
    )
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("O", 1), ("F", 0)], "status string, flag int"
    ).filter(F.col("flag") == 1)
    df = fact.join(dim, fact["o_orderstatus"] == dim["status"])
    plan = formatted_plan(df)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_runtime_bloom_filter_join(spark):
    """With a selective creation side and a shuffle join, the runtime
    bloom-filter rule pushes might_contain into the probe side. The
    probe-side scan-size threshold (10GB default — sized for real
    clusters) is lowered so test-scale data qualifies."""
    t = Tables(spark, SF_SMOKE)
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sel_orders = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
        df = (
            t.lineitem.join(
                sel_orders, F.col("l_orderkey") == F.col("o_orderkey")
            )
            .groupBy("l_returnflag")
            .count()
        )
        plan = formatted_plan(df)
        assert "might_contain" in plan, plan[:3000]
    finally:
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold"
        )
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_tpch2_shapes_broadcast_all_dims(spark):
    """Part-2 TPC-H family: every dim join broadcasts; at most the one
    fact-fact join may sort-merge."""
    from hadoop_spark_pspd_spark.operators.tpch_like2 import (
        q2_min_cost_supplier,
        q9_product_profit,
        q11_important_parts,
        q16_supplier_cnt,
        q20_promo_suppliers,
    )

    for q in (
        q2_min_cost_supplier,
        q9_product_profit,
        q11_important_parts,
        q16_supplier_cnt,
        q20_promo_suppliers,
    ):
        df = q(spark, SF_SMOKE)
        assert has_broadcast_join(df), q.__name__
        plan = formatted_plan(df)
        assert plan.count("SortMergeJoin") <= 1, q.__name__


def _shuffle_exchanges(plan: str) -> int:
    """Unique shuffle-Exchange operators (details section lists each op
    once as '(N) Exchange'; BroadcastExchange doesn't match)."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange$", plan, flags=re.M))


def test_q21_single_fact_shuffle(spark):
    """Q21's EXISTS/NOT-EXISTS collapse: both window distinct-counts and
    the order join share ONE orderkey shuffle; only the tiny final
    per-supplier agg adds another."""
    from hadoop_spark_pspd_spark.operators.tpch_like2 import (
        q21_waiting_suppliers,
    )

    plan = formatted_plan(q21_waiting_suppliers(spark, SF_SMOKE))
    assert "Window" in plan
    assert _shuffle_exchanges(plan) <= 2, plan[:2000]


def test_q17_single_scan_window_decorrelation(spark):
    """Q17's correlated-avg threshold is a window, not an agg+self-join:
    exactly one lineitem scan in the plan."""
    from hadoop_spark_pspd_spark.operators.tpch_like2 import (
        q17_small_qty_revenue,
    )

    plan = formatted_plan(q17_small_qty_revenue(spark, SF_SMOKE))
    assert plan.count("lineitem.parquet") <= 1, plan[:2000]
    assert "Window" in plan


def test_bucketed_fact_join_zero_exchange(spark):
    """Bucket co-location must eliminate the join shuffle entirely; the
    registered aggregate on top keeps SMJ with no Exchange below it."""
    from hadoop_spark_pspd_spark.operators.bucketing import (
        bucketed_fact_join,
        q_bucketed_join,
    )

    join_plan = formatted_plan(bucketed_fact_join(spark, SF_SMOKE))
    assert "SortMergeJoin" in join_plan
    assert "Exchange" not in join_plan, "bucketed join must not shuffle"

    full_plan = formatted_plan(q_bucketed_join(spark, SF_SMOKE))
    assert "SortMergeJoin" in full_plan
    # exactly one shuffle: the final small aggregate, above the join
    assert full_plan.count(") Exchange") == 1
    assert "hashpartitioning(o_orderpriority" in full_plan


def test_pack_shards_no_global_window_over_corpus(spark):
    """The two-level prefix sum must not plan a corpus-sized
    single-partition window: the per-doc window is partitioned by
    bucket; only the per-bucket offsets (n_buckets rows) may run
    unpartitioned."""
    from hadoop_spark_pspd_spark.operators.text_curation import (
        text_pack_shards,
    )

    plan = formatted_plan(text_pack_shards(spark, SF_SMOKE))
    import re

    # every Window's partition spec: the doc-level window carries
    # the bucket partition key; offsets window is the only bare one
    specs = re.findall(r"Arguments: \[[^\]]*\], \[([^\]]*)\]", plan)
    windows = plan.count("Window")
    assert windows >= 2
    assert any("bucket" in s for s in specs if s)
    # the offsets aggregate (per-bucket totals) feeds the unpartitioned
    # window, so it sits above a HashAggregate, never above the scan
    assert "HashAggregate" in plan


def test_quantize_int8_is_map_side_only(spark):
    from hadoop_spark_pspd_spark.operators.similarity import (
        sim_quantize_int8,
    )
    from hadoop_spark_pspd_spark.plans.checks import count_exchanges

    df = sim_quantize_int8(spark, SF_SMOKE)
    assert count_exchanges(formatted_plan(df)) == 0


def test_mixture_sample_no_shuffle(spark):
    from hadoop_spark_pspd_spark.operators.text_curation import (
        text_mixture_sample,
    )
    from hadoop_spark_pspd_spark.plans.checks import count_exchanges

    df = text_mixture_sample(spark, SF_SMOKE)
    assert count_exchanges(formatted_plan(df)) == 0


def test_gram_matrix_single_shuffle_of_partials(spark):
    """sim_gram_matrix: each task pre-reduces to 2080 int64 partials, so
    the plan has exactly one Exchange (the 2080-key partial shuffle) and
    a partial+final aggregate around it."""
    import re

    from hadoop_spark_pspd_spark.operators.embeddings_linalg import (
        sim_gram_matrix,
    )

    df = sim_gram_matrix(spark, SF_SMOKE)
    plan = formatted_plan(df)
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))
    assert n_exchanges == 1, plan[:2000]
    assert has_partial_aggregate(df)


def test_bm25_broadcasts_df_and_dl(spark):
    """text_bm25_topk: the df/dl/stats side tables must come back onto
    the tf stream as broadcasts, never sort-merge joins."""
    import re

    from hadoop_spark_pspd_spark.operators.text_analysis import (
        text_bm25_topk,
    )

    plan = formatted_plan(text_bm25_topk(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan, plan[:2000]
    n_bcast = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin",
                             plan))
    assert n_bcast >= 3, plan[:2000]


def test_map_only_curation_ops_have_no_exchange(spark):
    """PII redaction and overlap chunking are scan-speed map ops — any
    Exchange in their plans would be a scale bug."""
    from hadoop_spark_pspd_spark.operators.curation_extra import (
        text_pii_redact,
    )
    from hadoop_spark_pspd_spark.operators.ml_data import text_chunk_overlap

    for q in (text_pii_redact, text_chunk_overlap):
        plan = formatted_plan(q(spark, SF_SMOKE))
        assert "Exchange" not in plan, q.__name__


def test_samplers_plan_distributed_topk(spark):
    """Derandomized reservoir / weighted sampling must plan as
    TakeOrderedAndProject (per-partition k-heap + driver merge), never a
    global sort of the corpus."""
    from hadoop_spark_pspd_spark.operators.curation_extra import (
        q_reservoir_sample,
    )
    from hadoop_spark_pspd_spark.operators.ml_data import q_weighted_sample

    for q in (q_reservoir_sample, q_weighted_sample):
        plan = formatted_plan(q(spark, SF_SMOKE))
        assert "TakeOrderedAndProject" in plan, q.__name__


def test_dsir_and_rule_topk_plan_distributed(spark):
    """Top-k selections whose rank rides along in the output must still
    reduce via TakeOrderedAndProject first (VERDICT r6 #5: the old
    row_number form leaned on the WindowGroupLimit rewrite), with the
    rank attached windowless afterwards — no WindowExec anywhere."""
    from hadoop_spark_pspd_spark.operators.behavioral import q_assoc_rules
    from hadoop_spark_pspd_spark.operators.graph import (
        graph_link_prediction,
    )
    from hadoop_spark_pspd_spark.operators.text_curation import (
        text_dsir_weights,
    )

    for q in (text_dsir_weights, q_assoc_rules, graph_link_prediction):
        plan = formatted_plan(q(spark, SF_SMOKE))
        assert "TakeOrderedAndProject" in plan, q.__name__
    # dsir and assoc-rules need no window at all; link prediction keeps
    # the PARTITIONED top-k window inside cooccurrence_edges (legal)
    for q in (text_dsir_weights, q_assoc_rules):
        plan = formatted_plan(q(spark, SF_SMOKE))
        assert "Window" not in plan, q.__name__


def test_pit_features_is_joinless_on_the_fact_side(spark):
    """The point-in-time feature build resolves through one union+window
    timeline: the only join allowed is the broadcast of the 1-row user-
    count scalar — never a shuffle join of events against orders."""
    from hadoop_spark_pspd_spark.operators.ml_data import q_pit_features

    plan = formatted_plan(q_pit_features(spark, SF_SMOKE))
    assert "Window" in plan
    assert "Union" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_countmin_probe_joins_broadcast(spark):
    """The CM sketch (3 x width cells) and the probe set are both tiny:
    every join in the probe path must broadcast."""
    from hadoop_spark_pspd_spark.operators.curation_extra import (
        sketch_countmin,
    )

    plan = formatted_plan(sketch_countmin(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ann_lsh_is_one_bucket_equijoin_with_broadcast_queries(spark):
    """The LSH candidate lookup must plan as a hash equi-join on
    (tbl, bucket) with the query side BROADCAST — never a nested-loop
    over per-table OR conditions, and never a shuffle of the melted
    corpus index against the 10-query probe set."""
    from hadoop_spark_pspd_spark.operators.similarity import sim_ann_lsh

    plan = formatted_plan(sim_ann_lsh(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pagerank_iterations_broadcast_the_rank_table(spark):
    """Every PageRank iteration joins the (node-dimension-sized) rank
    table against the cached edge list: the rank side must broadcast so
    no iteration re-shuffles the edge table (measured 17s -> ~7s at
    sf0.1 when this regressed to sort-merge)."""
    from hadoop_spark_pspd_spark.operators.graph import graph_pagerank

    plan = formatted_plan(graph_pagerank(spark, SF_SMOKE))
    # final plan hangs off the last localCheckpoint + top-20 sort; the
    # iteration shape is pinned by timing the whole run instead: assert
    # the LAST iteration's join (visible above the checkpoint) broadcast
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_cdc_chunks_single_scan_two_aggs(spark):
    """Content-defined chunking: one linear mapInPandas scan feeding the
    (source,fp) partial+final agg — exactly two Exchanges (fp agg +
    source agg), no per-byte explode, no join."""
    from hadoop_spark_pspd_spark.operators.cdc import text_cdc_chunks

    plan = formatted_plan(text_cdc_chunks(spark, SF_SMOKE))
    assert "MapInPandas" in plan
    # tree lines render as "Exchange (n)"; detail headers as "(n) Exchange"
    assert plan.count("Exchange (") <= 2, plan
    assert "Join" not in plan
    assert has_partial_aggregate(text_cdc_chunks(spark, SF_SMOKE))


def test_audio_energy_is_map_side_only(spark):
    """Windowed PCM energy is per-doc: a single mapInPandas scan with no
    Exchange at all (the per-window reduction happens inside numpy)."""
    from hadoop_spark_pspd_spark.operators.multimodal import (
        mm_audio_energy,
    )

    plan = formatted_plan(mm_audio_energy(spark, SF_SMOKE))
    assert "MapInPandas" in plan
    assert "Exchange" not in plan, plan


def test_cogroup_queries_partition_on_bucket_not_key(spark):
    """The cogroup API queries must shuffle on the 256-BUCKET, never on
    the raw user key: per-key cogrouping pays one Python call per user
    (the 16.6 s q_asof_join_pandas regression class)."""
    from hadoop_spark_pspd_spark.operators.advanced import (
        q_asof_join_pandas,
    )
    from hadoop_spark_pspd_spark.operators.inference import (
        q_cogroup_profile,
    )

    for fn in (q_asof_join_pandas, q_cogroup_profile):
        plan = formatted_plan(fn(spark, SF_SMOKE))
        assert "FlatMapCoGroupsInPandas" in plan, fn.__name__
        assert "hashpartitioning(bkt" in plan, fn.__name__
        assert "hashpartitioning(user_id" not in plan, fn.__name__


def test_corpus_subtree_pinned_single_scan(spark):
    """text_source_overlap / text_length_batching pin their tokenized
    corpus subtree with a lazy localCheckpoint: the consumer plan must
    read the pinned RDD, not re-scan the parquet once per consumer
    (8 and 6 FileScans observed before the pin)."""
    from hadoop_spark_pspd_spark.operators.llm_extras import (
        text_length_batching,
        text_source_overlap,
    )

    for fn in (text_source_overlap, text_length_batching):
        plan = formatted_plan(fn(spark, SF_SMOKE))
        assert "Scan ExistingRDD" in plan, fn.__name__
        assert "Scan parquet" not in plan and "FileScan" not in plan, (
            fn.__name__
        )


def test_media_decode_queries_are_single_exchange_map_only(spark):
    """The real-decode media queries are one explicit repartition plus
    an Arrow-batched mapInPandas (plus, for the stats variants, one
    partial+final agg in the oracle-side shape): no window, no join, no
    second scan — the per-doc decode stays embarrassingly parallel."""
    from hadoop_spark_pspd_spark.operators.media_decode import (
        mm_png_decode_stats,
        mm_png_downsample_stats,
        mm_wav_decode_stats,
        mm_wav_window_rms,
    )

    for fn in (
        mm_png_decode_stats,
        mm_png_downsample_stats,
        mm_wav_decode_stats,
        mm_wav_window_rms,
    ):
        plan = formatted_plan(fn(spark, SF_SMOKE))
        assert plan.count("Exchange") <= 2, (fn.__name__, plan)
        assert "MapInPandas" in plan, fn.__name__
        assert "WindowExec" not in plan and "Window" not in plan.split(
            "\n\n"
        )[0].replace("WindowGroupLimit", ""), fn.__name__
        assert "Join" not in plan.split("\n\n")[0], fn.__name__


def test_stateful_streams_use_sized_state_partitions(spark):
    """sized_state_partitions must actually reach the state store: the
    sizing rule is min(cap, rows//50k + 1) with floor 4, and the
    executed query's stateOperators progress must report exactly that
    partition count; the session conf is restored afterwards. (The test
    session's cap is 4, so sized == floor == cap here; the rule's
    cap/floor arithmetic is asserted directly against the conf.)"""
    import json

    from hadoop_spark_pspd_spark.operators.streaming_queries import (
        _events_rows,
        _events_stream,
        sized_state_partitions,
    )
    from pyspark.sql import functions as F2

    before = spark.conf.get("spark.sql.shuffle.partitions")
    cap = int(before)
    expected = max(4, min(cap, _events_rows(spark, SF_SMOKE) // 50_000 + 1))
    src = (
        _events_stream(spark, SF_SMOKE)
        .filter(F2.col("event_type") == "click")
        .withWatermark("ts", "1 day")
    )
    with sized_state_partitions(spark, SF_SMOKE) as parts:
        assert parts == expected
        q = (
            src.groupBy(F2.window("ts", "1 hour"))
            .count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("pspd_state_parts_pin")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = json.loads(q.recentProgress[-1].json)
    ops = progress["stateOperators"]
    assert ops and all(
        op["numShufflePartitions"] == expected for op in ops
    ), ops
    # and the conf is restored afterwards
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_partition_pruning_scan_has_partition_filters(spark):
    # the static half of q_partition_pruning_scan's claim: a filter on
    # the Hive partition column must land in PartitionFilters (metadata
    # pruning), NOT in PushedFilters/post-scan Filter, and the runtime
    # half (n_part_dirs == 2) must agree
    import shutil
    import tempfile

    from hadoop_spark_pspd_spark.operators.sources_roundtrip import (
        _PRUNE_KEYS,
        q_partition_pruning_scan,
    )

    t = Tables(spark, SF_SMOKE)
    base = tempfile.mkdtemp(prefix="pspd_prune_pin_")
    try:
        t.orders.write.mode("overwrite").partitionBy(
            "o_orderpriority"
        ).parquet(base)
        rd = spark.read.parquet(base).filter(
            F.col("o_orderpriority").isin(*_PRUNE_KEYS)
        )
        plan = formatted_plan(rd)
        assert "PartitionFilters" in plan
        import re

        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert pf and "o_orderpriority" in pf.group(1), plan
    finally:
        shutil.rmtree(base, ignore_errors=True)
    rows = q_partition_pruning_scan(spark, SF_SMOKE).collect()
    assert {r["n_part_dirs"] for r in rows} == {2}
    assert {r["o_orderpriority"] for r in rows} == set(_PRUNE_KEYS)


def test_neardup_screen_shape_is_bytes_chosen(spark, tmp_path):
    """The near-dup screen picks its physical shape by block bytes
    (cap * dim * 4): narrow vectors (d=64 testdata) must keep the
    block-join + MapInPandas shape (measured fastest), wide vectors
    (block > 4 MB) must regroup KB-rows by pair id through
    FlatMapGroupsInPandas — the shape whose UnsafeRows cannot OOM the
    heap (round-10 d=768 lesson)."""
    import numpy as np

    from hadoop_spark_pspd_spark.operators.similarity import (
        neardup_candidates,
    )

    narrow = formatted_plan(neardup_candidates(spark, SF_SMOKE))
    assert "MapInPandas" in narrow
    assert "FlatMapGroupsInPandas" not in narrow

    dim = 272  # 4096 * 272 * 4 = 4.46 MB > the 4 MB narrow ceiling
    rng = np.random.RandomState(3)
    rows = [
        (i, [float(x) for x in rng.randn(dim).astype(np.float32)], 0)
        for i in range(40)
    ]
    d = tmp_path / "wide_sf"
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    wide = formatted_plan(neardup_candidates(spark, str(d)))
    assert "FlatMapGroupsInPandas" in wide
    spark.catalog.clearCache()
