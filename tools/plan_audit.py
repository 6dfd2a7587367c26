"""Physical-plan audit over every registered query.

For each batch query: build the plan (no execution) and count the operators
that matter at 100 TB — shuffle exchanges, broadcasts, cartesian products,
nested-loop joins, scans with pushed filters. Emits PLANS.md and exits
nonzero if a query has an UNEXPECTED cartesian/nested-loop (the accidental
O(n²) class of bug).

Usage: python tools/plan_audit.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import etl_suite_spark  # noqa: E402,F401
from etl_suite_spark.registry import QUERIES  # noqa: E402
from etl_suite_spark.session import get_spark  # noqa: E402

# Queries where a nested-loop / cross product is the DECLARED semantics
# (tiny broadcast side or explicit cartesian) — reviewed, not accidental.
EXPECTED_NLJ = {
    "join_cross",  # declared cartesian (capped region×nation)
    "join_theta_range",  # non-equi range predicate (BNLJ by definition)
    "llm_sim_cosine_topk",  # broadcast query set vs candidates (by design)
    "llm_sim_range_search",  # same broadcast retrieval layer, filter not rank
    "llm_sim_knn_classify",  # same broadcast retrieval layer as cosine_topk
    "llm_sim_mmr_rerank",  # same broadcast retrieval layer feeding the pools
    "llm_sim_ann_recall",  # same broadcast retrieval layer (ground-truth side)
    "llm_retrieval_ndcg",  # same broadcast ground-truth side as ann_recall
    "dq_key_skew_report",  # 1-row stats profile broadcast onto per-key counts
    "llm_dedup_embcos",  # all-pairs scorer at oracle scale (LSH is scale path)
    "udf_pandas_scalar",  # 1-row stats frame cross-joined (broadcast)
    "llm_text_tfidf",  # scalar N broadcast
    "llm_corpus_stats",  # two one-row stat aggregates joined (dashboard row)
    "ml_kmeans_tiers",  # k centroids broadcast each iteration
    "ml_kmeanspp_tiers",  # one-row chosen-centroid array broadcast per init round
    "ml_kmeans_quality",  # one-row beats-baseline flag broadcast onto 5 cell rows
    "llm_sim_ann_ivf",  # 8 coarse centroids broadcast for query-side cell probe
    "join_bloom_pruned",  # one-row bloom bitmap broadcast onto the fact side
    "tpch_q11",  # one-row global-total broadcast joined back (Q11 scalar subquery)
    "llm_dedup_minhash_recall",  # two one-row count aggregates joined (scalar metrics)
    "llm_dedup_minhash_precision",  # three one-row count aggregates joined
    "llm_dedup_simhash_recall",  # four one-row count aggregates joined (scalar metrics)
    "llm_sim_ann_ivf_recall",  # same one-row metric join + IVF centroid broadcast
    "ml_churn_label",  # one-row global-now broadcast joined onto per-user aggs
    "tpch_q22",  # 1-row (sum,count) scalar-threshold broadcast (Q22 AVG subquery)
    "llm_bm25_search",  # 1-row (avgdl, N) corpus-stats broadcast
    "llm_sim_ann_pq",  # 10 query ADC tables broadcast vs code table (by design)
    "llm_sim_ann_pq_recall",  # same ADC broadcast + one-row metric join
    "llm_sim_ann_ivfpq",  # coarse-centroid broadcast + broadcast probe tables
    "llm_sim_ann_ivfpq_recall",  # same + one-row metric join
    "llm_index_build_pipeline",  # same 10-query ADC broadcast as ann_pq
    "llm_index_build_pipeline_recall",  # same + one-row metric join
    "llm_index_build_pipeline_ivfpq",  # coarse-centroid + per-cell ADC broadcasts
    "llm_index_build_pipeline_ivfpq_recall",  # same + one-row metric join
    "llm_emb_matryoshka_recall",  # broadcast 10-query set × bounded dim grid
    "llm_index_build_pipeline_ivf",  # 8-centroid broadcast for query-side cell probe
    "llm_index_build_pipeline_ivf_recall",  # same + one-row metric join
    "llm_index_incremental_add",  # k-centroid broadcast argmin (frozen quantizer)
    "llm_index_incremental_add_recall",  # same + broadcast probes + 1-row metric join
    "llm_index_tombstone_probe_recall",  # bounded 10-query ground-truth broadcast + 1-row metric joins (incl. the surfaced-deleted scalar)
    "llm_index_compact_cells_recall",  # same shape: bounded query broadcast + 1-row metric joins
    "mm_modality_balance",  # one-row corpus-bytes normalizer broadcast
    "agg_aqp_estimate",  # two one-row aggregates joined (estimate vs exact)
    "agg_sketch_overlap",  # 5-row sketch table pair self-join (type-count-sized by design)
    "graph_triangle_count",  # four one-row metric aggregates joined
    "agg_market_basket",  # one-row n_orders broadcast crossJoin (lazy denominator, r5)
    "agg_dau_wau_stickiness",  # broadcast day-grid theta-join (<=7x bounded fanout)
    "dq_benford",  # one-row total broadcast crossJoin (digit-share denominator)
    "agg_rfm_segmentation",  # one-row corpus-max-date broadcast crossJoin
    "llm_vocab_growth",  # one-row corpus-count broadcast crossJoin (decile bound)
    "llm_dedup_embedding_recall",  # two one-row count aggregates joined (scalar metrics)
    "agg_survival_km",  # one-row user-total broadcast crossJoin (n_risk base)
    "ts_seasonal_index_dow",  # one-row (total, n_days) broadcast crossJoin
    "win_cusum_changepoint",  # one-row (total, n) broadcast crossJoin (exact mean)
    "agg_welch_ttest",  # 1x1 scalar crossJoin of the two group stat rows
    "agg_theil_sen",  # 90-day-domain pairwise slope join + 1-row broadcasts (bounded by design)
    "dq_freshness",  # one-row corpus-max broadcast crossJoin
    "agg_funnel_timebound",  # three one-row stage counts crossJoined (rate row)
    "agg_chisq_independence",  # one-row (n, r, c) totals broadcast crossJoin
    "agg_ks_test",  # one-row (n1, n2) totals broadcast crossJoin (ECDF denominators)
    "agg_bootstrap_ci",  # one-row full-corpus-mean broadcast crossJoin
    "inc_partition_rebuild",  # one-row max-date broadcast crossJoin (stale-copy cutoff)
    "llm_dedup_threshold_sweep",  # 5-row threshold table theta-joined to sampled pairs
    "llm_mixture_epochs",  # one-row (total tokens, weight normalizer) broadcast crossJoin
    "agg_decay_score",  # one-row corpus-max-timestamp broadcast crossJoin
    "llm_hard_negatives",  # broadcast query set vs candidates (cosine_topk layer)
    "ml_target_encoding",  # one-row global-prior broadcast crossJoin
    "ml_feature_scale",  # one-row fit-statistics broadcast crossJoin
    "dq_psi_drift",  # one-row split/edges/totals broadcast crossJoins (PSI constants)
    "ts_acf",  # 14-row lag-grid broadcast crossJoin onto the day domain
    "inc_snapshot_expire",  # one-row retention-cutoff broadcast crossJoin
    "llm_charset_report",  # one-row corpus-total broadcast crossJoin (share denominator)
    "llm_unigram_logprob",  # one-row corpus-total broadcast crossJoin (LM denominator)
    "llm_dsir_weights",  # one-row (N_t, N_s, V) totals broadcast crossJoin (DSIR denominators)
    "llm_dedup_softweight",  # one-row effective_docs broadcast crossJoin
    "llm_dsir_resample",  # composes llm_dsir_weights → inherits its one-row crossJoin
    "llm_bigram_logprob",  # one-row |V| broadcast crossJoin (Laplace denominator)
    "llm_ngram_kneser_ney",  # one-row |bigram types| broadcast crossJoin (KN T term)
    "llm_perplexity_bucket",  # composes llm_unigram_logprob → inherits its one-row crossJoin
    "ts_holt_winters",  # one-row folded state crossJoined with broadcast 7-row horizon grid
    "ts_cross_correlation",  # 8-row lag-grid broadcast crossJoin onto the day-domain series
    "agg_cms_heavy_hitters",  # 4-row hash-param grid broadcast crossJoin (sketch rows)
    "llm_cross_entropy_heldout",  # one-row (T, |V|) broadcast crossJoin (LM denominator)
    "llm_bigram_pmi_top20",  # one-row |bigrams| broadcast crossJoin (PMI denominator)
    "llm_dup_cluster_histogram",  # one-row total broadcast crossJoin (pct denominator)
    "ml_gradient_step_linear",  # 4 one-row gradient renders off the single agg row
    "graph_kcore",  # per-round 1x1 (n_nodes, n_edges) report crossJoins
    "llm_ngram_coverage_curve",  # 3-row threshold grid theta-join + one-row total
    "agg_session_stats",  # one-row session-total broadcast crossJoin (share denominator)
    "llm_lang_id_confusion",  # one-row doc-total broadcast crossJoin (share denominator)
    "llm_semdedup_recall",  # all-pairs tau ground truth at fixture scale (the measurement twin; the op itself is cell-joined) + 1-row metric join
    "llm_sim_ann_filtered",  # 8 coarse centroids broadcast for query-side cell probe
    "llm_sim_ann_filtered_recall",  # bounded 10-query ground-truth broadcast + 1-row metric joins (incl. the filter-violation scalar)
    "llm_index_cell_rebalance_recall",  # bounded 10-query ground-truth broadcast + 1-row metric/conservation joins
    "llm_semdedup_sweep",  # 5-row threshold table theta-joined to per-doc maxima + 1-row total broadcast (the threshold_sweep shape)
    "llm_semdedup_bands_recall",  # all-pairs tau ground truth at fixture scale (measurement twin of the cell-joined bands op) + 1-row metric join
    "llm_corpus_prune_pipeline_audit",  # 1-row corpus-funnel totals crossJoined into the single report row
    "llm_index_retrain",  # k-centroid broadcast argmin (the frozen delta assignment it audits against)
    "llm_index_retrain_recall",  # bounded 10-query ground-truth broadcast + 1-row metric joins (incl. the surfaced-deleted scalar)
    "llm_sim_ann_nprobe_sweep",  # bounded 10-query probe broadcast + exact-top3 ground truth + 4 one-row curve aggregates
    "llm_sim_ann_nprobe_sweep_recall",  # same curve machinery + 1-row monotone/gate metric joins
    "llm_semdedup_crossset_recall",  # all-pairs batch x standing tau ground truth at fixture scale (measurement twin of the cell-joined crossset op) + 1-row metric join
    "llm_index_maintenance_policy",  # 1-row metric aggregates (delta count x total count, sweep-curve row) crossJoined into the 3-row decision table
    "llm_quality_threshold_sweep",  # 5-row threshold grid theta-joined to per-doc scores + 1-row corpus-total crossJoin (the threshold_sweep shape on the selection surface)
}

# Streaming / stateful / sink queries execute jobs on plan construction —
# audit their batch analogues instead (they're pinned in pytest goldens).
SKIP = {name for name in QUERIES if name.startswith("stream_")}

# Driver-shape gate (VERDICT r9 item 2): the real driver canonicalizes
# EVERY query's output via toPandas().sort_values(...) before branching on
# oracle presence, and Arrow-backed toPandas renders Array/Map/Struct cells
# as numpy.ndarray / dict objects that pandas cannot factorize — the exact
# failure that turned llm_emb_pca red in CORRECTNESS_r09 while collect()-
# based local verification stayed green. Every registered query must
# therefore emit ATOMIC-typed columns only. The whitelist is for a future
# op that genuinely needs a nested output AND ships its own driver-shape
# evidence; it is intentionally empty today.
NESTED_OUTPUT_OK: set[str] = set()


def shape_violations(name: str, schema) -> list[str]:
    """Column names in `schema` whose type the driver's pandas
    canonicalization cannot ingest (Array/Map/Struct), unless whitelisted."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if name in NESTED_OUTPUT_OK:
        return []
    return [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"))
    args = ap.parse_args()

    spark = get_spark("plan-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    rows, violations = [], []
    for name in sorted(QUERIES):
        if name in SKIP:
            rows.append((name, "-", "-", "-", "-", "streaming (pytest-pinned)"))
            continue
        try:
            df = QUERIES[name](spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover
            rows.append((name, "?", "?", "?", "?", f"PLAN ERROR {type(e).__name__}"))
            violations.append((name, str(e)[:120]))
            continue
        bad_cols = shape_violations(name, df.schema)
        if bad_cols:
            note = f"NON-ATOMIC OUTPUT {bad_cols}"
            violations.append((name, note))
            rows.append((name, "?", "?", "?", "?", note))
            continue
        shuffles = len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning", plan))
        bcasts = plan.count("BroadcastExchange")
        cartesian = plan.count("CartesianProduct")
        nlj = plan.count("BroadcastNestedLoopJoin")
        pushed = "yes" if "PushedFilters: [" in plan and "PushedFilters: []" not in plan else ""
        note = ""
        if (cartesian or nlj) and name not in EXPECTED_NLJ:
            note = "UNEXPECTED NLJ/CARTESIAN"
            violations.append((name, note))
        elif name in EXPECTED_NLJ and (cartesian or nlj):
            note = "by design (broadcast/tiny side)"
        rows.append((name, shuffles, bcasts, cartesian + nlj, pushed, note))

    with open(args.out, "w") as f:
        f.write("# PLANS — physical-plan audit of every registered query\n\n")
        f.write(f"sf fixture: `{args.sf}` · generated by `tools/plan_audit.py`.\n\n")
        f.write("Columns: shuffle exchanges (hash/range) · broadcast exchanges ·\n")
        f.write("nested-loop/cartesian joins · filter pushdown reached a scan.\n\n")
        f.write("| query | shuffles | broadcasts | NLJ/cart | pushdown | note |\n")
        f.write("| --- | --- | --- | --- | --- | --- |\n")
        for r in rows:
            f.write("| `" + str(r[0]) + "` | " + " | ".join(str(x) for x in r[1:]) + " |\n")
        f.write(f"\n**{len(violations)} unexpected O(n²) plans.**\n")

    print(f"wrote {args.out}: {len(rows)} queries, {len(violations)} violations")
    for name, msg in violations:
        print(f"  VIOLATION {name}: {msg}")
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
