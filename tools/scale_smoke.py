"""10× scale smoke — the reproducible version of the round-4 scale check.

Builds a corpus ~10× the bench fixture in a temp dir (10 perturbed copies
of sf0.1 documents/embeddings; other tables copied as-is), runs the ops
whose scaling behavior matters most, and prints one JSON line of wall
seconds. This is how the two single-file parallelism traps were found
(PQ checkpoint width, cosine candidate width — BASELINE.md r4 addenda 3-4):
the bench fixture is too small to surface them, so this harness exists to
keep them surfaced.

Usage: python tools/scale_smoke.py [--base /root/testdata/sf0.1] [--copies 10]
       python tools/scale_smoke.py --skew   # Zipf-skewed tier (see below)

Note: llm_dedup_substring is EXCLUDED by default — 10 near-identical
copies of every document is its adversarial input (every pair shares every
span; legitimately ~100× the work, measured 189 s) and the op's documented
100 TB route is via LSH candidate pairs. Include it with --all.

Skewed tier (``--skew``, VERDICT r4 item 8): the uniform 10× corpus has
headroom comments but no actual skew; this tier plants every hot-key shape
the repo's caps and skew-safe formulations claim to handle, and runs the
ops that must stay bounded under them:

- a 30-word boilerplate prefix on 30 % of documents → hot chunks (the
  paragraph-dedup groupBy(chunk) map-side combine) and hot grams (the
  substring op's frequency cap);
- 50 near-copies of one viral document → a hot MinHash band bucket
  (minhash / embedding-routing candidate volume stays ~50²/2, not corpus²);
- a mega-basket lineitem order with 300 distinct parts → the market-basket
  > 200-item cap must drop it from pair generation;
- one customer holding ~15 % of all orders → the salted join must spread
  the hot custkey over its 16 salt reducers.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = [
    "llm_dedup_exact",
    "llm_dedup_paragraph",
    "llm_quality_c4",
    "llm_dedup_minhash",
    "llm_sim_cosine_topk",
    "llm_sim_ann_pq",
    "llm_sim_ann_ivfpq",
    "llm_bigram_logprob",
    "llm_ngram_kneser_ney",
    "llm_span_corruption",
    "ts_gapfill_locf",
    "dim_scd2_lookup",
    "graph_pagerank",
    "win_topk_per_group",
    "llm_decontaminate",
    # the composite quality cascade reads documents, which DOES replicate
    # in this tier (VERDICT r5 item 4)
    "llm_quality_composite",
    # round 7: the new heavy corpus passes — held-out LM scoring (train
    # count table + eval join), the mapInPandas Gram partials, and the
    # nearest-centroid eval — all read documents/embeddings, which
    # replicate here
    "llm_cross_entropy_heldout",
    "llm_emb_gram_matrix",
    "ml_confusion_metrics",
    # round 8: DSIR reads documents (two Heaps-sized count tables through
    # the byte gate at this tier); PCA reads embeddings (the d²-bounded
    # moment collects + the Arrow-matmul projection over 3M vectors)
    "llm_dsir_weights",
    "llm_emb_pca",
    # the BPE trainer: corpus touched once (word-count agg), then 8
    # driver-looped rounds over the DISTINCT-WORD table — the tier's
    # replicated docs stress the word-count shuffle and the Heaps-sized
    # per-round pair aggs
    "llm_bpe_train",
    # round 9: rare-token mining reads documents — at the big tiers its
    # Heaps-sized count join crosses the byte gate and must run as a
    # co-partitioned AQE shuffle join (the DSIR discipline)
    "llm_rare_token_docs",
]

# Graph tier (--graph, VERDICT r5 item 4): the uniform tier replicates only
# documents/embeddings, so the co-purchase graph (derived from lineitem)
# stays CONSTANT there — graph ops in OPS are effectively 1x rows. This tier
# replicates lineitem+orders copies-x with per-copy key offsets (disjoint
# copies: component count scales linearly, per-component diameter is
# unchanged, so pointer-jumped label propagation should converge in the SAME
# number of rounds while wall-time grows near-linearly — that pair is the
# pass criterion). Each op is timed at 1x AND at copies-x so one run prints
# the scaling ratio.
GRAPH_OPS = [
    "graph_connected_components",
    "graph_pagerank",
    "graph_label_propagation",
    "graph_triangle_count",
    # round 7: fixed-round peel over the co-purchase graph — the edge set
    # scales with the l_partkey/l_suppkey offsets like triangle_count's
    "graph_kcore",
]


# ANN tier (--ann, VERDICT r7 item 4): addenda 22/23 measured the LM and
# dedup/quality families at the 1500x corpus, but the persisted-index ANN
# ops had no measurement past 10x. This tier replicates embeddings (with a
# small per-copy DIRECTIONAL perturbation — identical copies would make
# every query's true top-k a degenerate tie block, the fixture-degeneracy
# trap) and documents copies-x, then times each index op COLD (build +
# probe; materialize_once artifacts absent) and WARM (probe-only; artifacts
# hit), so one run quantifies the index-build vs probe split a 100 TB
# serving deployment plans around. The MinHash signature artifact is timed
# the same way via _corpus_signatures. llm_dedup_minhash itself is
# EXCLUDED: 1500 near-copies of every document is its adversarial input
# (the true near-dup mass IS quadratic in copies — same reasoning that
# excludes llm_dedup_substring from the uniform tier), and the band join's
# output-bound behavior is already covered by the skew tier's viral-doc
# shape. The recall honesty twins run against the warm index and their
# gate flags are reported verbatim.
ANN_INDEX_OPS = [
    "llm_sim_ann_ivf",
    "llm_sim_ann_pq",
    "llm_sim_ann_ivfpq",
    # round 9: dedup-before-index composed pipeline (addendum 26's
    # remedy as a registered operator — dedup runs INSIDE the op, so it
    # must hold its gate on the raw duplicate-heavy corpus)
    "llm_index_build_pipeline",
    # round 10: dedup-before-index extended to the IVF-PQ composite
    # (VERDICT r9 item 5 — addendum 30 measured raw IVF-PQ as the one
    # expensive build left; both quantizers now train on representatives)
    "llm_index_build_pipeline_ivfpq",
    # round 10: dedup-before-index over IVF-Flat (completes the matrix:
    # every celled/quantized family has a representative-sized build)
    "llm_index_build_pipeline_ivf",
    # round 10: incremental IVF maintenance — here the cold/warm split is
    # the claim itself: cold = one-time base train + first delta ingest,
    # warm = the recurring per-batch cost (frozen-centroid assign + audit,
    # no retrain). Not in the sentinel matrix (addenda 24/26 pin the
    # build-family recall outcomes; this op's gate is its own recall twin).
    "llm_index_incremental_add",
    # round 9: the LSH bucket family (deterministic projections, no
    # training — "cold" here is bucket assignment, not k-means)
    "llm_sim_ann_lsh",
    "llm_sim_ann_multiprobe",
    # round 11: the delete/compaction lifecycle — tombstone audit is a
    # k-row agg over the persisted assignment; compaction rewrites the
    # affected cell partitions of a corpus-sized serving table (cold =
    # index train + warehouse build + rewrite, warm = the recurring
    # audit/rewrite against the persisted index). Not sentinel-pinned
    # (their gates are their own recall twins).
    "llm_index_tombstone_probe",
    "llm_index_compact_cells",
    # round 13: quantizer retrain (cold = full k-means over the live
    # corpus + persist — the drift-control action, priced so the audit
    # loop's "when to retrain" trade is measured; warm = the recurring
    # migration-matrix audit). Not sentinel-pinned (gate = recall twin).
    "llm_index_retrain",
    # round 12: rebalance (cold = base train + per-split 2-means + rewrite,
    # warm = recurring audit over the persisted rebalanced assignment) and
    # filtered search (cold = shared base train, warm = the filtered probe).
    # Not sentinel-pinned (gates are their own recall twins).
    "llm_index_cell_rebalance",
    "llm_sim_ann_filtered",
]
ANN_RECALL_OPS = [
    "llm_sim_ann_ivf_recall",
    "llm_sim_ann_pq_recall",
    "llm_sim_ann_ivfpq_recall",
    "llm_index_build_pipeline_recall",
    "llm_index_build_pipeline_ivfpq_recall",
    "llm_index_build_pipeline_ivf_recall",
    "llm_index_incremental_add_recall",
    "llm_sim_ann_recall",  # the LSH twin
    # round 11: the delete-serving honesty twins (logical + physical)
    "llm_index_tombstone_probe_recall",
    "llm_index_compact_cells_recall",
    # round 12: rebalance conservation/recall + filtered-search twins
    "llm_index_cell_rebalance_recall",
    "llm_sim_ann_filtered_recall",
    # round 13: the retrain recovery twin and the nprobe calibration
    # curve's contract twin (not sentinel-pinned — their gates are
    # their own hash-checked flags)
    "llm_index_retrain_recall",
    "llm_sim_ann_nprobe_sweep_recall",
]

# Permanent regression sentinel (VERDICT r8 item 3): the recall-gate
# outcomes MEASURED in BASELINE addenda 24/26 at the two pinned
# duplicate-heavy tiers, asserted on every un-restricted --ann run at
# those exact (copies, perturb) coordinates (without --dedup-first —
# the corpus-level dedup flag would mask exactly what the matrix pins).
# A deviation in EITHER direction exits nonzero: IVF routing silently
# degrading, flat PQ silently "fixed" by a weakened gate, or the
# composed dedup-before-index pipeline losing the remedy it exists for.
ANN_RECALL_SENTINEL = {
    (100, 0.05): {
        "llm_sim_ann_ivf_recall": ("recall_ge_40", True),
        "llm_sim_ann_pq_recall": ("recall_ge_40", False),
        "llm_sim_ann_ivfpq_recall": ("recall_ge_30", True),
        "llm_index_build_pipeline_recall": ("recall_ge_40", True),
        # round 10 (measured this round, BASELINE addenda 39/41):
        "llm_index_build_pipeline_ivfpq_recall": ("recall_ge_30", True),
        "llm_index_build_pipeline_ivf_recall": ("recall_ge_40", True),
    },
    (1500, 0.001): {
        "llm_sim_ann_ivf_recall": ("recall_ge_40", True),
        "llm_sim_ann_pq_recall": ("recall_ge_40", False),
        "llm_sim_ann_ivfpq_recall": ("recall_ge_30", True),
        "llm_index_build_pipeline_recall": ("recall_ge_40", True),
        # round 10 (measured this round, BASELINE addenda 39/41):
        "llm_index_build_pipeline_ivfpq_recall": ("recall_ge_30", True),
        "llm_index_build_pipeline_ivf_recall": ("recall_ge_40", True),
    },
}


def check_recall_sentinel(copies, perturb, dedup_first, only, timings,
                          dup_fraction=1.0):
    """(applies, failures) for the pinned recall matrix — extracted so
    the comparison logic itself is pytest-checked (a bug here would make
    the sentinel silently always-pass, defeating its purpose).  Applies
    only to un-restricted, un-deduped, FULL-duplication runs at a pinned
    (copies, perturb) coordinate (a --dup-fraction corpus has different
    duplicate mass than the matrix was pinned on); a MISSING result row
    is a failure, not a skip."""
    sentinel = ANN_RECALL_SENTINEL.get((copies, perturb))
    if not sentinel or dedup_first or only or dup_fraction < 1.0:
        return False, []
    failures = []
    for name, (flag, expect) in sentinel.items():
        got = timings.get(name, {}).get("result", {}).get(flag)
        # normalize before comparing (ADVICE r9): a truthy non-bool flag
        # (e.g. numpy.bool_ from a future result path) must not spuriously
        # fail the sentinel via identity comparison; None (missing row)
        # stays a failure.
        got = bool(got) if got is not None else None
        if got != expect:
            failures.append(f"{name}.{flag}: expected {expect}, got {got}")
    return True, failures


# Events tier (--events, added r8): no other tier replicates the events
# table, so the incremental/CDC/SCD2/sessionization family — the
# reference's defining capability — had no measurement past sf0.1.
# Replicates events copies-x with DISJOINT per-copy user_id/event_id
# offsets (each copy is a fresh population: session counts and SCD2
# interval counts scale linearly, per-user history depth is unchanged —
# so near-linear wall at fixed per-key work is the pass criterion).
# Each op is timed at 1x AND copies-x like the graph tier.
EVENTS_OPS = [
    "dim_scd2_build",
    "dim_scd2_lookup",
    "inc_scd2_apply",
    "inc_snapshot_expire",
    "win_sessionize",
    "agg_session_stats",
    # round-8 addition: the bucket-pruned GDPR erasure — build write +
    # dynamic-overwrite erase + readback audit, all events-sized
    "inc_subject_erasure",
    # round-9 addition: the GDPR read twin — warehouse build write +
    # subject-bucket-pruned export scan, both events-sized
    "inc_subject_export",
    # round-11 addition: the throttled outage-backlog drain — both
    # checkpointed runs + 7 foreachBatch warehouse merges are
    # events-sized, so this tier measures drain wall vs backlog size
    # (the backlog is the post-outage ~2/3 of the corpus)
    "stream_restart_backlog_drain",
]


def build_events(base: str, copies: int, out: str,
                 hot_subject: bool = False) -> None:
    """Replicate events copies-x with disjoint user/event id offsets;
    every other table copies as-is.  With ``hot_subject`` (VERDICT r8
    item 7), 1% of ALL rows are reassigned to the single erasure subject
    user_id = 97 000 000 (divisible by 97, above every per-copy range) —
    the hot-subject skew shape for inc_subject_erasure: one bucket's
    rewrite carries ~1% of the corpus instead of ~1/97 of one bucket."""
    import duckdb

    os.makedirs(out, exist_ok=True)
    for t in [
        "region", "nation", "customer", "supplier",
        "part", "orders", "lineitem", "documents", "embeddings",
    ]:
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    # disjointness is the tier's pass criterion — ENFORCE the offsets
    # instead of assuming the base fixture's id ranges (code-review r8:
    # a wider future fixture would silently alias copies into each other
    # and merge cross-copy sessions with no error)
    mx_e, mx_u = con.execute(
        f"SELECT MAX(event_id), MAX(user_id) FROM read_parquet('{base}/events.parquet')"
    ).fetchone()
    if mx_e >= 10000000 or mx_u >= 100000:
        raise SystemExit(
            f"events id ranges (max event_id {mx_e}, max user_id {mx_u}) "
            "exceed the tier's per-copy offsets (1e7 / 1e5): copies would alias"
        )
    if hot_subject and 100000 * copies > 97000000:
        # same anti-aliasing class: copy c=970's uid range reaches the
        # planted subject id, merging a real user into it and corrupting
        # the skew measurement (code-review r9 finding #4)
        raise SystemExit(
            f"--hot-subject with copies={copies}: per-copy uid ranges reach "
            "the planted subject id 97000000 (needs copies <= 970)"
        )
    uid = (
        "CASE WHEN (event_id + 10000000 * c) % 100 = 0 THEN 97000000"
        " ELSE user_id + 100000 * c END"
        if hot_subject
        else "user_id + 100000 * c"
    )
    con.execute(
        f"""
        COPY (
          SELECT event_id + 10000000 * c AS event_id, ts,
                 {uid} AS user_id,
                 event_type, value, props
          FROM read_parquet('{base}/events.parquet'),
               unnest(range(0, {copies})) AS u(c)
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )


def build_ann(
    base: str,
    copies: int,
    out: str,
    perturb: float = 0.001,
    dup_fraction: float = 1.0,
) -> None:
    """Replicate embeddings+documents copies-x; embeddings get a tiny
    deterministic per-(copy, dim) directional perturbation (~1e-3 of the
    coordinate scale) so copies are NEAR neighbors, not exact ties.

    ``dup_fraction`` < 1 builds a LOW-DUPLICATION regime (VERDICT r10
    item 4): only copies with c % round(1/dup_fraction) == 0 stay inside
    the near-dup band (amplitude ``perturb``); every other copy gets a
    0.5-amplitude perturbation — far outside the 32-bit sign-signature
    collapse band, so the dedup stage keeps it as a UNIQUE vector. The
    corpus is still copies-x rows, but duplicate mass is ~dup_fraction
    of it, which is the regime where dedup-before-index does NOT pay
    its shuffle back."""
    import duckdb

    os.makedirs(out, exist_ok=True)
    for t in [
        "region", "nation", "customer", "supplier",
        "part", "orders", "lineitem", "events",
    ]:
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    # same preflight build_events has (ADVICE r8 item 4): a wider future
    # fixture would silently alias copies and corrupt the ANN recall
    # measurements — enforce the per-copy offset instead of assuming it
    mx_d, mx_v = con.execute(
        f"SELECT (SELECT MAX(doc_id) FROM read_parquet('{base}/documents.parquet')),"
        f" (SELECT MAX(vec_id) FROM read_parquet('{base}/embeddings.parquet'))"
    ).fetchone()
    if mx_d >= 100000 or mx_v >= 100000:
        raise SystemExit(
            f"id ranges (max doc_id {mx_d}, max vec_id {mx_v}) exceed the "
            "ANN tier's per-copy offset (1e5): copies would alias"
        )
    con.execute(
        f"""
        COPY (
          SELECT doc_id + 100000 * c AS doc_id,
                 CASE WHEN (doc_id + c) % 10 < 3 AND c > 0
                      THEN text || ' copytok' || c ELSE text END AS text,
                 lang, source,
                 CASE WHEN (doc_id + c) % 10 < 3 AND c > 0
                      THEN n_chars + 8 + strlen(CAST(c AS VARCHAR))
                      ELSE n_chars END AS n_chars
          FROM read_parquet('{base}/documents.parquet'),
               unnest(range(0, {copies})) AS u(c)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    if dup_fraction >= 1.0:
        pert_expr = f"{perturb} * sin(c * 7 + i)"
    else:
        # code-review r11: guard the derivation — dup_fraction <= 0 has
        # no meaning here (a zero-dup corpus can't be built by copying),
        # and anything above 0.5 rounds mod to 1, which silently
        # rebuilds the FULL-duplication corpus while the run is labeled
        # (and sentinel-skipped) as low-dup: mislabeled measurements.
        if not 0.0 < dup_fraction <= 0.5:
            raise SystemExit(
                f"--dup-fraction {dup_fraction} unsupported: must be in (0, 0.5] "
                "(mod = round(1/dup_fraction) needs >= 2 so out-of-band copies "
                "exist; use the default 1.0 for the full-duplication tiers)"
            )
        mod = round(1.0 / dup_fraction)
        # c=0 (the base copy) always stays in-band so queries (vec_id<10)
        # keep their identity; other copies are near-dups only when
        # c % mod == 0.  The out-of-band perturbation must be HASH-driven
        # per (vec, copy, dim) — two cheaper constructions measurably
        # over-collapse under the 32-bit sign signature: a per-copy
        # direction (every vector of a copy shares one signature) and a
        # smooth per-vector sine phase (sign(sin(a+i)) takes only ~2·dim
        # distinct patterns as the phase varies, so 600 k vectors landed
        # in a few hundred buckets — both caught because the first runs
        # showed a 1.7x build gain this regime by construction cannot
        # have).  hash() gives i.i.d.-ish signs, so "unique" copies
        # genuinely survive dedup.
        pert_expr = (
            f"(CASE WHEN c % {mod} = 0 THEN {perturb} * sin(c * 7 + i) "
            f"ELSE 0.5 * (CAST(hash(vec_id * 131071 + c * 8191 + i) % 2001 "
            f"AS DOUBLE) / 1000.0 - 1.0) END)"
        )
    con.execute(
        f"""
        COPY (
          SELECT vec_id + 100000 * c AS vec_id,
                 list_transform(range(1, len(embedding) + 1),
                   i -> CAST(embedding[CAST(i AS INTEGER)]
                             + {pert_expr} AS FLOAT)) AS embedding,
                 label
          FROM read_parquet('{base}/embeddings.parquet'),
               unnest(range(0, {copies})) AS u(c)
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )


def dedup_embeddings(out: str) -> tuple[int, int]:
    """The addendum-24 remedy, applied: collapse near-duplicate vectors
    BEFORE index build via a 32-bit sign signature (SimHash over
    axis-difference hyperplanes — the llm_sim_ann_lsh projection family),
    keeping the min-vec_id representative per signature. Near-identical
    copies (perturbation ≪ typical coordinate gaps) share all 32 signs
    unless a gap sits inside the perturbation band, so duplicate mass
    collapses to a handful of representatives per base vector while
    distinct vectors almost never collide at 32 bits. Returns
    (rows_before, rows_after)."""
    import duckdb

    con = duckdb.connect()
    src = f"{out}/embeddings.parquet"
    before = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{src}')"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT vec_id, embedding, label FROM (
            SELECT vec_id, embedding, label,
                   row_number() OVER (
                     PARTITION BY array_to_string(list_transform(range(1, 33),
                       j -> CASE WHEN embedding[CAST(2*j-1 AS INTEGER)]
                                      >= embedding[CAST(2*j AS INTEGER)]
                            THEN '1' ELSE '0' END), '')
                     ORDER BY vec_id) AS rn
            FROM read_parquet('{src}')
          ) WHERE rn = 1
        ) TO '{src}.dedup.parquet' (FORMAT PARQUET)
        """
    )
    shutil.move(f"{src}.dedup.parquet", src)
    after = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{src}')"
    ).fetchone()[0]
    return before, after


SKEW_OPS = [
    "llm_dedup_exact",
    "llm_dedup_paragraph",
    "llm_dedup_minhash",
    "llm_dedup_embedding",
    "llm_dedup_substring",
    "agg_market_basket",
    "join_salted_skew",
    "win_topk_per_group",
]


def build_skewed(base: str, out: str) -> None:
    """Plant the four hot-key shapes documented in the module docstring."""
    import duckdb

    os.makedirs(out, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part", "events"]:
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    shutil.copy(f"{base}/embeddings.parquet", f"{out}/embeddings.parquet")
    con = duckdb.connect()
    boiler = " ".join(f"boiler{i % 7}w{i}" for i in range(30))
    con.execute(
        f"""
        COPY (
          SELECT doc_id,
                 CASE WHEN doc_id % 10 < 3
                      THEN '{boiler} ' || text ELSE text END AS text,
                 lang, source, n_chars
          FROM read_parquet('{base}/documents.parquet')
          UNION ALL
          SELECT 10000000 + c AS doc_id,
                 (SELECT text FROM read_parquet('{base}/documents.parquet')
                  ORDER BY doc_id LIMIT 1) || ' viral' || c AS text,
                 'en' AS lang, 'viral' AS source, 0 AS n_chars
          FROM unnest(range(0, 50)) AS u(c)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{base}/lineitem.parquet')
          UNION ALL
          SELECT * EXCLUDE (rn) REPLACE (1 AS l_orderkey, 9000000 + rn AS l_partkey)
          FROM (
            SELECT *, row_number() OVER () AS rn
            FROM read_parquet('{base}/lineitem.parquet') LIMIT 300
          )
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{base}/orders.parquet')
          UNION ALL
          SELECT * EXCLUDE (rn) REPLACE (20000000 + rn AS o_orderkey, 1 AS o_custkey)
          FROM (
            SELECT *, row_number() OVER () AS rn
            FROM read_parquet('{base}/orders.parquet')
            USING SAMPLE 15 PERCENT (reservoir, 42)
          )
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)
        """
    )


def build_graph(base: str, copies: int, out: str) -> None:
    """Replicate the EDGE side (lineitem + orders) with disjoint per-copy
    key offsets; everything else copies as-is.

    EVERY key a GRAPH_OPS edge list is built from gets a per-copy offset
    (ADVICE r6): the co-purchase graph keys (l_orderkey/l_partkey) AND the
    trade-graph keys (o_custkey/l_suppkey — graph_pagerank and
    graph_label_propagation derive their nodes from these via
    orders⋈lineitem). Without the latter two, .distinct() collapsed all
    copies of the trade graph back to the base graph and the tier's
    "components scale linearly" criterion was vacuous for half of
    GRAPH_OPS. No graph op joins the customer/supplier dims (they read
    only orders+lineitem), so the offset keys dangle harmlessly."""
    import duckdb

    os.makedirs(out, exist_ok=True)
    for t in [
        "region", "nation", "customer", "supplier",
        "part", "events",
    ]:
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    shutil.copy(f"{base}/documents.parquet", f"{out}/documents.parquet")
    shutil.copy(f"{base}/embeddings.parquet", f"{out}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (l_orderkey + 100000000 * c AS l_orderkey,
                            l_partkey + 10000000 * c AS l_partkey,
                            l_suppkey + 1000000 * c AS l_suppkey)
          FROM read_parquet('{base}/lineitem.parquet'),
               unnest(range(0, {copies})) AS u(c)
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (o_orderkey + 100000000 * c AS o_orderkey,
                            o_custkey + 1000000 * c AS o_custkey)
          FROM read_parquet('{base}/orders.parquet'),
               unnest(range(0, {copies})) AS u(c)
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)
        """
    )


def build(base: str, copies: int, out: str) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    for t in [
        "region", "nation", "customer", "supplier",
        "part", "orders", "lineitem", "events",
    ]:
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT doc_id + 100000 * c AS doc_id,
                 CASE WHEN (doc_id + c) % 10 < 3 AND c > 0
                      THEN text || ' copytok' || c ELSE text END AS text,
                 lang, source,
                 CASE WHEN (doc_id + c) % 10 < 3 AND c > 0
                      THEN n_chars + 8 + strlen(CAST(c AS VARCHAR))
                      ELSE n_chars END AS n_chars
          FROM read_parquet('{base}/documents.parquet'),
               unnest(range(0, {copies})) AS u(c)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT vec_id + 100000 * c AS vec_id, embedding, label
          FROM read_parquet('{base}/embeddings.parquet'),
               unnest(range(0, {copies})) AS u(c)
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--all", action="store_true", help="include llm_dedup_substring")
    ap.add_argument(
        "--skew",
        action="store_true",
        help="run the Zipf-skewed tier (planted hot keys) instead of the 10x uniform tier",
    )
    ap.add_argument(
        "--graph",
        action="store_true",
        help="run the graph tier (edge side replicated copies-x; each op timed at 1x and copies-x)",
    )
    ap.add_argument(
        "--ann",
        action="store_true",
        help="run the ANN index tier (cold build vs warm probe split + recall gates; default --copies applies, 1500 recommended)",
    )
    ap.add_argument(
        "--events",
        action="store_true",
        help="run the events tier (incremental/CDC/SCD2/sessionization ops timed at 1x and copies-x; no other tier replicates events)",
    )
    ap.add_argument(
        "--hot-subject",
        action="store_true",
        help="events tier only: reassign 1%% of all rows to one erasure subject (hot-subject skew for inc_subject_erasure)",
    )
    ap.add_argument(
        "--bpe",
        action="store_true",
        help="run the BPE trainer cost-curve tier (sequential at 8/32/128 merges + batched k=8 at a 128-merge budget, uniform corpus at --copies)",
    )
    ap.add_argument(
        "--bpe-256",
        action="store_true",
        help="run the real-vocab BPE tier (VERDICT r13 item 6): one 256-merge budget measured three ways — sequential x256, batched k=64 x 4 rounds, batched k=16 x 16 rounds — recording realized merges/round (interference yield), uniform corpus at --copies",
    )
    ap.add_argument(
        "--dedup-first",
        action="store_true",
        help="ANN tier only: collapse near-dup vectors (32-bit sign signature) before index build — measures the addendum-24 remedy",
    )
    ap.add_argument(
        "--only",
        default=None,
        help="CSV of op names: restrict the selected tier's op list (ops must belong to that tier's list)",
    )
    ap.add_argument(
        "--dup-fraction",
        type=float,
        default=1.0,
        help="ANN tier only: fraction of copies kept inside the near-dup band (VERDICT r10 item 4 low-dup regime); others get 0.5-amplitude perturbation and survive dedup as unique vectors",
    )
    ap.add_argument(
        "--perturb",
        type=float,
        default=0.001,
        help="ANN tier per-copy embedding perturbation amplitude (addendum 24: sweeping this separates quantizer code-collision recall floors from genuine index misses)",
    )
    ap.add_argument(
        "--prune",
        action="store_true",
        help="run the corpus-prune tier (VERDICT r12 items 5+6): collapse-first vs prune-only A/B on the dup-heavy corpus, plus a band-count recall sweep on a wide-perturb variant",
    )
    ap.add_argument(
        "--crossset",
        action="store_true",
        help="run the cross-set semantic screen tier (VERDICT r13 item 3): incremental batch-vs-standing screen at two batch sizes vs the corpus-global re-prune, on the dup-heavy corpus",
    )
    ap.add_argument(
        "--bands-perturb",
        type=float,
        default=0.15,
        help="prune tier: perturbation amplitude of the band-sweep corpus — wide enough that sign bits genuinely flip, so band count measurably moves planted-dup recall (at the near-dup 0.001 amplitude every band catches everything and the sweep is vacuous)",
    )
    args = ap.parse_args()

    import etl_suite_spark  # noqa: F401
    from etl_suite_spark.registry import QUERIES
    from etl_suite_spark.session import get_spark

    def restrict(ops: list[str], tier: str) -> list[str]:
        """Apply --only to a tier's op list (every tier honors it)."""
        if not args.only:
            return ops
        wanted = [s.strip() for s in args.only.split(",") if s.strip()]
        if not wanted:
            raise SystemExit("--only given but no op names parsed from it")
        unknown = sorted(set(wanted) - set(ops))
        if unknown:
            raise SystemExit(
                f"--only ops not in the {tier} tier's list {ops}: {unknown}"
            )
        return wanted

    # Reclaim materialize_once artifacts minted DURING this run: they are
    # keyed on the throwaway temp-corpus path, so no later process can
    # ever hit them — without this each ANN/graph smoke run leaves
    # ~0.5-1.5 GB of dead index/edge artifacts under /tmp forever (a
    # 100x-tier run filled the sandbox disk mid-shuffle; addendum 38).
    # Fixture-keyed artifacts recreated during the run are also swept —
    # they are caches and rebuild on next use.
    import atexit
    import glob as _glob

    _pre_mats = set(_glob.glob(os.path.join(tempfile.gettempdir(), "etl_mat_*")))

    @atexit.register
    def _sweep_run_minted_artifacts():
        for d in set(
            _glob.glob(os.path.join(tempfile.gettempdir(), "etl_mat_*"))
        ) - _pre_mats:
            shutil.rmtree(d, ignore_errors=True)

    out = os.path.join(tempfile.mkdtemp(prefix="etl_scale_"), "sfx")
    if args.skew:
        build_skewed(args.base, out)
    elif args.events:
        build_events(args.base, args.copies, out, hot_subject=args.hot_subject)
    elif args.graph:
        build_graph(args.base, args.copies, out)
    elif args.ann or args.prune or args.crossset:
        build_ann(args.base, args.copies, out, perturb=args.perturb,
                  dup_fraction=args.dup_fraction)
        dedup_counts = None
        if args.dedup_first:
            dedup_counts = dedup_embeddings(out)
    else:
        build(args.base, args.copies, out)

    spark = get_spark("etl-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    if args.crossset:
        # Cross-set semantic screen tier (VERDICT r13 item 3): the
        # incremental-SemDeDup economics, measured.  On the dup-heavy
        # corpus: (1) build the banded cells once (the standing-index
        # artifact — production amortizes this; the batch's share of
        # the projection pass is batch-proportional), then time the
        # batch-vs-standing screen KERNEL at two batch sizes (10% and
        # 1% of ids) against the same standing corpus, and the
        # corpus-global re-prune kernel as the comparator.  The claim
        # under test: screen cost tracks the PROBING BATCH
        # (sum_c n_batch_c x n_standing_c), not the corpus (sum_c
        # n_c^2) — the crossset economics that make day-to-day ingest
        # screening affordable where nightly global re-prunes are not.
        # Timer scope (addendum-53 discipline): cells_build_sec covers
        # projections for ALL rows incl. the localCheckpoint; each
        # screen/global row is kernel-only on the prebuilt cells.
        import math

        from pyspark.sql import functions as _F

        from etl_suite_spark.llm.similarity import (
            _semdedup_corpus,
            _semdedup_crossset_hits,
            _semdedup_dropped,
        )

        def budget_bits(n: int) -> int:
            # 21 = the projection family's per-band cap
            return min(21, max(3, math.ceil(math.log2(max(n, 1) / 50))))

        timings = {}
        n_vec = spark.read.parquet(f"{out}/embeddings.parquet").count()
        bits = budget_bits(n_vec)
        t0 = time.perf_counter()
        corpus = _semdedup_corpus(spark, out, bits=bits)
        timings["cells_build"] = {
            "sec": round(time.perf_counter() - t0, 3),
            "rows": n_vec,
            "bits_per_band": bits,
        }

        # The ingest batch is the LAST g copy GENERATIONS (vec_id >=
        # 100000*(copies-g)) — a perturbed re-crawl of standing content,
        # the realistic ingest shape.  NOT a vec_id % m split: copy ids
        # are base + 100000*c, so % m selects entire dup CLOUDS into the
        # batch, their siblings land in the batch too, and the cross-set
        # screen (correctly) finds nothing standing to drop against —
        # the first run of this tier measured exactly that 0-hit artifact
        # at the 1% split, the batch-internal blindness the pytest pins.
        for g, label in (
            (max(1, args.copies // 10), "screen_batch_10pct"),
            (max(1, args.copies // 100), "screen_batch_1pct"),
        ):
            cut = 100000 * (args.copies - g)
            e = corpus.withColumn(
                "is_batch", (_F.col("vec_id") >= cut).cast("int")
            )
            n_batch = e.filter("is_batch = 1").count()
            t0 = time.perf_counter()
            hits = _semdedup_crossset_hits(e)
            n_hits = hits.count()
            n_dropped = hits.select("vec_id").distinct().count()
            timings[label] = {
                "sec": round(time.perf_counter() - t0, 3),
                "generations": g,
                "n_batch": n_batch,
                "n_standing": n_vec - n_batch,
                "n_hit_pairs": n_hits,
                "n_batch_dropped": n_dropped,
                "drop_rate": round(n_dropped / max(n_batch, 1), 4),
            }

        t0 = time.perf_counter()
        n_drop_global = _semdedup_dropped(corpus).count()
        timings["global_reprune"] = {
            "sec": round(time.perf_counter() - t0, 3),
            "rows": n_vec,
            "n_dropped": n_drop_global,
        }

        print(
            json.dumps(
                {
                    "metric": "scale_smoke_crossset",
                    "tier": "crossset",
                    "copies": args.copies,
                    "base": args.base,
                    "perturb": args.perturb,
                    "queries": timings,
                }
            )
        )
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        return

    if args.prune:
        # Corpus-prune tier (VERDICT r12 items 5+6).
        #
        # A/B (item 5, the dedup-before-index economics applied to
        # SemDeDup): on the dup-heavy corpus, (a) prune-only — the
        # semantic kernel over all rows — vs (b) collapse-first — the
        # 32-bit sign-signature exact collapse, materialize the
        # representatives, then the semantic kernel sized to the
        # collapsed corpus.  Collapse removes exactly the near-dup mass
        # that makes semdedup cells quadratic hotspots, so (b)'s kernel
        # cost shrinks by the collapse ratio squared.
        #
        # Band sweep (item 6): on a WIDE-perturbation variant (sign
        # bits genuinely flip), planted-dup recall per band count — the
        # measured form of the more-narrower-bands rule.  Ground truth
        # is by construction: every copy row (vec_id >= 100000) has an
        # earlier in-band tau-neighbor, so recall = dropped planted
        # rows / planted rows.  Monotonicity is a sentinel: a band
        # count that LOWERS recall fails the run.
        import math

        from etl_suite_spark.llm.similarity import (
            _dedup_reps,
            _semdedup_corpus,
            _semdedup_corpus_banded,
            _semdedup_dropped,
        )

        if args.dup_fraction != 1.0:
            raise SystemExit(
                "--prune requires the full-duplication corpus "
                "(planted-recall ground truth assumes every copy is in-band)"
            )
        if args.dedup_first:
            raise SystemExit(
                "--prune is incompatible with --dedup-first: the flag "
                "would pre-collapse the corpus the prune-only arm is "
                "supposed to measure dup-heavy (bogus ~1x speedup) and "
                "shrink the sweep's planted denominator below its "
                "numerator — the tier runs its own collapse arm"
            )

        def budget_bits(n: int) -> int:
            # 21 = the projection family's per-band cap
            return min(21, max(3, math.ceil(math.log2(max(n, 1) / 50))))

        timings = {}
        n_vec = spark.read.parquet(f"{out}/embeddings.parquet").count()
        n_base = (
            spark.read.parquet(f"{out}/embeddings.parquet")
            .filter("vec_id < 100000")
            .count()
        )

        # --- A: prune-only ---
        bits = budget_bits(n_vec)
        t0 = time.perf_counter()
        corpus = _semdedup_corpus(spark, out, bits=bits)
        n_drop_a = _semdedup_dropped(corpus).count()
        wall_a = round(time.perf_counter() - t0, 3)
        timings["prune_only"] = {
            "sec": wall_a,
            "bits_per_band": bits,
            "rows": n_vec,
            "n_dropped": n_drop_a,
            "n_survivors": n_vec - n_drop_a,
        }

        # --- B: collapse-first (materializes the rep corpus, honestly
        # included in the collapse wall) ---
        rep_dir = os.path.join(os.path.dirname(out), "reps")
        t0 = time.perf_counter()
        _dedup_reps(spark, out).write.mode("overwrite").parquet(
            f"{rep_dir}/embeddings.parquet"
        )
        n_reps = spark.read.parquet(f"{rep_dir}/embeddings.parquet").count()
        wall_collapse = round(time.perf_counter() - t0, 3)
        bits_b = budget_bits(n_reps)
        t0 = time.perf_counter()
        rep_corpus = _semdedup_corpus(spark, rep_dir, bits=bits_b)
        n_drop_b = _semdedup_dropped(rep_corpus).count()
        wall_b = round(time.perf_counter() - t0, 3)
        timings["collapse_first"] = {
            "collapse_sec": wall_collapse,
            "prune_sec": wall_b,
            "total_sec": round(wall_collapse + wall_b, 3),
            "bits_per_band": bits_b,
            "n_reps": n_reps,
            "n_sem_dropped": n_drop_b,
            "n_survivors": n_reps - n_drop_b,
            "speedup_vs_prune_only": round(
                wall_a / max(wall_collapse + wall_b, 1e-9), 2
            ),
        }

        # --- C: the D4 prototype stage over the semantic survivors
        # (linear — the paper's order puts it after both prunes; this
        # measures the marginal cost of completing the full funnel) ---
        from pyspark.sql import Window as _W
        from pyspark.sql import functions as _F

        from etl_suite_spark.llm.similarity import (
            _PROTO_PRUNE_FRAC,
            _proto_scores,
            _semdedup_dropped,
        )

        t0 = time.perf_counter()
        surv = rep_corpus.join(
            _semdedup_dropped(rep_corpus), "vec_id", "left_anti"
        )
        scores = _proto_scores(surv)
        w = _W.partitionBy("cell_a").orderBy(
            _F.col("proto").desc(), _F.col("vec_id").asc()
        )
        n_proto_pruned = (
            scores.withColumn("rn", _F.row_number().over(w))
            .filter(
                _F.col("rn")
                <= _F.floor(_F.col("n_cell") / _PROTO_PRUNE_FRAC)
            )
            .count()
        )
        wall_c = round(time.perf_counter() - t0, 3)
        timings["proto_stage"] = {
            "sec": wall_c,
            "n_survivors_in": n_reps - n_drop_b,
            "n_proto_pruned": n_proto_pruned,
            "d4_total_sec": round(wall_collapse + wall_b + wall_c, 3),
        }

        # --- band sweep on the wide-perturb variant ---
        sweep_dir = os.path.join(os.path.dirname(out), "sweep")
        build_ann(args.base, args.copies, sweep_dir,
                  perturb=args.bands_perturb, dup_fraction=1.0)
        n_planted = n_vec - n_base
        # validate the synthetic corpus BEFORE trusting the recall
        # denominator (the addendum-44 discipline): at wide
        # --bands-perturb some planted copies may genuinely fall below
        # tau vs their base — count the ones still in-band-eligible
        # (exact integer cosine vs own base) and report recall against
        # BOTH denominators.
        import duckdb as _duckdb

        from etl_suite_spark.llm.similarity import _SEMDEDUP_TAU

        _con = _duckdb.connect()
        n_planted_valid = _con.execute(
            f"""
            SELECT COUNT(*) FROM
              read_parquet('{sweep_dir}/embeddings.parquet') p
            JOIN read_parquet('{sweep_dir}/embeddings.parquet') b
              ON b.vec_id = p.vec_id % 100000 AND p.vec_id >= 100000
            WHERE list_sum(list_transform(range(1, 65), i ->
                    CAST(round(p.embedding[i] * 1000000) AS BIGINT)
                    * CAST(round(b.embedding[i] * 1000000) AS BIGINT)))
                  / sqrt(
                    CAST(list_sum(list_transform(range(1, 65), i ->
                      CAST(round(p.embedding[i] * 1000000) AS BIGINT)
                      * CAST(round(p.embedding[i] * 1000000) AS BIGINT)))
                      AS DOUBLE)
                    * CAST(list_sum(list_transform(range(1, 65), i ->
                      CAST(round(b.embedding[i] * 1000000) AS BIGINT)
                      * CAST(round(b.embedding[i] * 1000000) AS BIGINT)))
                      AS DOUBLE))
                  >= {_SEMDEDUP_TAU}
            """
        ).fetchone()[0]
        _con.close()
        sweep_bits = min(budget_bits(n_vec), 42 // 3)  # 3 bands max fits 42
        prev_recall = -1.0
        sweep_failures = []
        for bands in (1, 2, 3):
            cols = tuple(f"cell_{i}" for i in range(bands))
            t0 = time.perf_counter()
            bc = _semdedup_corpus_banded(
                spark, sweep_dir, bands=bands, bits=sweep_bits
            )
            dropped = _semdedup_dropped(bc, cell_cols=cols)
            n_planted_dropped = dropped.filter("vec_id >= 100000").count()
            wall = round(time.perf_counter() - t0, 3)
            recall = round(n_planted_dropped / max(n_planted, 1), 4)
            timings[f"band_sweep_b{bands}"] = {
                "sec": wall,
                "bands": bands,
                "bits_per_band": sweep_bits,
                "n_planted": n_planted,
                # corpus validation, not a recall denominator: planted
                # rows whose cosine vs their OWN base clears tau (a
                # LOWER bound on tau-eligible rows — drops can also
                # arrive via sibling copies or natural neighbors; a
                # sweep where this is far below n_planted means the
                # chosen --bands-perturb left the near-dup band and
                # planted_recall reads as coverage, not recall)
                "n_planted_valid_vs_base": n_planted_valid,
                "n_planted_dropped": n_planted_dropped,
                "planted_recall": recall,
            }
            if recall < prev_recall:
                sweep_failures.append(
                    f"bands={bands} recall {recall} < bands={bands - 1} "
                    f"{prev_recall}"
                )
            prev_recall = recall

        print(
            json.dumps(
                {
                    "metric": "scale_smoke_prune",
                    "tier": "prune",
                    "copies": args.copies,
                    "base": args.base,
                    "perturb": args.perturb,
                    "bands_perturb": args.bands_perturb,
                    "band_monotonicity": (
                        ("FAIL: " + "; ".join(sweep_failures))
                        if sweep_failures
                        else "pass"
                    ),
                    "queries": timings,
                }
            )
        )
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        if sweep_failures:
            raise SystemExit(
                "band-count recall monotonicity violated: "
                + "; ".join(sweep_failures)
            )
        return

    if args.ann:
        from etl_suite_spark.llm.dedup import _corpus_signatures

        QUERIES["llm_sim_cosine_topk"](spark, args.base).count()  # warmup
        ann_ops = restrict(
            ANN_INDEX_OPS + ["minhash_signatures", "semdedup_wide"]
            + ANN_RECALL_OPS,
            "ann",
        )
        timings = {}
        for name in [n for n in ANN_INDEX_OPS if n in ann_ops]:
            t0 = time.perf_counter()
            n = QUERIES[name](spark, out).count()
            cold = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            QUERIES[name](spark, out).count()
            warm = round(time.perf_counter() - t0, 3)
            timings[name] = {
                "cold_sec": cold,
                "warm_probe_sec": warm,
                "index_build_sec": round(cold - warm, 3),
                "rows": n,
            }
        if "minhash_signatures" in ann_ops:
            t0 = time.perf_counter()
            nsig = _corpus_signatures(spark, out).count()
            cold = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            _corpus_signatures(spark, out).count()
            warm = round(time.perf_counter() - t0, 3)
            timings["minhash_signatures"] = {
                "cold_sec": cold,
                "warm_probe_sec": warm,
                "index_build_sec": round(cold - warm, 3),
                "rows": nsig,
            }
        if "semdedup_wide" in ann_ops:
            # SemDeDup at tier scale: SAME projection family as the
            # registered llm_semdedup, band width scaled so per-cell
            # quadratic work stays bounded (bits ~ log2(rows / 50), i.e.
            # ~50-row cells — SemDeDup's clusters-proportional-to-corpus
            # rule; the first cut targeted ~600-row cells and paid 268 s
            # at 20 k rows in per-pair dot folds). Reports
            # the prune wall plus dup-mass accounting; correctness is
            # the fixture-scale full-hash oracle, this is the cost and
            # drop-mass measurement.
            import math

            from etl_suite_spark.llm.similarity import (
                _semdedup_corpus,
                _semdedup_dropped,
            )

            n_vec = spark.read.parquet(f"{out}/embeddings.parquet").count()
            bits = min(21, max(3, math.ceil(math.log2(max(n_vec, 1) / 50))))  # 21 = the projection family's per-band cap
            corpus = _semdedup_corpus(spark, out, bits=bits)
            t0 = time.perf_counter()
            n_dropped = _semdedup_dropped(corpus).count()
            wall = round(time.perf_counter() - t0, 3)
            timings["semdedup_wide"] = {
                "sec": wall,
                "bits_per_band": bits,
                "rows": n_vec,
                "n_dropped": n_dropped,
                "n_survivors": n_vec - n_dropped,
            }
        for name in [n for n in ANN_RECALL_OPS if n in ann_ops]:
            t0 = time.perf_counter()
            row = QUERIES[name](spark, out).collect()[0].asDict()
            timings[name] = {
                "sec": round(time.perf_counter() - t0, 3),
                "result": dict(row),
            }
        sentinel_applies, sentinel_failures = check_recall_sentinel(
            args.copies, args.perturb, args.dedup_first, args.only, timings,
            dup_fraction=args.dup_fraction,
        )
        print(
            json.dumps(
                {
                    "metric": "scale_smoke_ann",
                    "tier": "ann",
                    "copies": args.copies,
                    "base": args.base,
                    "dedup_first": (
                        {"rows_before": dedup_counts[0], "rows_after": dedup_counts[1]}
                        if dedup_counts
                        else None
                    ),
                    "recall_sentinel": (
                        ("FAIL: " + "; ".join(sentinel_failures))
                        if sentinel_failures
                        else ("pass" if sentinel_applies else None)
                    ),
                    "queries": timings,
                }
            )
        )
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        if sentinel_failures:
            raise SystemExit(
                "ANN recall sentinel deviation (addenda 24/26 pinned matrix): "
                + "; ".join(sentinel_failures)
            )
        return

    if args.events:
        events_ops = restrict(EVENTS_OPS, "events")
        QUERIES[events_ops[0]](spark, args.base).count()  # warmup
        timings = {}
        for name in events_ops:
            t0 = time.perf_counter()
            n1 = QUERIES[name](spark, args.base).count()
            base_sec = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            nx = QUERIES[name](spark, out).count()
            scaled_sec = round(time.perf_counter() - t0, 3)
            timings[name] = {
                "base_sec": base_sec,
                "scaled_sec": scaled_sec,
                "ratio": round(scaled_sec / base_sec, 2) if base_sec else None,
                "base_rows": n1,
                "scaled_rows": nx,
            }
        print(
            json.dumps(
                {
                    "metric": "scale_smoke_events_ratio",
                    "tier": "events",
                    "copies": args.copies,
                    "base": args.base,
                    "queries": timings,
                }
            )
        )
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        return

    if args.bpe_256:
        # VERDICT r13 item 6: the ~125-rounds-for-32k claim (addendum
        # 27) is extrapolated from k=8 x 16 rounds, which realized only
        # 60/128 merges — a 47% interference yield that the claim's
        # arithmetic ignores.  Measure ONE 256-merge budget for real,
        # three ways, on the same corpus: sequential x 256 (the
        # one-merge comparator), batched k=64 x 4 (few wide rounds),
        # batched k=16 x 16 (many narrow rounds).  The question each
        # answers: how much of k survives the non-interference filter
        # per round (wide rounds lose more — candidates {a,b,merged}
        # overlap), and what that does to wall per REALIZED merge.
        from etl_suite_spark.llm.textstats import _bpe_fit, _bpe_fit_batched

        QUERIES["llm_bpe_train"](spark, args.base).count()  # warmup
        timings = {}
        t0 = time.perf_counter()
        merges, _seg = _bpe_fit(spark, out, n_merges=256)
        timings["sequential_256"] = {
            "sec": round(time.perf_counter() - t0, 3),
            "merges": len(merges),
            "rounds": 256,
            "merges_per_round": round(len(merges) / 256, 3),
        }
        for k, rounds in ((64, 4), (16, 16)):
            t0 = time.perf_counter()
            merges, _seg = _bpe_fit_batched(spark, out, k=k, rounds=rounds)
            timings[f"batched_k{k}_x{rounds}rounds"] = {
                "sec": round(time.perf_counter() - t0, 3),
                "merges": len(merges),
                "rounds": rounds,
                "merges_per_round": round(len(merges) / rounds, 3),
                "yield_vs_budget": round(len(merges) / 256, 4),
            }
        seq = timings["sequential_256"]
        print(
            json.dumps(
                {
                    "metric": "scale_smoke_bpe_256",
                    "tier": "bpe256",
                    "copies": args.copies,
                    "base": args.base,
                    "sec_per_realized_merge": {
                        name: round(t["sec"] / max(1, t["merges"]), 4)
                        for name, t in timings.items()
                    },
                    "speedup_vs_sequential": {
                        name: round(
                            (seq["sec"] / seq["merges"])
                            / (t["sec"] / max(1, t["merges"])),
                            2,
                        )
                        for name, t in timings.items()
                        if name != "sequential_256"
                    },
                    "queries": timings,
                }
            )
        )
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        return

    if args.bpe:
        # VERDICT r8 item 5: the sequential trainer's scale axis is the
        # DRIVER LOOP (merge count), not the corpus — measure the
        # merge-count cost curve at this corpus tier, plus the batched
        # trainer at an equivalent 128-merge budget.
        from etl_suite_spark.llm.textstats import _bpe_fit, _bpe_fit_batched

        QUERIES["llm_bpe_train"](spark, args.base).count()  # warmup
        timings = {}
        for n in (8, 32, 128):
            t0 = time.perf_counter()
            merges, _seg = _bpe_fit(spark, out, n_merges=n)
            timings[f"sequential_{n}"] = {
                "sec": round(time.perf_counter() - t0, 3),
                "merges": len(merges),
            }
        t0 = time.perf_counter()
        merges, _seg = _bpe_fit_batched(spark, out, k=8, rounds=16)
        timings["batched_k8_x16rounds"] = {
            "sec": round(time.perf_counter() - t0, 3),
            "merges": len(merges),
        }
        s8, s32, s128 = (timings[f"sequential_{n}"]["sec"] for n in (8, 32, 128))
        print(
            json.dumps(
                {
                    "metric": "scale_smoke_bpe_cost_curve",
                    "tier": "bpe",
                    "copies": args.copies,
                    "base": args.base,
                    "per_merge_marginal_sec": {
                        "seq_8_to_32": round((s32 - s8) / 24, 4),
                        "seq_32_to_128": round((s128 - s32) / 96, 4),
                        "batched_total_per_merge": round(
                            timings["batched_k8_x16rounds"]["sec"]
                            / max(1, timings["batched_k8_x16rounds"]["merges"]),
                            4,
                        ),
                    },
                    "queries": timings,
                }
            )
        )
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        return

    if args.graph:
        graph_ops = restrict(GRAPH_OPS, "graph")
        QUERIES[graph_ops[0]](spark, args.base).count()  # warmup

        def reclaim_blocks():
            """Free superseded localCheckpoint blocks between ops.
            Each iterative graph op checkpoints per-round state; the
            blocks are reclaimed by ContextCleaner only after BOTH the
            Python references and the JVM RDDs are garbage-collected,
            which lags under pressure — at 100 copies the five ops'
            accumulated blocks OOM'd a shared session that each op
            passes alone (addendum 38). Separate applications get this
            isolation for free; a shared measurement session forces it."""
            import gc as _gc

            _gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(1)  # let ContextCleaner drain its reference queue

        timings = {}
        for name in graph_ops:
            reclaim_blocks()
            t0 = time.perf_counter()
            n1 = QUERIES[name](spark, args.base).count()
            base_sec = round(time.perf_counter() - t0, 3)
            reclaim_blocks()
            t0 = time.perf_counter()
            nx = QUERIES[name](spark, out).count()
            scaled_sec = round(time.perf_counter() - t0, 3)
            timings[name] = {
                "base_sec": base_sec,
                "scaled_sec": scaled_sec,
                "ratio": round(scaled_sec / base_sec, 2) if base_sec else None,
                "base_rows": n1,
                "scaled_rows": nx,
            }
        print(
            json.dumps(
                {
                    "metric": "scale_smoke_graph_ratio",
                    "tier": "graph",
                    "copies": args.copies,
                    "base": args.base,
                    "queries": timings,
                }
            )
        )
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        return

    ops = SKEW_OPS if args.skew else OPS + (["llm_dedup_substring"] if args.all else [])
    ops = restrict(ops, "skew" if args.skew else "uniform")
    QUERIES[ops[0]](spark, out).count()  # warmup

    timings = {}
    for name in ops:
        t0 = time.perf_counter()
        n = QUERIES[name](spark, out).count()
        timings[name] = {"sec": round(time.perf_counter() - t0, 3), "rows": n}
    if not args.skew and "llm_ngram_kneser_ney" in ops:
        # VERDICT r6 item 3: time the Kneser-Ney scorer in BOTH broadcast
        # regimes — the gated-off form (broadcast_gate_bytes=0 → no hint,
        # AQE decides) is what a 100 TB corpus would plan.
        t0 = time.perf_counter()
        n = QUERIES["llm_ngram_kneser_ney"](spark, out, broadcast_gate_bytes=0).count()
        timings["llm_ngram_kneser_ney_nogate"] = {
            "sec": round(time.perf_counter() - t0, 3),
            "rows": n,
        }
    print(
        json.dumps(
            {
                "metric": "scale_smoke_wall_sec",
                "tier": "skew" if args.skew else "uniform",
                "copies": None if args.skew else args.copies,
                "base": args.base,
                "value": round(sum(v["sec"] for v in timings.values()), 3),
                "queries": timings,
            }
        )
    )
    shutil.rmtree(os.path.dirname(out), ignore_errors=True)


if __name__ == "__main__":
    main()
