"""End-to-end LLM corpus preparation — the operators composed into the
pipeline a training-data team actually runs (BASELINE.json:6 mandate,
demonstrated as one lazy plan):

    scrub PII → exact-dedup → near-dedup (MinHash-LSH) → benchmark
    decontamination → quality filter (token floor + Gopher repetition
    gate) → chunk → language-partitioned parquet corpus

Every stage is the already-oracle-checked operator from this package; the
composition itself is rows-only (the intermediate sink path is a temp dir)
and pinned by pytest invariants: monotone row accounting per stage, no
surviving near-dup pairs, all chunks within size bounds.

Scale shape: one filter-pushdown scan; the only shuffles are the dedup
hash-agg, the LSH band join (colliding pairs only), and the final
partitioned write. Quality scoring and chunking are map-only.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query
from .dedup import _normalized_text, llm_dedup_minhash


def prepare_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    min_quality_tokens: int = 20,
    chunk_size: int = 32,
    chunk_stride: int = 16,
) -> dict[str, DataFrame]:
    """Run the full preparation pipeline; returns each stage's frame so
    callers (and tests) can audit per-stage row accounting."""
    docs = load_table(spark, sf_dir, "documents")

    # 1. PII scrub (map-only; patterns in the Java∩RE2 subset).
    email_re = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    phone_re = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}"
    scrubbed = docs.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace("text", email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ),
    )

    # 2. Exact dedup: keep the smallest doc_id per normalized content hash.
    hashed = scrubbed.withColumn("content_hash", F.sha2(_normalized_text(), 256))
    keep = hashed.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    exact_deduped = hashed.join(keep, ["content_hash", "doc_id"]).drop("content_hash")

    # 3. Near-dedup: MinHash-LSH candidate pairs (est_jaccard ≥ 0.5);
    #    drop the higher doc_id of each pair (union-find is overkill at
    #    this threshold — the canonical doc survives transitively because
    #    every pair member maps to the pair's minimum).
    pairs = llm_dedup_minhash(spark, sf_dir)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    near_deduped = exact_deduped.join(losers, "doc_id", "left_anti")

    # 4. Benchmark decontamination: the eval split (doc_id % 50 == 0)
    #    never enters the corpus, and any training doc sharing a 3-gram
    #    with it is dropped (broadcast semi-join on the shingle — the
    #    eval shingle set is small by construction).
    from .dedup import _shingles

    sh = _shingles(docs)
    bench_sh = sh.filter(F.col("doc_id") % 50 == 0).select("shingle").distinct()
    dirty = (
        sh.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    decontaminated = (
        near_deduped.filter(F.col("doc_id") % 50 != 0)
        .join(dirty, "doc_id", "left_anti")
    )

    # 5. Quality gate: token-count floor (map-only) + Gopher repetition
    #    verdict (two uniform-key groupBys, computed on the survivors).
    from .traindata import gopher_metrics

    keep_ids = gopher_metrics(decontaminated).filter(F.col("keep")).select("doc_id")
    with_tokens = decontaminated.withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    quality = with_tokens.filter(F.col("n_tokens") >= min_quality_tokens).join(
        keep_ids, "doc_id", "left_semi"
    )

    # 6. Chunk: sliding token windows (map-only explode).
    chunks = (
        quality.select("doc_id", "lang", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            "lang",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, int(ceil(size(w) / {chunk_stride}.0)) - 1),"
                    f" i -> concat_ws(' ', slice(w, i * {chunk_stride} + 1, {chunk_size})))"
                )
            ).alias("chunk_idx", "chunk_text"),
            F.size("w").alias("nw"),
        )
        .filter(F.col("chunk_idx") * chunk_stride < F.col("nw"))
        .drop("nw")
    )

    # 7. Language-partitioned corpus sink (directory pruning downstream).
    out = out_dir or os.path.join(tempfile.mkdtemp(prefix="etl_corpus_"), "corpus")
    chunks.write.mode("overwrite").partitionBy("lang").parquet(out)

    return {
        "input": docs,
        "exact_deduped": exact_deduped,
        "near_deduped": near_deduped,
        "decontaminated": decontaminated,
        "quality": quality,
        "chunks": spark.read.parquet(out),
    }


@query("llm_corpus_pipeline")  # rows-only: composition with a tmp sink
def llm_corpus_pipeline(spark, sf_dir):
    """The whole preparation pipeline, summarized per language: documents
    in → survivors per stage → chunks out. The per-stage frames are
    asserted in tests/test_llm.py (row accounting, no surviving near-dups,
    chunk-size bounds)."""
    stages = prepare_corpus(spark, sf_dir)
    per_lang = (
        stages["chunks"]
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_chunks"),
        )
    )
    totals = (
        stages["input"].groupBy("lang").agg(F.count("*").alias("n_input_docs"))
    )
    return (
        totals.join(per_lang, "lang")
        .select("lang", "n_input_docs", "n_docs", "n_chunks")
        .orderBy("lang")
    )
