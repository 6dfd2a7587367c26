"""Text analysis for LLM training-data pipelines (SURVEY.md §2.10 + the
training-data mandate in BASELINE.json:6).

All operators run on ``documents`` and stay entirely JVM-side (split/
explode/agg built-ins — no Python in the hot path), so they scale as plain
shuffles on (lang)/(doc_id)/(word) keys:

- corpus stats per language (docs, tokens, vocabulary, avg length)
- TF-IDF top terms per document (pure DataFrame, not MLlib, so it's
  oracle-checkable and has no driver-side vocabulary broadcast)
- heuristic language ID via stopword-list hit rates
- quality scoring (length / type-token ratio / word-length shape)
- token counting: whitespace tokens + a BPE-ish regex token count
- document fingerprinting: winnowing over rolling shingle hashes
- routing: partitioned-by-language sink

Literature (public): Schleimer, Wilkerson & Aiken, "Winnowing: local
algorithms for document fingerprinting" (SIGMOD 2003) — the fingerprint
operator; Salton & Buckley (1988) — TF-IDF weighting.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import as_long, d2d, davg, sql_davg
from ..io import byte_gated_broadcast, load_table
from ..registry import query


def _words(df):
    return df.select(
        "doc_id", "lang", "source", F.explode(F.split("text", " ")).alias("word")
    )


@query(
    "llm_text_stats",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
    ), wa AS (
      SELECT lang, COUNT(*) AS n_tokens, COUNT(DISTINCT word) AS vocab
      FROM w GROUP BY lang
    ), da AS (
      SELECT lang, COUNT(*) AS n_docs,
             CAST({sql_davg('n_chars', 0)} AS DOUBLE) AS avg_chars
      FROM documents GROUP BY lang
    )
    SELECT da.lang, n_docs, n_tokens, vocab, round(avg_chars, 6) AS avg_chars
    FROM da JOIN wa ON da.lang = wa.lang
    """,
)
def llm_text_stats(spark, sf_dir):
    """Per-language corpus statistics: two independent aggregations (doc
    grain + token grain) joined on lang — never a fan-out then re-dedup."""
    d = load_table(spark, sf_dir, "documents")
    w = _words(d)
    wa = w.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("word").alias("vocab"),
    )
    da = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(davg("n_chars", 0), 6).alias("avg_chars"),
    )
    return da.join(wa, "lang").select(
        "lang", "n_docs", "n_tokens", "vocab", "avg_chars"
    )


@query(
    "llm_text_tfidf",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word
    ), df AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY word
    ), n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT tf.doc_id, tf.word AS term,
           round(tf.tf * ln(n.n * 1.0 / df.df), 6) AS tfidf
    FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
    QUALIFY row_number() OVER (
        PARTITION BY tf.doc_id
        ORDER BY round(tf.tf * ln(n.n * 1.0 / df.df), 6) DESC, tf.word ASC) <= 3
    """,
)
def llm_text_tfidf(spark, sf_dir):
    """Top-3 TF-IDF terms per document.

    DF (document frequency) is keyed on words — DISTINCT-WORD-sized,
    which grows near-linearly with corpus tokens by Heaps' law, NOT
    vocab-bounded — so its broadcast hint is GATED on measured corpus
    bytes via ``_lm_count_table_hint`` (VERDICT r7 "What's wrong" #1:
    the unconditional hint here was the same trap r7 fixed for the LM
    count tables). Under the gate the broadcast is strictly best; over
    it no hint is planted and the tf⋈df join falls back to a word-keyed
    shuffle that co-partitions with the aggregation that BUILT dfreq,
    with AQE free to re-plan from runtime sizes. N folds in as a
    broadcast one-row aggregate (the tpch_q11 pattern) instead of a
    driver-side count(), so plan construction launches no Spark job and
    the value always reflects the executed data. At 100 TB the only big
    shuffles are the two word-keyed aggregations.
    """
    d = load_table(spark, sf_dir, "documents")
    hint = _lm_count_table_hint(spark, sf_dir)
    w = _words(d).select("doc_id", "word")
    tf = w.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = w.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").cast("double").alias("tfidf_n_docs"))
    scored = (
        tf.join(hint(dfreq), "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.col("word").alias("term"),
            F.round(
                F.col("tf") * F.log(F.col("tfidf_n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


# Tiny per-language stopword marker lists for the heuristic language ID.
# Real language ID uses char n-gram profiles (same plumbing, richer
# features); the fixture corpus shares one vocabulary so this demonstrates
# the *mechanics* — scoring + argmax — not linguistic accuracy.
_MARKERS = {
    "en": ("the", "a", "fast", "slow"),
    "es": ("data", "valor", "tabla", "fila"),
    "de": ("der", "die", "das", "schnell"),
    "fr": ("le", "la", "les", "vite"),
    "zh": ("big", "small", "key", "hash"),
}


def _score_sql(lang: str) -> str:
    inlist = ", ".join(f"'{m}'" for m in _MARKERS[lang])
    return f"COUNT(*) FILTER (WHERE word IN ({inlist})) * 1.0 / COUNT(*)"


@query(
    "llm_lang_id",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
    ), s AS (
      SELECT doc_id, any_value(lang) AS true_lang,
             {_score_sql('en')} AS s_en, {_score_sql('es')} AS s_es,
             {_score_sql('de')} AS s_de, {_score_sql('fr')} AS s_fr,
             {_score_sql('zh')} AS s_zh
      FROM w GROUP BY doc_id
    )
    SELECT doc_id, true_lang,
           CASE greatest(s_en, s_es, s_de, s_fr, s_zh)
                WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
                WHEN s_fr THEN 'fr' ELSE 'zh' END AS pred_lang,
           round(greatest(s_en, s_es, s_de, s_fr, s_zh), 6) AS score
    FROM s
    """,
)
def llm_lang_id(spark, sf_dir):
    """Stopword-hit-rate language ID: per-doc marker-list hit fractions,
    argmax with a fixed alphabetical tiebreak (the CASE tries langs in
    alphabetical order, so ties resolve identically on both engines)."""
    w = _words(load_table(spark, sf_dir, "documents"))
    scores = [
        (F.count(F.when(F.col("word").isin(*_MARKERS[lang]), 1)) / F.count("*")).alias(
            f"s_{lang}"
        )
        for lang in ("en", "es", "de", "fr", "zh")
    ]
    s = w.groupBy("doc_id").agg(F.any_value("lang").alias("true_lang"), *scores)
    best = F.greatest("s_en", "s_es", "s_de", "s_fr", "s_zh")
    pred = (
        F.when(best == F.col("s_de"), "de")
        .when(best == F.col("s_en"), "en")
        .when(best == F.col("s_es"), "es")
        .when(best == F.col("s_fr"), "fr")
        .otherwise("zh")
    )
    return s.select(
        "doc_id",
        "true_lang",
        pred.alias("pred_lang"),
        F.round(best, 6).alias("score"),
    )


@query(
    "llm_quality_score",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), m AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             COUNT(DISTINCT word) * 1.0 / COUNT(*) AS ttr,
             SUM(len(word)) * 1.0 / COUNT(*) AS avg_word_len
      FROM w GROUP BY doc_id
    )
    SELECT d.doc_id, m.n_tokens, round(m.ttr, 6) AS ttr,
           round(m.avg_word_len, 6) AS avg_word_len,
           round(0.4 * least(m.n_tokens / 50.0, 1.0)
                 + 0.4 * m.ttr
                 + 0.2 * least(m.avg_word_len / 8.0, 1.0), 6) AS quality
    FROM documents d JOIN m ON d.doc_id = m.doc_id
    """,
)
def llm_quality_score(spark, sf_dir):
    """Heuristic document quality: length saturation + type-token ratio +
    word-length shape, combined 0.4/0.4/0.2. All ratios are exact integer
    divisions in double (deterministic), so the score is hashable."""
    d = load_table(spark, sf_dir, "documents")
    m = (
        _words(d)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (F.countDistinct("word") / F.count("*")).alias("ttr"),
            (F.sum(F.length("word")) / F.count("*")).alias("avg_word_len"),
        )
    )
    quality = (
        0.4 * F.least(F.col("n_tokens") / 50.0, F.lit(1.0))
        + 0.4 * F.col("ttr")
        + 0.2 * F.least(F.col("avg_word_len") / 8.0, F.lit(1.0))
    )
    return d.select("doc_id").join(m, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round("ttr", 6).alias("ttr"),
        F.round("avg_word_len", 6).alias("avg_word_len"),
        F.round(quality, 6).alias("quality"),
    )


@query(
    "llm_token_count",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS re_tokens,
           CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token
    FROM documents
    """,
)
def llm_token_count(spark, sf_dir):
    """Token counting two ways: whitespace split and a BPE-ish regex
    (alnum runs | single punctuation). Map-only — no shuffle at all; at
    100 TB this is the cheapest full-corpus pass there is."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        as_long(F.regexp_count("text", F.lit(r"[a-z0-9]+|[^a-z0-9\s]"))).alias(
            "re_tokens"
        ),
        (F.col("n_chars") / F.size(F.split("text", " "))).alias("chars_per_token"),
    )


@query(
    "llm_fingerprint",
    # portable-hash twin: fixed-length lowercase hex sorts identically to
    # its numeric value, so lexicographic MIN over md5-prefix strings is
    # the same winnowing selection in both engines
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT doc_id, i AS pos,
             substring(md5(array_to_string(w[i+1:i+5], ' ')), 1, 16) AS h
      FROM t, unnest(range(0, len(w) - 4)) AS u(i)
      WHERE len(w) >= 5
    ), fp AS (
      SELECT DISTINCT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM sh
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           MIN(fp) AS min_fp, MAX(fp) AS max_fp
    FROM fp GROUP BY doc_id ORDER BY doc_id
    """,
)
def llm_fingerprint(spark, sf_dir):
    """Winnowing document fingerprints (MOSS-style; Schleimer et al. 2003).

    Rolling 5-gram shingle hashes per doc; a sliding window of 4 keeps
    each window's minimum; the distinct kept hashes are the fingerprint.
    Near-duplicate docs share most fingerprints, and the fingerprint set
    is ~1/4 the shingle count — the standard sketch for plagiarism/dedup
    at corpus scale. The shingle hash is a 16-hex-char md5 prefix so the
    selection is engine-portable and oracle-checkable (fixed-length hex
    compares lexicographically == numerically); at 100 TB swap in
    xxhash64 for JVM-side speed — the winnowing structure is unchanged.
    """
    k = 5
    d = load_table(spark, sf_dir, "documents")
    sh = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(w)-{k}),"
                    f" i -> substring(md5(concat_ws(' ', slice(w, i+1, {k}))), 1, 16))"
                )
            ).alias("pos", "h"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    fp = sh.select("doc_id", F.min("h").over(win).alias("fp")).distinct()
    return (
        fp.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_fingerprints"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_lang_partition",
    oracle="""
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents WHERE lang IN ('en', 'de')
    GROUP BY lang, source ORDER BY lang, source
    """,
)
def llm_lang_partition(spark, sf_dir):
    """Language-routed partitioned sink + pruned read-back: write
    partitionBy(lang), then read only two language directories back.
    The filter on the partition column prunes at the directory level —
    the layout every multilingual 100 TB corpus should have."""
    d = load_table(spark, sf_dir, "documents")
    out = os.path.join(tempfile.mkdtemp(prefix="etl_lang_"), "docs_by_lang")
    d.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("lang").isin("en", "de"))
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "source")
    )


@query(
    "llm_doc_chunking",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), c AS (
      SELECT doc_id,
             unnest(range(0, greatest(len(w) - 16, 0) + 32, 32 - 16)) AS start0,
             w
      FROM t
    )
    SELECT doc_id,
           CAST(start0 / 16 AS BIGINT) AS chunk_idx,
           array_to_string(w[start0 + 1 : start0 + 32], ' ') AS chunk_text,
           least(32, len(w) - start0) AS chunk_len
    FROM c
    WHERE start0 < len(w)
    """,
)
def llm_doc_chunking(spark, sf_dir):
    """Sliding-window document chunking — the tokenize-and-chunk pass every
    embedding/training pipeline runs before encoding: 32-token windows with
    16-token stride (50% overlap). Map-only (split → windowed slices →
    explode); no shuffle at all, which is exactly what a 100 TB corpus
    chunker must be. Chunk grid: starts at 0,16,32,… while start < len."""
    d = load_table(spark, sf_dir, "documents")
    size, stride = 32, 16
    return (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, int(ceil(size(w) / {stride}.0)) - 1),"
                    f" i -> concat_ws(' ', slice(w, i * {stride} + 1, {size})))"
                )
            ).alias("chunk_idx0", "chunk_text"),
            F.size("w").alias("nw"),
        )
        .filter(F.col("chunk_idx0") * stride < F.col("nw"))
        .select(
            "doc_id",
            F.col("chunk_idx0").cast("long").alias("chunk_idx"),
            "chunk_text",
            F.least(F.lit(size), F.col("nw") - F.col("chunk_idx0") * stride)
            .cast("long")
            .alias("chunk_len"),
        )
    )


@query(
    "llm_pii_scrub",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               text || ' contact: user' || doc_id || '@example.com or +1-555-'
                    || lpad(CAST(doc_id AS VARCHAR), 4, '0'),
               '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
             '\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}', '<PHONE>', 'g') AS scrubbed,
           CAST(length(text || ' contact: user' || doc_id || '@example.com or +1-555-'
                    || lpad(CAST(doc_id AS VARCHAR), 4, '0'))
                - length(regexp_replace(
                    text || ' contact: user' || doc_id || '@example.com or +1-555-'
                         || lpad(CAST(doc_id AS VARCHAR), 4, '0'),
                    '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '', 'g'))
             AS BIGINT) AS email_chars_removed
    FROM documents
    """,
)
def llm_pii_scrub(spark, sf_dir):
    """PII redaction — the compliance pass before any corpus ships: email
    and phone patterns replaced with typed placeholders. Synthetic PII is
    appended per doc (the fixture corpus is clean) so the scrub provably
    fires on every row. Patterns stay in the Java∩RE2 regex subset.
    Map-only; at 100 TB this pipelines with chunking in one stage."""
    d = load_table(spark, sf_dir, "documents")
    with_pii = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad(F.col("doc_id").cast("string"), 4, "0"),
    )
    email_re = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    phone_re = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}"
    scrubbed = F.regexp_replace(
        F.regexp_replace(with_pii, email_re, "<EMAIL>"), phone_re, "<PHONE>"
    )
    return d.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        (
            F.length(with_pii) - F.length(F.regexp_replace(with_pii, email_re, ""))
        )
        .cast("long")
        .alias("email_chars_removed"),
    )


# BM25 constants (Robertson & Walker 1994; Robertson & Zaragoza 2009).
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_TERMS = ("join", "dup", "fast")  # mixed document frequencies


@query(
    "llm_bm25_search",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY doc_id
    ), stats AS (
      SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, COUNT(*) AS n FROM dl
    ), tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM w
      WHERE word IN ('join', 'dup', 'fast') GROUP BY doc_id, word
    ), df AS (
      SELECT word, COUNT(DISTINCT doc_id) AS df FROM w
      WHERE word IN ('join', 'dup', 'fast') GROUP BY word
    ), scored AS (
      SELECT tf.doc_id, tf.word,
             ln((n - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * ({_BM25_K1} + 1.0))
               / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / avgdl))
               AS s
      FROM tf JOIN df ON tf.word = df.word
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats
    )
    SELECT doc_id,
           round(COALESCE(SUM(CASE WHEN word = 'join' THEN s END), 0)
                 + COALESCE(SUM(CASE WHEN word = 'dup' THEN s END), 0)
                 + COALESCE(SUM(CASE WHEN word = 'fast' THEN s END), 0), 6)
             AS bm25
    FROM scored
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 15
    """,
)
def llm_bm25_search(spark, sf_dir):
    """BM25 keyword retrieval over the corpus, pure DataFrame (no MLlib,
    no Python in the hot path). Per-term scores are summed in a FIXED
    term order (conditional single-element sums, then t1+t2+t3) — never a
    float SUM over an engine-ordered group, which would flap the hash.
    At 100 TB: dl and tf shuffle on doc_id/word; df and the (avgdl, N)
    scalar frame are tiny broadcasts; top-15 is TakeOrderedAndProject."""
    k1, b = _BM25_K1, _BM25_B
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    dl = w.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        F.count("*").alias("n"),
    )
    qw = w.filter(F.col("word").isin(*_BM25_TERMS))
    tf = qw.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = qw.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    s = (
        F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select("doc_id", "word", s.alias("s"))
    )
    per_term = [
        F.coalesce(F.sum(F.when(F.col("word") == t, F.col("s"))), F.lit(0.0))
        for t in _BM25_TERMS
    ]
    return (
        scored.groupBy("doc_id")
        .agg(F.round(per_term[0] + per_term[1] + per_term[2], 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(15)
    )


# 256 MiB of source corpus parquet: under this, every count table the LM
# scorers derive (distinct tokens / distinct bigrams + a long) is at most a
# small multiple of the corpus bytes and broadcasts comfortably; far over
# it (the 100 TB regime) the tables are tens of GB and must not be hinted.
_LM_BROADCAST_GATE_BYTES = 256 << 20


def _lm_count_table_hint(spark, sf_dir, gate_bytes=None):
    """Broadcast hint for the LM scorers' count tables, gated on measured
    corpus size (VERDICT r6 "What's wrong" #1 — the unconditional hint was
    a scale-killer). The tables at stake are keyed on tokens (unigram
    model) or bigrams (add-1 / Kneser-Ney): bigram TYPES grow
    near-linearly with corpus tokens (Heaps' law), so at 100 TB they are
    tens-of-GB — an executor OOM if broadcast unconditionally. Under the
    gate the broadcast is strictly best; over it no hint is planted and
    AQE picks the join strategy from runtime sizes — and since bg⋈c12
    shares the (w1,w2) key with the aggregation that BUILT c12, the
    big-data form is one co-partitioned shuffle, not a fresh corpus
    shuffle per count table. The gate reads file sizes through the Hadoop
    FS API (io.table_bytes): no Spark job at plan-construction time,
    where a row-count gate would launch a full aggregation on every plan
    build (plan_audit, driver walks) just to pick a join strategy."""
    if gate_bytes is None:
        gate_bytes = _LM_BROADCAST_GATE_BYTES  # late-bound: tests repoint it
    return byte_gated_broadcast(spark, sf_dir, "documents", gate_bytes)


@query(
    "llm_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT COUNT(*) AS n FROM tok),
    scored AS (
      SELECT t.doc_id,
             CAST(round(ln(CAST(c.c AS DOUBLE) / (SELECT n FROM tot)), 6)
                  AS DECIMAL(18,6)) AS lp
      FROM tok t JOIN cnt c USING (tok)
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           round(CAST(CAST(SUM(lp) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
             AS avg_logprob
    FROM scored
    GROUP BY doc_id
    """,
)
def llm_unigram_logprob(spark, sf_dir):
    """Unigram language-model scoring of each document (corpus-quality
    signal: low avg token log-probability ⇒ rare-token gibberish; the
    cheap stand-in for perplexity-based filtering in LLM data pipelines).

    The "model" is the corpus's own unigram distribution: two hash aggs
    (token counts, corpus total) + one re-join of tokens to counts. The
    per-token log-prob is rounded to 6 dp THEN cast to exact decimal so
    the per-doc sum is merge-order-independent (core.py discipline —
    ln() is the one non-correctly-rounded libm call here, and rounding
    before accumulation contains it). At 100 TB: the token-count table is
    DISTINCT-TOKEN-sized — heavy-hitter-skewed but far smaller than the
    corpus after map-side combine, yet still 100M+ rows on a web-scale
    corpus, so the broadcast hint is gated on measured source bytes
    (``table_bytes``, no extra job): under the gate → broadcast; over it
    → no hint, and AQE picks the strategy from runtime sizes. The corpus
    total folds in as a broadcast one-row aggregate instead of a
    driver-side count(), so plan construction launches no job and the
    value always reflects the executed data."""
    docs = load_table(spark, sf_dir, "documents")
    hint = _lm_count_table_hint(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    cnt = tok.groupBy("tok").agg(F.count("*").alias("c"))
    tot = tok.agg(F.count("*").alias("lm_n"))
    scored = (
        tok.join(hint(cnt), "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(F.log(F.col("c").cast("double") / F.col("lm_n")), 6)
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(d2d(F.sum("lp")) / F.count("*"), 6).alias("avg_logprob"),
    )


@query(
    "llm_bigram_logprob",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), bg AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      FROM t, unnest(range(1, len(w))) AS u(i)
      WHERE len(w) >= 2
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT tok) AS vocab
          FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
    scored AS (
      SELECT b.doc_id,
             CAST(round(ln((c12.c2 + 1.0) / (c1.c1 + (SELECT vocab FROM v))), 6)
                  AS DECIMAL(18,6)) AS lp
      FROM bg b
      JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      JOIN c1 ON b.w1 = c1.w1
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           round(CAST(CAST(SUM(lp) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
             AS avg_logprob
    FROM scored
    GROUP BY doc_id
    """,
)
def llm_bigram_logprob(spark, sf_dir, broadcast_gate_bytes=None):
    """Bigram language-model scoring with add-1 (Laplace) smoothing —
    the next step up from llm_unigram_logprob toward KenLM-style
    perplexity filtering: p(w2|w1) = (c(w1,w2)+1) / (c(w1)+|V|), scored
    as each document's mean bigram log-probability. A doc of locally
    incoherent token order scores low even when its unigrams are common —
    the signal unigram scoring cannot see.

    Same determinism discipline as the unigram op: ln() rounded to 6 dp
    THEN cast to exact decimal before the per-doc sum. Plan shape at
    100 TB: bigram extraction is map-only array ops; the two count
    tables aggregate with map-side combine (bigram keys are zipfian but
    partials absorb the head). c12 is BIGRAM-TYPE-sized — near-linear in
    corpus tokens by Heaps' law, NOT vocab-sized — so its broadcast back
    onto the bigram stream is gated on measured corpus bytes
    (``_lm_count_table_hint``): under the gate → broadcast (strictly
    best at fixture scale); over it → no hint, AQE decides, and the
    bg⋈c12 join co-partitions with the aggregation that built c12. |V|
    folds in as a broadcast one-row aggregate, not a driver-side
    count_distinct, so plan construction launches no job.
    ``broadcast_gate_bytes`` overrides the gate threshold (0 → never
    hint; the scale smoke times both regimes through it)."""
    docs = load_table(spark, sf_dir, "documents")
    bg = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(element_at(w, i) AS w1,"
                    " element_at(w, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    hint = _lm_count_table_hint(spark, sf_dir, broadcast_gate_bytes)
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = docs.select(F.explode(F.split("text", " ")).alias("tok")).agg(
        F.count_distinct("tok").alias("lm_vocab")
    )
    scored = (
        bg.join(hint(c12), ["w1", "w2"])
        .join(hint(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("lm_vocab"))), 6
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(d2d(F.sum("lp")) / F.count("*"), 6).alias("avg_logprob"),
    )


@query(
    "llm_corpus_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w,
             sha256(regexp_replace(lower(trim(text)),
                    '[ \\t\\r\\n\\f\\x0B]+', ' ', 'g')) AS h
      FROM documents
    ), tok AS (
      SELECT doc_id, unnest(w) AS tok FROM t
    )
    SELECT CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_docs,
           CAST((SELECT COUNT(DISTINCT lang) FROM t) AS BIGINT) AS n_langs,
           CAST((SELECT COUNT(*) FROM tok) AS BIGINT) AS n_tokens,
           CAST((SELECT COUNT(DISTINCT tok) FROM tok) AS BIGINT) AS vocab,
           round((SELECT COUNT(*) FROM tok) * 1.0
                 / (SELECT COUNT(*) FROM t), 6) AS mean_doc_tokens,
           CAST((SELECT COUNT(*) - COUNT(DISTINCT h) FROM t) AS BIGINT)
             AS n_exact_dups
    """,
)
def llm_corpus_stats(spark, sf_dir):
    """The corpus dashboard — the one-row report every training-data team
    checks before and after each pipeline stage: document and language
    counts, total tokens, vocabulary size, mean document length, and the
    exact-duplicate count (docs minus distinct normalized content
    hashes). Three aggregates over two scans (docs; exploded tokens),
    every one with map-side partial combine; the whole report is a
    constant-size row regardless of corpus size, which is what makes it
    cheap enough to emit per pipeline stage at 100 TB (the stage-
    accounting discipline llm_corpus_pipeline applies)."""
    from ..llm.dedup import _normalized_text

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", F.split("text", " ").alias("w"),
        F.sha2(_normalized_text(), 256).alias("h"),
    )
    tok = t.select(F.explode("w").alias("tok"))
    doc_stats = t.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        (F.count("*") - F.count_distinct("h")).alias("n_exact_dups"),
    )
    tok_stats = tok.agg(
        F.count("*").alias("n_tokens"),
        F.count_distinct("tok").alias("vocab"),
    )
    return doc_stats.join(tok_stats).select(
        "n_docs",
        "n_langs",
        "n_tokens",
        "vocab",
        F.round(F.col("n_tokens") / F.col("n_docs"), 6).alias("mean_doc_tokens"),
        "n_exact_dups",
    )


@query(
    "llm_ngram_novelty",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)),
                          '[ \t\r\n\f\x0B]+', ' ', 'g'), ' ') AS w
      FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS gram
      FROM t WHERE len(w) >= 3
    ), first_seen AS (
      SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(*) FILTER (WHERE f.first_doc = g.doc_id) AS BIGINT)
             AS n_novel,
           round(COUNT(*) FILTER (WHERE f.first_doc = g.doc_id) * 1.0
                 / COUNT(*), 6) AS novelty
    FROM g JOIN first_seen f ON f.gram = g.gram
    GROUP BY g.doc_id
    """,
)
def llm_ngram_novelty(spark, sf_dir):
    """N-gram novelty score — what fraction of a document's distinct
    3-grams appear for the FIRST time (by doc_id order) in this document.
    The dedup-aware curation signal: a scrape full of boilerplate scores
    near 0 and adds nothing to a corpus that already contains its
    sources; high-novelty docs are where new text actually lives
    (the per-document view of what llm_dedup_paragraph removes).

    Plan shape = the skew-safe first-occurrence idiom again:
    ``groupBy(gram).min(doc_id)`` collapses every gram with map-side
    partial combine (a billion-occurrence boilerplate gram becomes one
    row per partition before the shuffle), then one equi-join back on
    the gram and a per-doc aggregate. No windows over the corpus, no
    pairwise anything."""
    from .dedup import _shingles

    sh = _shingles(load_table(spark, sf_dir, "documents"))
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.col("n_novel").cast("long").alias("n_novel"),
            F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty"),
        )
    )


@query(
    "llm_vocab_growth",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS r,
             COUNT(*) OVER () AS n
      FROM documents
    ), t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), g AS (
      SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
      FROM t WHERE len(w) >= 3
    ), first_seen AS (
      SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram
    ), bucketed AS (
      SELECT LEAST(CAST(floor(rk.r * 10.0 / rk.n) AS BIGINT), 9) AS decile
      FROM first_seen f JOIN ranked rk ON f.first_doc = rk.doc_id
    ), per AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS new_words
      FROM bucketed GROUP BY decile
    )
    SELECT decile, new_words,
           CAST(SUM(new_words) OVER (ORDER BY decile) AS BIGINT) AS vocab_size
    FROM per
    """,
)
def llm_vocab_growth(spark, sf_dir):
    """Type growth curve (Heaps' law) over 3-GRAM types: distinct-type
    count after each decile of the corpus in doc_id order — the
    corpus-analysis dashboard row that distinguishes natural text
    (sub-linear type growth) from templated or synthetic feeds, and
    sizes n-gram models before training one. 3-gram types rather than
    unigrams because the fixture's word vocabulary saturates in the
    first decile (every word seen by decile 0 — a measured degenerate
    curve), while the gram space keeps growing: measured per-decile new
    types at sf0.01 fall 2413 → 886, the textbook sub-linear shape.

    Plan: each word reduces to its FIRST document (min doc_id — one
    hash aggregate with map-side combine, the skew-safe first-occurrence
    formulation shared with llm_dedup_paragraph); deciles come from a
    global row_number over the DOC-ID domain — the agg_gini precedent:
    a global sort is exactly what you never do on raw 100 TB rows and
    exactly fine on the aggregated key domain (one slim column). The
    10-row cumulative sum at the end is constant-size."""
    d = load_table(spark, sf_dir, "documents")
    ranked = d.select("doc_id").withColumn(
        "r", F.row_number().over(Window.orderBy("doc_id")) - 1
    )
    n = F.broadcast(d.agg(F.count("*").alias("n")))
    first_seen = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w)-3),"
                    " i -> concat_ws(' ', slice(w, i+1, 3)))"
                )
            ).alias("gram"),
        )
        .groupBy("gram")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    bucketed = (
        first_seen.join(ranked, first_seen.first_doc == ranked.doc_id)
        .crossJoin(n)
        .select(
            F.least(F.floor(F.col("r") * 10.0 / F.col("n")), F.lit(9))
            .cast("long")
            .alias("decile")
        )
    )
    per = bucketed.groupBy("decile").agg(F.count("*").alias("new_words"))
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "decile",
        "new_words",
        F.sum("new_words").over(wc).cast("long").alias("vocab_size"),
    )


@query(
    "llm_readability",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
      FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                 - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6)
             AS flesch_ease,
           round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                 + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 6)
             AS fk_grade
    FROM m
    """,
)
def llm_readability(spark, sf_dir):
    """Flesch reading-ease + Flesch–Kincaid grade per document (Flesch
    1948; Kincaid et al. 1975) — the classic text-quality signals used
    as cheap corpus filters and difficulty scores (e.g. curriculum
    bucketing). Syllables use the standard vowel-group proxy (runs of
    [aeiouy] — exact syllabification needs a dictionary; the proxy is
    the accepted corpus-scale approximation), sentences count
    [.!?]-runs clamped to ≥1 (these synthetic fixtures carry no sentence
    punctuation, so each doc scores as one sentence — the formula's
    sentence term is still fully exercised via the words count).

    Scale shape: entirely map-side — three regexp/split counts and two
    scalar double formulas per row, inside whole-stage codegen; no
    shuffle at all. The IEEE scalar math is deterministic given equal
    inputs; round 6 on both engines as the standard guard."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " "))
    n_sentences = F.greatest(
        F.expr("size(regexp_extract_all(text, '[.!?]+', 0))"), F.lit(1)
    )
    n_syllables = F.expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))")
    m = d.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sentences.cast("long").alias("n_sentences"),
        n_syllables.cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 6).alias("flesch_ease"),
        F.round(0.39 * wps + 11.8 * spw - 15.59, 6).alias("fk_grade"),
    )


@query(
    "llm_bpe_merge_candidates",
    oracle="""
    WITH wc AS (
      SELECT tok, COUNT(*) AS wcount FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      ) WHERE tok <> '' GROUP BY tok
    ), pairs AS (
      SELECT unnest(list_transform(range(1, len(tok)),
                    i -> substring(tok, CAST(i AS INTEGER), 2))) AS pair,
             wcount
      FROM wc WHERE len(tok) >= 2
    )
    SELECT pair, CAST(SUM(wcount) AS BIGINT) AS n_occurrences
    FROM pairs GROUP BY pair
    ORDER BY n_occurrences DESC, pair LIMIT 20
    """,
)
def llm_bpe_merge_candidates(spark, sf_dir):
    """First BPE merge iteration (Sennrich et al. 2016): the 20 most
    frequent adjacent character pairs across the corpus, weighted by
    word occurrence — the statistic a byte-pair-encoding tokenizer
    trainer computes each round to pick its next merge. Full BPE
    training iterates this with re-segmentation (a driver loop of
    exactly this query over an evolving symbol table); one iteration is
    the honest relational core, and the expensive part: at 100 TB the
    pair count is the whole cost, and it is two hash aggs — word counts
    first (the heavy-hitter shuffle collapses ~Zipf-many duplicate
    words into one row each — at fixture scale 500 docs reduce to ~60
    distinct words), then per-DISTINCT-WORD pair explosion weighted by
    the count (bounded fanout: word length), then the pair agg.
    Everything stays in whole-stage codegen; top-20 via
    TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("wcount"))
    )
    pairs = wc.filter(F.length("tok") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair"),
        "wcount",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wcount").cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(20)
    )


@query(
    "llm_perplexity_bucket",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT COUNT(*) AS n FROM tok),
    scored AS (
      SELECT t.doc_id,
             CAST(round(ln(CAST(c.c AS DOUBLE) / (SELECT n FROM tot)), 6)
                  AS DECIMAL(18,6)) AS lp
      FROM tok t JOIN cnt c USING (tok)
    ), per_doc AS (
      SELECT doc_id,
             COUNT(*) AS n_tokens,
             round(CAST(CAST(SUM(lp) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
               AS avg_logprob
      FROM scored GROUP BY doc_id
    ), bucketed AS (
      SELECT doc_id, n_tokens, avg_logprob,
             CAST(ntile(5) OVER (ORDER BY avg_logprob DESC, doc_id)
                  AS BIGINT) AS bucket
      FROM per_doc
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           round(MIN(avg_logprob), 6) AS min_logprob,
           round(MAX(avg_logprob), 6) AS max_logprob
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
)
def llm_perplexity_bucket(spark, sf_dir):
    """Perplexity-quantile bucketing of the corpus (quality tiers for
    data mixing — the CCNet/DoReMi-style move of partitioning training
    data by LM score and sampling buckets at different rates, rather
    than hard-filtering at one threshold). Docs are scored by the
    unigram LM of llm_unigram_logprob (same fixed-rounding exact-decimal
    sum, so scores are merge-order-proof), then quintiled by
    (avg_logprob DESC, doc_id) — bucket 1 = most fluent fifth, the
    explicit tiebreak pinning equal scores across engines.

    Scale shape: scoring is the documented two-hash-agg plan; the ntile
    is a global sort over the DOC domain (the agg_rfm precedent: rank
    aggregated keys, never raw facts), and the final rollup is a 5-row
    aggregate carrying token totals for mixture planning."""
    from pyspark.sql import Window

    per_doc = llm_unigram_logprob(spark, sf_dir)
    w = Window.orderBy(F.col("avg_logprob").desc(), F.col("doc_id"))
    bucketed = per_doc.withColumn("bucket", F.ntile(5).over(w).cast("long"))
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.min("avg_logprob"), 6).alias("min_logprob"),
            F.round(F.max("avg_logprob"), 6).alias("max_logprob"),
        )
        .orderBy("bucket")
    )


@query(
    "llm_ttr_hapax",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), per AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
           round(COUNT(*) * 1.0 / SUM(c), 6) AS ttr,
           round(COUNT(*) FILTER (WHERE c = 1) * 1.0 / COUNT(*), 6)
             AS hapax_ratio
    FROM per GROUP BY doc_id
    """,
)
def llm_ttr_hapax(spark, sf_dir):
    """Per-document lexical diversity: type-token ratio and hapax ratio
    (share of within-doc vocabulary used exactly once). The two standard
    repetitiveness signals for corpus curation — template/boilerplate
    text has low TTR and low hapax share, and both degrade LM training
    (the per-doc companion to llm_quality_gopher's repetition gate).

    Plan shape: explode → groupBy(doc_id, tok) with map-side partial
    combine (the per-doc vocab is what shuffles, not the token stream) →
    one more map-combined agg on doc_id. No windows, no joins."""
    d = load_table(spark, sf_dir, "documents")
    per = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    return per.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
        F.round(F.count("*") / F.sum("c"), 6).alias("ttr"),
        F.round(
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)) / F.count("*"), 6
        ).alias("hapax_ratio"),
    )


@query(
    "llm_zipf_slope",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS f FROM tok GROUP BY tok
    ), top AS (
      SELECT tok, f FROM freq ORDER BY f DESC, tok LIMIT 200
    ), ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM top
    ), xy AS (
      SELECT CAST(round(ln(r), 6) AS DECIMAL(18,6)) AS x,
             CAST(round(ln(f), 6) AS DECIMAL(18,6)) AS y
      FROM ranked
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x * y) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy
      FROM xy
    )
    SELECT n AS n_ranks,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def llm_zipf_slope(spark, sf_dir):
    """Zipf's-law fit over the token frequency spectrum: OLS slope of
    ln(freq) on ln(rank) across the top-200 ranks, with r². Natural
    corpora fit slope ≈ −1; a slope far off (or a poor r²) flags
    synthetic/templated text or tokenizer damage — one of the cheapest
    whole-corpus health checks (Zipf 1949; used as a QA gate alongside
    llm_vocab_growth's Heaps curve).

    Determinism: ln() of identical bigint counts rounds to 6 dp before
    the decimal power-sum aggregation (the bigram-logprob discipline),
    then ALL regression arithmetic runs on the exact-sum doubles —
    scalar IEEE ops, identical on both engines. Rank ties break on the
    token string so the ranking is total.

    Plan shape: token hash-agg (map-combined; vocab rows shuffle, not
    occurrences) → global top-200 via TakeOrderedAndProject (no full
    sort) → a 200-row window + one single-row aggregate."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("f"))
    )
    top = freq.orderBy(F.desc("f"), F.asc("tok")).limit(200)
    ranked = top.select(
        "f", F.row_number().over(Window.orderBy(F.desc("f"), F.asc("tok"))).alias("r")
    )
    xy = ranked.select(
        F.round(F.log(F.col("r").cast("double")), 6).cast("decimal(18,6)").alias("x"),
        F.round(F.log(F.col("f").cast("double")), 6).cast("decimal(18,6)").alias("y"),
    )
    s = xy.agg(
        F.count("*").cast("long").alias("n"),
        d2d(F.sum("x")).alias("sx"),
        d2d(F.sum("y")).alias("sy"),
        d2d(F.sum(F.col("x") * F.col("y"))).alias("sxy"),
        d2d(F.sum(F.col("x") * F.col("x"))).alias("sxx"),
        d2d(F.sum(F.col("y") * F.col("y"))).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov, varx, vary = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    return s.select(
        F.col("n").alias("n_ranks"),
        F.round(cov / varx, 6).alias("zipf_slope"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    )


@query(
    "llm_length_histogram",
    oracle="""
    WITH t AS (
      SELECT len(string_split(text, ' ')) AS n_tok, n_chars FROM documents
    )
    SELECT CAST((n_tok // 10) * 10 AS BIGINT) AS bucket_start,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           round(SUM(n_chars) * 1.0 / COUNT(*), 6) AS mean_chars
    FROM t GROUP BY 1 ORDER BY 1
    """,
)
def llm_length_histogram(spark, sf_dir):
    """Document-length histogram (10-token buckets): the calibration view
    behind every min/max-length filter — where the mass sits, how much
    of the token budget each band carries, and whether a proposed cutoff
    would throw away meaningful volume. Bucketing is pure integer
    arithmetic (floor-div), so bucket edges are identical on both
    engines — no float-log bucket-boundary ambiguity.

    Plan shape: map-only tokenize-and-measure, then a hash agg on a
    ~dozens-row bucket domain — map-side combine collapses everything
    before the shuffle; output is constant-size regardless of corpus."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        F.size(F.split("text", " ")).alias("n_tok"), F.col("n_chars")
    )
    return (
        t.groupBy(
            (F.floor(F.col("n_tok") / 10) * 10).cast("long").alias("bucket_start")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.round(F.sum("n_chars") / F.count("*"), 6).alias("mean_chars"),
        )
        .orderBy("bucket_start")
    )


@query(
    "llm_charset_report",
    oracle="""
    WITH ch AS (
      SELECT unnest(string_split(text, '')) AS ch FROM documents
    ), tot AS (SELECT COUNT(*) AS n FROM ch)
    SELECT ch AS char,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(COUNT(*) * 1.0 / MAX(n), 6) AS share,
           MAX(ascii(ch)) < 128 AS is_ascii
    FROM ch, tot GROUP BY ch ORDER BY ch
    """,
)
def llm_charset_report(spark, sf_dir):
    """Character-inventory report: every distinct character in the
    corpus with its frequency share and an ASCII flag — the
    encoding-QA pass that catches mojibake, stray control characters,
    and zero-width junk BEFORE a tokenizer bakes them into the vocab
    (a handful of U+FFFD or NBSP characters in a 100 TB crawl is
    invisible in samples and obvious here). The char domain is bounded
    by the alphabet, so the output is constant-size at any corpus
    scale.

    Plan shape: map-only char explode → hash agg on the (tiny) char
    domain with map-side combine, one broadcast total."""
    d = load_table(spark, sf_dir, "documents")
    # The zero-length filter is a no-op today but pins parity across
    # Spark versions: Java's split(-1) has historically kept a trailing
    # empty element that DuckDB's string_split(text, '') drops.
    ch = d.select(F.explode(F.split("text", "")).alias("char")).filter(
        F.length("char") > 0
    )
    tot = F.broadcast(ch.agg(F.count("*").alias("n")))
    return (
        ch.crossJoin(tot)
        .groupBy("char")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.count("*") / F.max("n"), 6).alias("share"),
            (F.max(F.ascii("char")) < 128).alias("is_ascii"),
        )
        .select("char", "n", "share", "is_ascii")
        .orderBy("char")
    )


@query(
    "llm_ngram_kneser_ney",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), bg AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      FROM t, unnest(range(1, len(w))) AS u(i)
      WHERE len(w) >= 2
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
    c1t AS (SELECT w1, SUM(c2) AS c1, COUNT(*) AS n1f FROM c12 GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS n1p FROM c12 GROUP BY w2),
    nt AS (SELECT COUNT(*) AS ntypes FROM c12),
    scored AS (
      SELECT b.doc_id,
             (2 * (greatest(4 * c12.c2 - 3, 0) * (SELECT ntypes FROM nt)
                   + 3 * c1t.n1f * cont.n1p) * 1000000
              + 4 * c1t.c1 * (SELECT ntypes FROM nt))
             // (2 * 4 * c1t.c1 * (SELECT ntypes FROM nt)) AS p6s
      FROM bg b
      JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      JOIN c1t ON b.w1 = c1t.w1
      JOIN cont ON b.w2 = cont.w2
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(CAST((2 * SUM(p6s) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE)
                / 1000000.0 AS DOUBLE) AS avg_kn_prob
    FROM scored
    GROUP BY doc_id
    """,
)
def llm_ngram_kneser_ney(spark, sf_dir, broadcast_gate_bytes=None):
    """Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
    Goodman 1999's interpolated form, absolute discount d=0.75) — the
    smoothing that actually powers KenLM-style perplexity filters, and
    the step past llm_bigram_logprob's add-1: P(w2|w1) =
    max(c(w1w2)−d,0)/c(w1•) + λ(w1)·P_cont(w2), with λ(w1) =
    d·N1+(w1,•)/c(w1•) and the continuation probability P_cont(w2) =
    N1+(•,w2)/|bigram types| — "how many contexts has w2 completed",
    which is why KN famously ranks 'Francisco' low despite high raw
    frequency. Scored as each document's MEAN BIGRAM KN PROBABILITY —
    deliberately the probability domain, not log: a downstream
    perplexity consumer takes log once per aggregate, and keeping the
    oracle-checked value transcendental-free makes it bit-stable.

    Determinism — the hard-won part: the KN probability is a RATIONAL
    number (with d=3/4, p = [max(4·c₁₂−3,0)·T + 3·N1f·N1p] / (4·c₁·T)
    where T = bigram types), so its 6-dp half-up quantization is
    computed ENTIRELY in integer arithmetic — ⌊(2·num·10⁶ + den) /
    (2·den)⌋ per bigram, the per-doc mean half-up-divided the same way,
    doubles appearing only in the final exact render (÷10⁶ of an
    integer ≤ 10⁶). Two weaker forms were each measured non-portable at
    sf0.1 (one row in 5000): an ln()-based score (Java Math.log vs
    glibc log differ by 1 ulp on ~1-in-1e5 inputs; doc 3611) and a
    round(double, 6) form (Spark rounds the double's SHORTEST decimal
    representation via BigDecimal.valueOf while DuckDB rounds the full
    binary value; doc 1147). Neither transcendentals nor double-round
    appear in oracle-checked columns. Integer headroom: 2·num·10⁶ ≈
    2e16 at sf0.1 — at corpus scale promote the numerators to
    DECIMAL(38,0), same expressions.

    100 TB plan shape: bigram extraction stays map-only; c12/c1t/cont
    aggregate with map-side combine. c12 is BIGRAM-TYPE-sized (near-
    linear in corpus tokens by Heaps' law — NOT vocab-sized; even the
    unigram-keyed c1t/cont reach 100M+ rows on a web corpus), so all
    three broadcasts are gated on measured corpus bytes
    (``_lm_count_table_hint``): under the gate → broadcast; over it →
    no hint, AQE decides, and bg⋈c12 co-partitions on (w1,w2) with the
    aggregation that built c12 — one shuffle, not three corpus
    re-shuffles. T = |bigram types| folds in as a broadcast one-row
    aggregate (the tpch_q11 pattern) rather than a driver-side count()
    frozen into the plan as a literal (ADVICE r6): plan construction
    launches no job, and T always reflects the executed data.
    ``broadcast_gate_bytes`` overrides the gate threshold (0 → never
    hint; the scale smoke times both regimes through it)."""
    docs = load_table(spark, sf_dir, "documents")
    hint = _lm_count_table_hint(spark, sf_dir, broadcast_gate_bytes)
    bg = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(element_at(w, i) AS w1,"
                    " element_at(w, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1t = c12.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count("*").alias("n1f")
    )
    cont = c12.groupBy("w2").agg(F.count("*").alias("n1p"))
    ntypes = c12.agg(F.count("*").alias("kn_t"))  # one-row: |bigram types|
    scored = (
        bg.join(hint(c12), ["w1", "w2"])
        .join(hint(c1t), "w1")
        .join(hint(cont), "w2")
        .crossJoin(F.broadcast(ntypes))
        .select(
            "doc_id",
            F.expr(
                "(2 * (greatest(4 * c2 - 3, 0L) * kn_t"
                " + 3 * n1f * n1p) * 1000000"
                " + 4 * c1 * kn_t)"
                " div (2 * 4 * c1 * kn_t)"
            ).alias("p6s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.expr(
            "CAST(CAST((2 * SUM(p6s) + COUNT(*)) div (2 * COUNT(*)) AS DOUBLE)"
            " / 1000000.0 AS DOUBLE)"
        ).alias("avg_kn_prob"),
    )


@query(
    "llm_tokenizer_fertility",
    oracle=r"""
    WITH m AS (
      SELECT lang,
             len(string_split(text, ' ')) AS ws,
             len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 \t\n\r\x0B\f]'))
               AS toks,
             n_chars
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws) AS BIGINT) AS n_words,
           CAST(SUM(toks) AS BIGINT) AS n_tokens,
           round(CAST(SUM(toks) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE), 6)
             AS fertility,
           round(CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(toks) AS DOUBLE), 6)
             AS chars_per_token
    FROM m GROUP BY lang ORDER BY lang
    """,
)
def llm_tokenizer_fertility(spark, sf_dir):
    """Tokenizer-fertility report per language: tokens-per-word and
    chars-per-token under the BPE-ish regex tokenizer (alnum runs |
    single punctuation) — the table every multilingual-training paper
    publishes (XLM-R, BLOOM) because high fertility means a language
    pays more sequence length per sentence, which skews both compute
    cost and effective epoch counts in the data mixture
    (llm_mixture_epochs consumes exactly this kind of table). Corpus
    aggregates, not per-doc means, so long documents weigh in
    proportionally.

    Plan shape: map-only per-doc token counting (regexp_count + split —
    no explode, no Python), then one hash agg on the tiny lang domain
    with map-side combine; the per-lang division happens on exact
    integer sums cast to double. The cheapest kind of full-corpus pass
    at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    m = d.select(
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("ws"),
        # whitespace spelled as an explicit class, NOT \s: Java regex
        # (Spark) counts \x0B as \s while RE2 (DuckDB) does not, so the
        # shorthand tokenizes a vertical-tab document differently per
        # engine (ADVICE r6). The explicit set compiles identically.
        as_long(
            F.regexp_count("text", F.lit("[a-z0-9]+|[^a-z0-9 \t\n\r\x0b\f]"))
        ).alias("toks"),
        "n_chars",
    )
    return (
        m.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws").alias("n_words"),
            F.sum("toks").alias("n_tokens"),
            F.round(
                F.sum("toks").cast("double") / F.sum("ws").cast("double"), 6
            ).alias("fertility"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("toks").cast("double"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


@query(
    "llm_vocab_coverage",
    oracle="""
    WITH w AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    ), freq AS (
      SELECT word, COUNT(*) AS f FROM w GROUP BY word
    ), vocab AS (
      SELECT word FROM freq ORDER BY f DESC, word ASC LIMIT 1000
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (WHERE word IN (SELECT word FROM vocab))
                AS BIGINT) AS n_covered,
           CAST(COUNT(DISTINCT word)
                  FILTER (WHERE word NOT IN (SELECT word FROM vocab))
                AS BIGINT) AS n_oov_types,
           round(1.0 - CAST(COUNT(*) FILTER (WHERE word IN
                     (SELECT word FROM vocab)) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
    FROM w GROUP BY lang ORDER BY lang
    """,
)
def llm_vocab_coverage(spark, sf_dir):
    """Vocabulary-coverage / OOV audit: fix the vocab at the corpus's
    top-1000 words (frequency desc, word asc tiebreak — deterministic on
    both engines) and report, per language, token coverage and the
    out-of-vocab rate plus distinct OOV types. This is the
    tokenizer-budget question ("what does a k-word vocab actually cover,
    and which languages pay the OOV tax") that sits beside
    llm_tokenizer_fertility in every multilingual data card; a spiking
    oov_rate per source is also a cheap mojibake/contamination alarm.

    Plan: one word-keyed count (map-side combine absorbs the zipfian
    head), a top-k on the vocab-sized result, the winner set broadcast
    back as a LEFT SEMI-style membership flag onto the token stream,
    then a tiny lang-keyed agg. The only corpus-sized shuffle is the
    word count; the vocab never touches the driver as data."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select("lang", F.explode(F.split("text", " ")).alias("word"))
    freq = w.groupBy("word").agg(F.count("*").alias("f"))
    vocab = freq.orderBy(F.col("f").desc(), F.col("word").asc()).limit(1000)
    flagged = w.join(
        F.broadcast(vocab.select("word", F.lit(True).alias("in_vocab"))),
        "word",
        "left",
    )
    covered = F.col("in_vocab").isNotNull()
    return (
        flagged.groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count(F.when(covered, 1)).alias("n_covered"),
            F.count_distinct(F.when(~covered, F.col("word"))).alias(
                "n_oov_types"
            ),
            F.round(
                1.0
                - F.count(F.when(covered, 1)).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("oov_rate"),
        )
        .orderBy("lang")
    )


@query(
    "llm_cross_entropy_heldout",
    oracle="""
    WITH train_tok AS (
      SELECT unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id % 5 <> 4
    ), cnt AS (
      SELECT tok, COUNT(*) AS c FROM train_tok GROUP BY tok
    ), stats AS (
      SELECT COUNT(*) AS t, COUNT(DISTINCT tok) AS v FROM train_tok
    ), eval_tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id % 5 = 4
    ), scored AS (
      SELECT e.lang,
             CASE WHEN c.c IS NULL THEN 1 ELSE 0 END AS oov,
             CAST(round(-ln((COALESCE(c.c, 0) + 1.0) / (s.t + s.v + 1)), 6)
                  AS DECIMAL(18,6)) AS nll
      FROM eval_tok e
      LEFT JOIN cnt c ON e.tok = c.tok
      JOIN stats s ON TRUE
    )
    SELECT lang,
           COUNT(*) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS oov_tokens,
           round(SUM(oov) * 1.0 / COUNT(*), 6) AS oov_rate,
           round(CAST(CAST(SUM(nll) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
             AS cross_entropy
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def llm_cross_entropy_heldout(spark, sf_dir, broadcast_gate_bytes=None):
    """Held-out cross-entropy of the corpus unigram LM — the train/eval
    discipline behind every perplexity-based quality report: docs split
    80/20 by ``doc_id % 5`` (deterministic, engine-portable — a hash
    split would need cross-engine-identical hashing), a Laplace-smoothed
    unigram model fit on the TRAIN side only (p = (c+1)/(T+|V|+1), one
    shared OOV bucket), then the EVAL side scored per language: token
    count, OOV rate, and mean negative log-likelihood in nats. Unlike
    llm_unigram_logprob (which scores the corpus with itself), this pair
    of columns moves the right way under contamination — memorized
    boilerplate drops held-out CE while OOV stays flat — which is what
    makes it a mixing-dashboard metric rather than a fluency score.

    Same determinism discipline as the LM family: ln() rounded to 6 dp
    then summed as exact DECIMAL(18,6). Plan at 100 TB: one train-side
    token shuffle builds the count table (token-keyed — broadcast GATED
    via _lm_count_table_hint, same reasoning as the other LM scorers);
    (T, |V|) is a broadcast one-row aggregate; the eval side joins and
    folds to a |lang|-sized result with map-side combine."""
    docs = load_table(spark, sf_dir, "documents")
    hint = _lm_count_table_hint(spark, sf_dir, broadcast_gate_bytes)
    train_tok = docs.filter(F.col("doc_id") % 5 != 4).select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    cnt = train_tok.groupBy("tok").agg(F.count("*").alias("c"))
    stats = train_tok.agg(
        F.count("*").alias("lm_t"), F.count_distinct("tok").alias("lm_v")
    )
    eval_tok = docs.filter(F.col("doc_id") % 5 == 4).select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    scored = (
        eval_tok.join(hint(cnt), "tok", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "lang",
            F.when(F.col("c").isNull(), 1).otherwise(0).alias("oov"),
            F.round(
                -F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                    / (F.col("lm_t") + F.col("lm_v") + 1)
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("nll"),
        )
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("oov").cast("long").alias("oov_tokens"),
            F.round(F.sum("oov") / F.count("*"), 6).alias("oov_rate"),
            F.round(d2d(F.sum("nll")) / F.count("*"), 6).alias("cross_entropy"),
        )
        .orderBy("lang")
    )


@query(
    "llm_bigram_pmi_top20",
    oracle="""
    WITH t AS (
      SELECT string_split(text, ' ') AS w FROM documents
    ), bg AS (
      SELECT w[i] AS w1, w[i+1] AS w2
      FROM t, unnest(range(1, len(w))) AS u(i)
      WHERE len(w) >= 2
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
    cl AS (SELECT w1, COUNT(*) AS cl FROM bg GROUP BY w1),
    cr AS (SELECT w2, COUNT(*) AS cr FROM bg GROUP BY w2),
    nn AS (SELECT COUNT(*) AS n FROM bg)
    SELECT c12.w1, c12.w2, CAST(c2 AS BIGINT) AS c12,
           CAST((CAST(c2 AS HUGEINT) * n * 1000000)
                // (CAST(cl.cl AS HUGEINT) * cr.cr) AS BIGINT)
             AS pmi_ratio_q6
    FROM c12
    JOIN cl ON c12.w1 = cl.w1
    JOIN cr ON c12.w2 = cr.w2
    JOIN nn ON TRUE
    WHERE c2 >= 5
    ORDER BY pmi_ratio_q6 DESC, c12.w1, c12.w2
    LIMIT 20
    """,
)
def llm_bigram_pmi_top20(spark, sf_dir, broadcast_gate_bytes=None):
    """Top-20 collocations by pointwise mutual information over the
    bigram stream (Church & Hanks 1990) with a min-count-5 support floor
    — the standard corpus-linguistics sanity report (multiword entities
    and boilerplate phrases float to the top; a PMI table full of
    template fragments is a dedup-pipeline smell).

    PMI = ln(p(w1,w2) / (p(w1)·p(w2))) is MONOTONE in the exact rational
    c12·N / (cl·cr), so the ranking and the published score are the
    integer-quantized ratio (×10⁶, floor division) — no transcendental
    ever touches an oracle-checked column, the same KN-scorer discipline
    (a consumer takes ln once per row if nats are wanted). The ratio's
    numerator c2·N·10⁶ passes the int64 ceiling around N≈1e9 bigrams
    (hypothesis found the edge by overflowing DuckDB just past it), so
    it is computed in DECIMAL(38,0)/HUGEINT from the start — no
    documented-but-unimplemented promotion.

    Plan: the three count tables aggregate off one bigram pass with
    map-side combine; joins are token-keyed and broadcast-GATED
    (_lm_count_table_hint); top-20 is TakeOrderedAndProject, never a
    global sort."""
    docs = load_table(spark, sf_dir, "documents")
    hint = _lm_count_table_hint(spark, sf_dir, broadcast_gate_bytes)
    bg = (
        docs.select(F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(element_at(w, i) AS w1,"
                    " element_at(w, i + 1) AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    cl = bg.groupBy("w1").agg(F.count("*").alias("cl"))
    cr = bg.groupBy("w2").agg(F.count("*").alias("cr"))
    nn = bg.agg(F.count("*").alias("lm_n"))
    return (
        c12.filter(F.col("c2") >= 5)
        .join(hint(cl), "w1")
        .join(hint(cr), "w2")
        .crossJoin(F.broadcast(nn))
        .select(
            "w1",
            "w2",
            F.col("c2").cast("long").alias("c12"),
            F.expr(
                "(CAST(c2 AS DECIMAL(38,0)) * lm_n * 1000000)"
                " div (CAST(cl AS DECIMAL(38,0)) * cr)"
            )
            .cast("long")
            .alias("pmi_ratio_q6"),
        )
        .orderBy(F.col("pmi_ratio_q6").desc(), "w1", "w2")
        .limit(20)
    )


@query(
    "llm_ngram_coverage_curve",
    oracle="""
    WITH t AS (
      SELECT string_split(text, ' ') AS w FROM documents
    ), bg AS (
      SELECT w[i] AS w1, w[i+1] AS w2
      FROM t, unnest(range(1, len(w))) AS u(i)
      WHERE len(w) >= 2
    ), c12 AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2
    ), top AS (
      SELECT c2, row_number() OVER (ORDER BY c2 DESC, w1, w2) AS rn
      FROM c12 ORDER BY c2 DESC, w1, w2 LIMIT 10000
    ), tot AS (
      SELECT COUNT(*) AS n_occ, (SELECT COUNT(*) FROM c12) AS n_types FROM bg
    )
    SELECT g.top_n,
           CAST(COUNT(*) AS BIGINT) AS n_types_used,
           CAST(SUM(c2) AS BIGINT) AS covered,
           round(SUM(c2) * 1.0 / MAX(n_occ), 6) AS coverage
    FROM top
    JOIN (SELECT unnest([100, 1000, 10000]) AS top_n) g ON top.rn <= g.top_n
    JOIN tot ON TRUE
    GROUP BY g.top_n ORDER BY g.top_n
    """,
)
def llm_ngram_coverage_curve(spark, sf_dir):
    """Zipf coverage curve for LM/tokenizer budget planning: what
    fraction of all bigram OCCURRENCES do the top-{100, 1k, 10k} bigram
    TYPES cover? This is the table that sizes an n-gram LM's pruning
    threshold or a phrase-vocabulary budget — coverage saturating by 10k
    says a small table suffices; a shallow curve says the corpus's mass
    sits in the tail and pruning will cost perplexity (the Heaps/Zipf
    companion to llm_vocab_growth's type-accumulation view).

    Rank order is pinned (count DESC, w1, w2) so ties cut identically on
    both engines. Scale shape: the ONLY global ordering is a top-10000
    TakeOrderedAndProject over the already-aggregated bigram-type table
    — never a full sort, never a single-partition window over the type
    domain; the 10k survivors get their row_numbers in one tiny-side
    window, the 3-row threshold grid broadcast-joins onto them, and the
    occurrence total folds in as a one-row aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    bg = (
        docs.select(F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(element_at(w, i) AS w1,"
                    " element_at(w, i + 1) AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    top = (
        c12.orderBy(F.col("c2").desc(), "w1", "w2")
        .limit(10000)
        .select(
            "c2",
            F.row_number()
            .over(Window.orderBy(F.col("c2").desc(), "w1", "w2"))
            .alias("rn"),
        )
    )
    tot = bg.agg(F.count("*").alias("n_occ"))
    grid = spark.createDataFrame([(100,), (1000,), (10000,)], "top_n INT")
    return (
        top.join(F.broadcast(grid), F.col("rn") <= F.col("top_n"))
        .crossJoin(F.broadcast(tot))
        .groupBy("top_n")
        .agg(
            F.count("*").cast("long").alias("n_types_used"),
            F.sum("c2").cast("long").alias("covered"),
            F.round(F.sum("c2") / F.max("n_occ"), 6).alias("coverage"),
        )
        .orderBy("top_n")
    )


# Composed oracle: wrap llm_lang_id's full SQL (registered just above) so
# the confusion rollup and the per-doc op can never drift apart.
from ..registry import ORACLES as _ORACLES  # noqa: E402  (after registrations)


@query(
    "llm_lang_id_confusion",
    oracle=f"""
    WITH base AS ({_ORACLES["llm_lang_id"]}),
    tot AS (SELECT COUNT(*) AS t FROM base)
    SELECT true_lang, pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(COUNT(*) * 1.0 / MAX(t), 6) AS pct_corpus
    FROM base JOIN tot ON TRUE
    GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """,
)
def llm_lang_id_confusion(spark, sf_dir):
    """Confusion matrix of the stopword-hit-rate language identifier
    against the labeled lang column — the eval table that decides
    whether the cheap heuristic is good enough to partition a corpus by
    (off-diagonal mass on a language pair means its routing leaks
    training data into the wrong per-language pipeline; CCNet publishes
    exactly this audit for its fastText stage). Composes llm_lang_id
    verbatim — the oracle literally embeds that op's SQL as a CTE, so
    the classifier under audit and the classifier in production cannot
    drift apart.

    Plan: llm_lang_id's one doc-keyed aggregation, then a rollup onto
    the |langs|² domain with map-side combine and a one-row total for
    the share — nothing new is corpus-sized."""
    base = llm_lang_id(spark, sf_dir)
    tot = base.agg(F.count("*").alias("t"))
    return (
        base.crossJoin(F.broadcast(tot))
        .groupBy("true_lang", "pred_lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.count("*") / F.max("t"), 6).alias("pct_corpus"),
        )
        .orderBy("true_lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# Full BPE training loop (VERDICT r7 "Next round" item 5 — the documented
# driver-loop extension of llm_bpe_merge_candidates, SURVEY §2.10 notes).

# Symbol separator inside the evolving segmentation strings: U+001F (unit
# separator) never occurs in the fixture text, so `replace(tok_sep,
# a||SEP||b, a||b)` can only match at genuine symbol boundaries.
_BPE_SEP = "\x1f"
_BPE_N_MERGES = 8


def _bpe_symbols_expr():
    """Column expr: the symbol array of a wrapped tok_sep (strip the one
    leading + one trailing separator, split on the double separator)."""
    from pyspark.sql import functions as F

    return F.expr("substring(tok_sep, 2, length(tok_sep) - 2)")


def _bpe_oracle(n_merges: int) -> str:
    """Unrolled n-iteration BPE trainer in DuckDB SQL.

    Every per-round CTE is AS MATERIALIZED — the kcore lesson: DuckDB
    inlines multiply-referenced CTEs, and seg{i} is referenced by both
    the pair-count and the re-segmentation of round i, so an un-hinted
    unroll re-evaluates the whole prefix exponentially."""
    sep = "chr(31)"
    # Every symbol is wrapped INDIVIDUALLY (␟sym␟ concatenated, so the
    # string is ␟a␟␟b␟…): the merge pattern ␟a␟␟b␟ is then anchored at
    # both symbol boundaries, and a symbol merely ENDING in `a` (or
    # starting with `b`) cannot false-match — with the bare a␟b pattern
    # it did (code-review r8: 'abcd' as [ab,c,d] glued to [abc,d] when
    # (b,c) merged, because 'ab' ends in 'b'). Plain replace stays
    # greedy-left-to-right non-overlapping — exactly Sennrich's merge —
    # and consecutive occurrences still both merge (␟a␟␟a␟␟a␟␟a␟ →
    # ␟aa␟␟aa␟) because the pattern consumes whole wrapped symbols.
    # Lookaround regexes would also fix it but DuckDB's RE2 has none.
    parts = [
        f"""WITH wc AS MATERIALIZED (
      SELECT tok, COUNT(*) AS wcount FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      ) WHERE tok <> '' GROUP BY tok
    ), seg0 AS MATERIALIZED (
      SELECT tok,
             {sep} || array_to_string(string_split_regex(tok, ''),
                                      {sep} || {sep}) || {sep} AS tok_sep,
             wcount
      FROM wc
    )"""
    ]
    for i in range(n_merges):
        parts.append(
            f""", pc{i} AS MATERIALIZED (
      SELECT u.a AS a, u.b AS b, CAST(SUM(wcount) AS BIGINT) AS cnt
      FROM (
        SELECT unnest(list_transform(range(1, len(s)),
                 j -> struct_pack(a := s[CAST(j AS INTEGER)],
                                  b := s[CAST(j AS INTEGER) + 1]))) AS u,
               wcount
        FROM (SELECT string_split(trim(tok_sep, {sep}), {sep} || {sep}) AS s,
                     wcount FROM seg{i})
      )
      GROUP BY u.a, u.b
    ), best{i} AS MATERIALIZED (
      SELECT a, b, cnt FROM pc{i} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    ), seg{i + 1} AS MATERIALIZED (
      SELECT tok,
             replace(tok_sep,
                     {sep} || (SELECT a FROM best{i}) || {sep} || {sep}
                           || (SELECT b FROM best{i}) || {sep},
                     {sep} || (SELECT a FROM best{i})
                           || (SELECT b FROM best{i}) || {sep}) AS tok_sep,
             wcount
      FROM seg{i}
    )"""
        )
    return "".join(parts)


def _bpe_train_oracle(n_merges: int) -> str:
    unions = "\n      UNION ALL\n".join(
        f"      SELECT CAST({i + 1} AS BIGINT) AS rank, a AS left_sym,"
        f" b AS right_sym, a || b AS merged, cnt AS pair_count FROM best{i}"
        for i in range(n_merges)
    )
    return (
        _bpe_oracle(n_merges)
        + f"\n    SELECT * FROM (\n{unions}\n    ) ORDER BY rank"
    )


def _bpe_encode_oracle(n_merges: int) -> str:
    """Per-document tokenization stats under the trained merge table: the
    final seg{n} CTE IS the tokenizer (word → symbol segmentation), so
    encoding = re-tokenize the corpus by whitespace and join each word's
    symbol count back on."""
    return (
        _bpe_oracle(n_merges)
        + f""", wordtok AS MATERIALIZED (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> ''
    )
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(w.word)) AS BIGINT) AS n_chars,
           CAST(SUM(len(string_split(trim(s.tok_sep, chr(31)),
                                     chr(31) || chr(31)))) AS BIGINT)
             AS n_tokens,
           round(SUM(len(w.word)) * 1.0
                 / SUM(len(string_split(trim(s.tok_sep, chr(31)),
                                        chr(31) || chr(31)))), 6)
             AS chars_per_token
    FROM wordtok w JOIN seg{n_merges} s ON w.word = s.tok
    GROUP BY w.doc_id"""
    )


@query("llm_bpe_train", oracle=_bpe_train_oracle(_BPE_N_MERGES))
def llm_bpe_train(spark, sf_dir):
    """Full BPE tokenizer training (Sennrich, Haddow & Birch, ACL 2016):
    a bounded driver loop of ``_BPE_N_MERGES`` merge rounds over an
    evolving symbol table, returning the ordered merge table
    (rank, left_sym, right_sym, merged, pair_count) — the artifact a
    BPE tokenizer ships. Extends llm_bpe_merge_candidates (which is
    exactly round 1's pair statistic) into the real training loop.

    Spark-first shape, and why it scales: the corpus is touched ONCE —
    the word-count aggregation (heavy-hitter shuffle collapsing ~Zipf
    duplicate words). Everything after runs on the DISTINCT-WORD table:
    Heaps-sized, far smaller than the corpus, and it stays a distributed
    DataFrame throughout — the loop never collects it. Per round:
    (1) adjacent-pair counts = one map-side-combined shuffle on (a, b)
    over the word table, argmax via a 1-row TakeOrdered — the ONLY
    driver-side collect is that single best-pair row (the watermark-read
    pattern); (2) re-segmentation is a map-only literal string replace
    (greedy left-to-right, exactly BPE's non-overlapping merge — both
    engines' ``replace`` scans left to right); (3) localCheckpoint
    truncates the 8-round lineage so round k's plan doesn't replay
    rounds 0..k-1 (the pointer-jumping CC discipline). The merge table
    itself is N rows — driver-sized by construction, like every real
    BPE trainer (HuggingFace tokenizers holds word counts in memory;
    this one distributes them).

    Words shorter than 2 symbols are filtered per round (Spark's
    sequence(1, 0) yields a DESCENDING [1, 0] — without the size guard
    it would fabricate null pairs; DuckDB's range(1, 1) is empty, so
    the guard also keeps the engines aligned). Ties break on
    (count DESC, a ASC, b ASC) — binary collation on both engines.

    MEASURED BOUND (BASELINE addendum 31): the per-merge marginal cost
    is ~0.17 s of corpus-INDEPENDENT driver-loop overhead (0.174 s at a
    7.5 M-doc corpus, 0.086 s at the sf0.001 fixture — job latency, not
    data), so this sequential form is sound up to ~hundreds of merges; a
    32k-merge production vocab would cost ≈90 minutes of pure round
    overhead. Past that, use llm_bpe_train_batched (k merges per round,
    same per-ROUND cost; rounds ~ vocab / REALIZED yield — addendum 59
    measured yield saturating at ~5/round on the template fixture
    because hot symbols chain, so the round count is a corpus property,
    not vocab/k)."""
    merges, _seg = _bpe_fit(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "rank BIGINT, left_sym STRING, right_sym STRING,"
        " merged STRING, pair_count BIGINT",
    ).orderBy("rank")


def _bpe_word_seg(spark, sf_dir):
    """Initial wrapped segmentation of the DISTINCT-WORD table — the
    shared starting state of both BPE trainers. Wrapped representation
    (see _bpe_oracle): each symbol is ␟sym␟, so the literal merge
    pattern ␟a␟␟b␟ anchors BOTH symbol boundaries — a bare a␟b pattern
    false-matched symbols merely ending in a / starting with b
    (code-review r8 finding, repro in test_bpe_train_boundary_anchoring).
    """
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("wcount"))
    )
    return wc.select(
        "tok",
        F.concat(
            F.lit(_BPE_SEP),
            F.concat_ws(_BPE_SEP + _BPE_SEP, F.split("tok", "")),
            F.lit(_BPE_SEP),
        ).alias("tok_sep"),
        "wcount",
    ).localCheckpoint(eager=True)


def _bpe_pair_counts(seg):
    """Adjacent-pair counts over a segmented word table: one map-side-
    combined shuffle on (a, b)."""
    syms = seg.select(
        F.split(_bpe_symbols_expr(), _BPE_SEP + _BPE_SEP).alias("s"),
        "wcount",
    ).filter(F.size("s") >= 2)
    return (
        syms.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(s) - 1),"
                    " j -> struct(element_at(s, j) AS a,"
                    " element_at(s, j + 1) AS b))"
                )
            ).alias("p"),
            "wcount",
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("wcount").cast("long").alias("cnt"))
    )


def _bpe_fit(spark, sf_dir, n_merges: int | None = None):
    """Shared BPE training loop: returns (merge list, final segmented
    DISTINCT-WORD DataFrame carrying (tok, tok_sep, wcount)).  The word
    table keeps the original ``tok`` so downstream ops (llm_bpe_encode)
    can join the trained segmentation back onto the token stream.
    ``n_merges`` late-binds to the module global (tests repoint it)."""
    if n_merges is None:
        n_merges = _BPE_N_MERGES
    seg = _bpe_word_seg(spark, sf_dir)
    merges = []
    for rnd in range(n_merges):
        pair_counts = _bpe_pair_counts(seg)
        best = (
            pair_counts.orderBy(F.col("cnt").desc(), "a", "b").limit(1).collect()
        )
        if not best:
            break  # vocabulary exhausted before the merge budget
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["cnt"]
        merges.append((rnd + 1, a, b, a + b, cnt))
        seg = seg.withColumn(
            "tok_sep",
            F.replace(
                F.col("tok_sep"),
                F.lit(_BPE_SEP + a + _BPE_SEP + _BPE_SEP + b + _BPE_SEP),
                F.lit(_BPE_SEP + a + b + _BPE_SEP),
            ),
        ).localCheckpoint(eager=True)
    return merges, seg


@query("llm_bpe_encode", oracle=_bpe_encode_oracle(_BPE_N_MERGES))
def llm_bpe_encode(spark, sf_dir):
    """Apply the trained BPE tokenizer to the corpus: per-document token
    counts and chars-per-token compression under the merge table
    llm_bpe_train produces — the tokenize-the-corpus half of the
    tokenizer lifecycle (train → encode), and the statistic that decides
    whether a vocab budget actually pays for itself on a given corpus
    (chars/token is the fertility-style efficiency number; a merge table
    that doesn't raise it is wasted vocab).

    Spark-first shape: :func:`_bpe_fit` already leaves the trained
    segmentation as a DISTINCT-WORD DataFrame (tok → tok_sep) — the
    tokenizer artifact itself, never collected. Encoding is then one
    whitespace re-tokenization of the corpus joined to that table on the
    word, with the join side byte-gated exactly like every other
    Heaps-sized table (``_lm_count_table_hint`` — the segmentation table
    has one row per distinct word): under the gate it broadcasts, over
    it the join shuffles co-partitioned with the word key. Per-doc
    rollup is a single map-side-combined aggregation; nothing
    corpus-sized shuffles twice."""
    merges, seg = _bpe_fit(spark, sf_dir)
    hint = _lm_count_table_hint(spark, sf_dir)
    lexicon = seg.select(
        "tok",
        F.size(
            F.split(_bpe_symbols_expr(), _BPE_SEP + _BPE_SEP)
        ).alias("n_syms"),
    )
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.join(hint(lexicon), words["word"] == lexicon["tok"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            F.sum("n_syms").cast("long").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_chars",
            "n_tokens",
            F.round(
                F.col("n_chars") * F.lit(1.0) / F.col("n_tokens"), 6
            ).alias("chars_per_token"),
        )
    )


_BPE_BATCH_K = 4
_BPE_BATCH_ROUNDS = 4


def _bpe_batched_oracle(k: int, rounds: int) -> str:
    """Unrolled batched BPE trainer in DuckDB SQL: per round, the top-k
    pair candidates are filtered to a mutually non-interfering set (a
    candidate is dropped if ANY higher-ranked candidate shares a symbol
    with it — comparing {a, b, a||b} on both sides, so a pair can
    neither consume another kept pair's symbols nor collide with its
    merged output), and all kept pairs apply in one re-segmentation
    pass.  The declarative drop rule (blocked by any higher-ranked
    CANDIDATE, kept or not) is deliberately more conservative than
    greedy-over-kept: it needs no sequential state, so both engines can
    express it identically.  Unused replace slots fall back to a
    three-separator pattern, which cannot occur (symbols are never
    empty, so separators come at most two in a row)."""
    sep = "chr(31)"
    imp = f"{sep} || {sep} || {sep}"
    parts = [
        f"""WITH wc AS MATERIALIZED (
      SELECT tok, COUNT(*) AS wcount FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      ) WHERE tok <> '' GROUP BY tok
    ), bseg0 AS MATERIALIZED (
      SELECT tok,
             {sep} || array_to_string(string_split_regex(tok, ''),
                                      {sep} || {sep}) || {sep} AS tok_sep,
             wcount
      FROM wc
    )"""
    ]
    for i in range(rounds):
        repl = "tok_sep"
        for s in range(1, k + 1):
            pat = (
                f"COALESCE((SELECT {sep} || a || {sep} || {sep} || b || {sep}"
                f" FROM keep{i} WHERE slot = {s}), {imp})"
            )
            rep = (
                f"COALESCE((SELECT {sep} || a || b || {sep}"
                f" FROM keep{i} WHERE slot = {s}), '')"
            )
            repl = f"replace({repl},\n                     {pat},\n                     {rep})"
        parts.append(
            f""", bpc{i} AS MATERIALIZED (
      SELECT u.a AS a, u.b AS b, CAST(SUM(wcount) AS BIGINT) AS cnt
      FROM (
        SELECT unnest(list_transform(range(1, len(s)),
                 j -> struct_pack(a := s[CAST(j AS INTEGER)],
                                  b := s[CAST(j AS INTEGER) + 1]))) AS u,
               wcount
        FROM (SELECT string_split(trim(tok_sep, {sep}), {sep} || {sep}) AS s,
                     wcount FROM bseg{i})
      )
      GROUP BY u.a, u.b
    ), cand{i} AS MATERIALIZED (
      SELECT a, b, cnt,
             row_number() OVER (ORDER BY cnt DESC, a ASC, b ASC) AS rk
      FROM bpc{i} QUALIFY rk <= {k}
    ), keep{i} AS MATERIALIZED (
      SELECT a, b, cnt, row_number() OVER (ORDER BY rk) AS slot
      FROM cand{i} c
      WHERE NOT EXISTS (
        SELECT 1 FROM cand{i} h
        WHERE h.rk < c.rk AND (
          h.a IN (c.a, c.b, c.a || c.b) OR
          h.b IN (c.a, c.b, c.a || c.b) OR
          (h.a || h.b) IN (c.a, c.b, c.a || c.b))
      )
    ), bseg{i + 1} AS MATERIALIZED (
      SELECT tok, {repl} AS tok_sep, wcount
      FROM bseg{i}
    )"""
        )
    unions = "\n      UNION ALL\n".join(
        f"      SELECT {i} AS rnd, slot, a AS left_sym, b AS right_sym,"
        f" a || b AS merged, cnt AS pair_count FROM keep{i}"
        for i in range(rounds)
    )
    return (
        "".join(parts)
        + f"""
    SELECT CAST(row_number() OVER (ORDER BY rnd, slot) AS BIGINT) AS rank,
           left_sym, right_sym, merged, pair_count
    FROM (
{unions}
    ) ORDER BY rank"""
    )


def _bpe_fit_batched(spark, sf_dir, k: int = _BPE_BATCH_K,
                     rounds: int = _BPE_BATCH_ROUNDS):
    """Batched BPE training loop (merge up to k non-interfering pairs
    per round): returns (merge list, final segmented word table). The
    driver-side state per round is ONE k-row collect; the interference
    filter mirrors _bpe_batched_oracle's declarative rule exactly."""
    seg = _bpe_word_seg(spark, sf_dir)
    merges = []
    for _rnd in range(rounds):
        cand = (
            _bpe_pair_counts(seg)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(k)
            .collect()
        )
        if not cand:
            break  # vocabulary exhausted before the merge budget
        kept = []
        for i, c in enumerate(cand):
            csyms = {c["a"], c["b"], c["a"] + c["b"]}
            blocked = any(
                h["a"] in csyms or h["b"] in csyms or (h["a"] + h["b"]) in csyms
                for h in cand[:i]
            )
            if not blocked:
                kept.append(c)
        col = F.col("tok_sep")
        for c in kept:
            a, b = c["a"], c["b"]
            col = F.replace(
                col,
                F.lit(_BPE_SEP + a + _BPE_SEP + _BPE_SEP + b + _BPE_SEP),
                F.lit(_BPE_SEP + a + b + _BPE_SEP),
            )
            merges.append((len(merges) + 1, a, b, a + b, c["cnt"]))
        seg = seg.withColumn("tok_sep", col).localCheckpoint(eager=True)
    return merges, seg


@query(
    "llm_bpe_train_batched",
    oracle=_bpe_batched_oracle(_BPE_BATCH_K, _BPE_BATCH_ROUNDS),
)
def llm_bpe_train_batched(spark, sf_dir):
    """Batched-merge BPE training — the production-scale variant of
    llm_bpe_train (VERDICT r8 item 5): per round, the top-k candidate
    pairs are filtered to a mutually NON-INTERFERING set (no symbol of a
    kept pair may appear among a higher-ranked candidate's {left, right,
    merged} symbols — so one replace pass applies them all, order-free)
    and merged together.  The sequential trainer's scale axis is the
    DRIVER LOOP, not the corpus: a 32k-merge production vocab means 32k
    Spark jobs of (pair-count shuffle + 1-row argmax collect +
    checkpoint).  Batching divides that round count by ~k at the cost of
    a mild greedy approximation (pair counts within a batch are
    selection-time statistics, exactly like HuggingFace tokenizers'
    max-heap batching).  The round count is vocab / REALIZED
    merges-per-round, and realized yield is a CORPUS property: the
    interference filter caps it at how many frequent pairs avoid
    chaining through shared hot symbols — measured at the 600 k-word
    tier (addendum 59), yield saturates at ~5/round for BOTH k=16 and
    k=64 on the template fixture, while per realized merge the batched
    path is still 3.8-5.2x cheaper than sequential; a 32k vocab at
    k=256 is ~125 rounds ONLY on a corpus whose candidate pairs rarely
    interfere (a real web vocabulary — now an explicit assumption, not
    arithmetic).
    Demonstrated here at k=4 × 4 rounds so the DuckDB oracle stays an
    unrollable 4-CTE-per-round pipeline; the merge table matches the
    oracle value-for-value, and the per-merge cost curve vs the
    sequential trainer is measured in BASELINE addendum 31.

    Interference rule: candidate c is dropped when ANY higher-ranked
    candidate h (kept or not) has {h.a, h.b, h.merged} ∩ {c.a, c.b,
    c.merged} ≠ ∅.  Checking h.merged matters: merging (a,b) can create
    new adjacencies only INVOLVING the merged symbol ab, so excluding it
    from every other kept pair's symbols guarantees each replace neither
    consumes nor creates matches of the others — the batch is
    order-independent, and the wrapped ␟a␟␟b␟ representation keeps each
    individual replace boundary-anchored (addendum 27)."""
    merges, _seg = _bpe_fit_batched(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "rank BIGINT, left_sym STRING, right_sym STRING,"
        " merged STRING, pair_count BIGINT",
    ).orderBy("rank")
