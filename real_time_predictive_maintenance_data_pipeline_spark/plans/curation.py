"""Training-data curation catalog, round 3: sub-document dedup
(paragraph/chunk + cross-doc span), retrieval (BM25), graph analytics
over co-occurrence, and interpolation/changepoint time-series prep.

These extend the charter's "operations a large-scale training-data
pipeline would need" beyond the round-1/2 surface (dedup_*, doc_*,
emb_*, sim_* in plans/llm.py). Everything here is expressed as
DataFrame plans (no RDDs, no collect); SQL-expressible semantics carry
a DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import has_min_tokens
from ..operators.spread import spread
from ..sources.tables import load_table
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spread(load_table(spark, sf_dir, "documents"))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Sub-document deduplication
# ---------------------------------------------------------------------------

_CHUNK = 8  # words per chunk (CCNet dedups ~100-token paragraphs; the
# fixture corpus has short docs, so the chunk is scaled down with it)


@register(
    "doc_chunk_dedup",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
c0 AS (
  SELECT doc_id,
         UNNEST(list_transform(range(0, CAST(CEIL(len(words) / {_CHUNK}.0) AS BIGINT)),
             i -> struct_pack(idx := i,
                              chunk := array_to_string(words[(i*{_CHUNK}+1):(i*{_CHUNK}+{_CHUNK})], ' ')))) AS u
  FROM w
),
c AS (SELECT doc_id, u.idx AS idx, u.chunk AS chunk FROM c0),
f AS (SELECT chunk, COUNT(*) AS freq FROM c GROUP BY chunk),
k AS (SELECT c.doc_id, c.idx, c.chunk FROM c JOIN f USING (chunk) WHERE f.freq <= 2),
agg AS (SELECT doc_id, COUNT(*) AS n_kept,
               STRING_AGG(chunk, ' ' ORDER BY idx) AS clean_text
        FROM k GROUP BY doc_id),
tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM c GROUP BY doc_id)
SELECT t.doc_id, t.n_chunks, COALESCE(a.n_kept, 0) AS n_kept,
       COALESCE(a.clean_text, '') AS clean_text
FROM tot t LEFT JOIN agg a USING (doc_id)
""",
    tags=("text", "dedup"),
)
def doc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (paragraph-level) dedup, CCNet-style: split every
    doc into fixed non-overlapping word chunks, count each chunk's
    global frequency, drop chunks seen more than twice anywhere in the
    corpus, and reassemble the surviving text in order. Removes shared
    boilerplate (headers, license blurbs, navigation) that whole-doc
    dedup can never touch.

    Scale shape: one narrow explode (doc_id, idx, chunk), one
    aggregation shuffled on the chunk key (map-side partial combine
    collapses repeats before the exchange — at 100 TB you'd shuffle a
    64-bit digest of the chunk like dedup_exact does, joining text back
    by digest), one join chunk→freq, one re-aggregation on doc_id.
    No all-pairs stage; cost linear in corpus chunk volume."""
    d = _docs(spark, sf_dir)
    words = F.split("text", " ")
    n_chunks_arr = F.ceil(F.size(words) / float(_CHUNK)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks_arr - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * _CHUNK + 1, _CHUNK)),
    )
    c = d.select("doc_id", F.posexplode(chunk_arr).alias("idx", "chunk"))
    freq = c.groupBy("chunk").agg(F.count(F.lit(1)).alias("freq"))
    # single pass back over the chunks: conditional aggregation computes
    # total + kept + reassembly in ONE groupBy (collect_list drops the
    # nulls of filtered chunks), instead of a second scan of the explode
    # plus a doc-level outer join
    keep = F.col("freq") <= 2
    return (
        c.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct("idx", "chunk"))
                        )
                    ),
                    lambda s: s.getField("chunk"),
                ),
            ).alias("clean_text"),
        )
        .select("doc_id", "n_chunks", "n_kept", "clean_text")
    )


@register(
    "doc_span_dedup",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
s AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(words) - 8),
                               i -> array_to_string(words[i:(i+9)], ' '))) AS span
  FROM w WHERE len(words) >= 10
)
SELECT span, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
FROM s GROUP BY span
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occ DESC, span
LIMIT 100
""",
    tags=("text", "dedup"),
)
def doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span detection — the signal behind
    exact substring dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better"): every overlapping 10-word span,
    counted across the corpus; spans occurring in >= 2 distinct docs
    are memorization hazards. (The reference paper builds a suffix
    array; the distributed equivalent is this windowed n-gram count —
    same duplicated-span set for a fixed span length, embarrassingly
    parallel.)

    Scale shape: narrow explode to (doc_id, span), one aggregation
    shuffled on span (at 100 TB shuffle an 8-byte xxhash64 of the span
    and resolve text afterwards), global top-100 via
    TakeOrderedAndProject — never a full sort."""
    d = _docs(spark, sf_dir)
    words = F.split("text", " ")
    spans = d.filter(has_min_tokens("text", 10)).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - 9),
                lambda i: F.concat_ws(" ", F.slice(words, i, 10)),
            )
        ).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occ"), "span")
        .limit(100)
    )


@register(
    "doc_char_entropy",
    oracle="""
WITH ch AS (
  SELECT doc_id, UNNEST(string_split_regex(text, '')) AS c
  FROM documents
),
cnt AS (SELECT doc_id, c, COUNT(*) AS k FROM ch WHERE c <> '' GROUP BY 1, 2),
d AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n,
             list(k ORDER BY c) AS ks
      FROM cnt GROUP BY doc_id)
SELECT doc_id, n,
       ROUND(-list_reduce(list_prepend(0.0, list_transform(ks,
                 k -> (k * 1.0 / n) * LN(k * 1.0 / n))), (a, b) -> a + b), 4)
         AS entropy
FROM d
""",
    tags=("text", "quality"),
)
def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic
    cheap quality/noise signal (near-zero entropy = repeated filler,
    very high = binary junk; C4/Gopher-style pipelines threshold it).

    FP discipline: the per-doc Σ p·ln p runs over a CHARACTER-SORTED
    list folded sequentially (``aggregate`` here, ``list_reduce`` in
    the oracle) — a plain SUM over the group would associate partial
    sums differently per engine and diverge under the 4-dp round.
    Scale shape: one narrow explode to (doc_id, char), two
    aggregations on doc_id (the second collects ≤ |charset| counts),
    no joins, no UDF."""
    d = _docs(spark, sf_dir)
    ch = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("c")
    ).filter(F.col("c") != "")
    cnt = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("k"))
    per = cnt.groupBy("doc_id").agg(
        F.sum("k").alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("c", "k"))),
            lambda s: s.getField("k"),
        ).alias("ks"),
    )
    return per.select(
        "doc_id",
        "n",
        F.round(
            -F.aggregate(
                "ks",
                F.lit(0.0),
                lambda acc, x: acc
                + (x * 1.0 / F.col("n")) * F.log(x * 1.0 / F.col("n")),
            ),
            4,
        ).alias("entropy"),
    )


@register("doc_compression_ratio", oracle=None, tags=("text", "quality"))
def doc_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zlib compression ratio per document — the Gopher-style
    redundancy signal (highly compressible text is boilerplate or
    repetition; incompressible is noise/binary junk). Python is
    unavoidable (no zlib in SQL), so this is the UDF-done-right
    pattern: an Arrow-batched pandas UDF (one zlib call per row inside
    a vectorized batch, ~100× the throughput of a row-at-a-time UDF),
    map-only — no shuffle, no collect. Rows-only; byte-exactness vs
    direct zlib gated in tests/test_properties.py."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def zratio(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t: str) -> float:
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, 6)) / len(raw), 6)

        # na_action="ignore" passes nulls through as nulls — a missing
        # document has no compression ratio, and t.encode(None) would
        # kill the Arrow worker.
        return texts.map(one, na_action="ignore")

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_text"),
        zratio("text").alias("zlib_ratio"),
    )


@register(
    "doc_bigram_lm",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(words)),
                               i -> words[i] || ' ' || words[i + 1])) AS gram
  FROM w WHERE len(words) >= 2
),
c2 AS (SELECT gram, COUNT(*) AS n2 FROM g GROUP BY gram),
c1 AS (SELECT string_split(gram, ' ')[1] AS w1, CAST(SUM(n2) AS BIGINT) AS n1
       FROM c2 GROUP BY 1),
v AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS vs
      FROM (SELECT UNNEST(words) AS word FROM w)),
lp AS (
  SELECT c2.gram,
         -log2((c2.n2 + 1.0) / (c1.n1 + v.vs)) AS bits
  FROM c2 JOIN c1 ON string_split(c2.gram, ' ')[1] = c1.w1, v
),
per AS (
  SELECT g.doc_id, COUNT(*) AS n_bigrams,
         list(lp.bits ORDER BY lp.bits) AS bs
  FROM g JOIN lp USING (gram) GROUP BY g.doc_id
)
SELECT doc_id, n_bigrams,
       ROUND(list_reduce(list_prepend(0.0, bs), (a, b) -> a + b)
             / n_bigrams, 4) AS bits_per_bigram
FROM per
""",
    tags=("text", "pipeline"),
)
def doc_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus's own Laplace-
    smoothed BIGRAM model — the context-conditional upgrade of
    doc_unigram_logprob and the SQL-native stand-in for the KenLM
    perplexity filter CCNet runs: p(w2|w1) = (c(w1w2)+1)/(c(w1·)+V).

    FP discipline: each doc's surprisal sum folds a VALUE-SORTED list
    sequentially (functions/timeutil.ordered_fold_sum) — identical
    addend values in identical order on both engines, so the 4-dp
    round cannot diverge on association order.

    Scale shape: gram counts shuffle on the gram key (map-side
    combine); the context counts derive from the (already tiny)
    distinct-gram table, not a second corpus pass; V is a 1-row
    broadcast; the per-doc fold shuffles (doc_id, bits) pairs only."""
    d = _docs(spark, sf_dir)
    words = F.split("text", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1)
        ),
    )
    g = d.filter(has_min_tokens("text", 2)).select(
        "doc_id", F.explode(grams).alias("gram")
    )
    c2 = g.groupBy("gram").agg(F.count(F.lit(1)).alias("n2"))
    c1 = (
        c2.groupBy(F.split("gram", " ")[0].alias("w1"))
        .agg(F.sum("n2").alias("n1"))
    )
    v = (
        d.select(F.explode(words).alias("word"))
        .agg(F.countDistinct("word").alias("vs"))
    )
    lp = (
        c2.join(c1, F.split(c2.gram, " ")[0] == c1.w1)
        .crossJoin(F.broadcast(v))
        .select(
            "gram",
            (-F.log2((F.col("n2") + 1.0) / (F.col("n1") + F.col("vs")))).alias(
                "bits"
            ),
        )
    )
    from ..functions.timeutil import ordered_fold_sum

    # the fold sorts the bits VALUES (equal grams have equal bits, so
    # value order is as deterministic as gram order) — the groupBy
    # exchange then carries (doc_id, bits) pairs only, never the gram
    # strings
    per = (
        g.join(lp, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.collect_list("bits").alias("bs"),
        )
    )
    return per.select(
        "doc_id",
        "n_bigrams",
        F.round(
            ordered_fold_sum(F.col("bs")) / F.col("n_bigrams"), 4
        ).alias("bits_per_bigram"),
    )


@register(
    "doc_curation_funnel",
    oracle="""
WITH uniq AS (
  SELECT MIN(doc_id) AS doc_id, ANY_VALUE(text) AS text
  FROM documents GROUP BY text
),
q AS (
  SELECT doc_id, text FROM uniq
  WHERE ROUND(0.5 * LEAST(1.0, len(string_split(text, ' ')) / 50.0)
            + 0.5 * (len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' '))), 4) >= 0.5
),
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM q),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(words)),
                                      i -> words[i] || ' ' || words[i + 1])) AS grams
  FROM w WHERE len(words) >= 2
),
bench AS (SELECT DISTINCT UNNEST(grams) AS gram FROM g WHERE doc_id % 20 = 0),
contaminated AS (
  SELECT t.doc_id
  FROM (SELECT doc_id, len(grams) AS n_grams, UNNEST(grams) AS gram
        FROM g WHERE doc_id % 20 <> 0) t
  JOIN bench b ON t.gram = b.gram
  GROUP BY t.doc_id, t.n_grams
  HAVING ROUND(COUNT(*) * 1.0 / t.n_grams, 4) >= 0.5
),
clean AS (
  SELECT doc_id FROM q
  WHERE doc_id % 20 <> 0
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
)
SELECT 1 AS stage, 'raw' AS name, (SELECT COUNT(*) FROM documents) AS n_docs
UNION ALL SELECT 2, 'exact_dedup', (SELECT COUNT(*) FROM uniq)
UNION ALL SELECT 3, 'quality_pass', (SELECT COUNT(*) FROM q)
UNION ALL SELECT 4, 'train_split', (SELECT COUNT(*) FROM q WHERE doc_id % 20 <> 0)
UNION ALL SELECT 5, 'decontaminated', (SELECT COUNT(*) FROM clean)
""",
    tags=("text", "dedup", "pipeline", "caches"),
)
def doc_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation funnel as ONE plan: raw corpus → exact
    dedup (keep min id per identical text) → heuristic quality filter
    (doc_quality >= 0.5) → train/eval split → benchmark
    decontamination (>= 50 % bigram containment dropped). Per-stage
    survivor counts — the yield report every data-curation run ends
    with, and the composition proof that the individual operators
    chain.

    Scale shape: each stage narrows the previous one's frame (Catalyst
    pipelines the filters; the only shuffles are the text-digest
    dedup, the bigram-count aggregation, and the broadcast-semi
    decontamination join — same shapes as the standalone operators)."""
    from ..functions import text as T

    d = _docs(spark, sf_dir)
    # the full-corpus text dedup is the one shuffle every later stage
    # builds on — persist it so the five stage branches reuse it
    # instead of re-aggregating the corpus per branch
    uniq = (
        d.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "text")
        .persist()
    )
    # SAME rounded expressions as the standalone operators
    # (T.quality_score / doc_decontaminate) — raw-double thresholds
    # would disagree with them exactly at the 0.5 boundary
    q = uniq.filter(T.quality_score("text") >= 0.5)
    g = (
        q.filter(has_min_tokens("text", 2))
        .select("doc_id", T.word_bigrams("text").alias("grams"))
        .persist()
    )
    bench = (
        g.filter(F.col("doc_id") % 20 == 0)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    train = g.filter(F.col("doc_id") % 20 != 0).select(
        "doc_id", F.size("grams").alias("n_grams"), F.explode("grams").alias("gram")
    )
    contaminated = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "n_grams")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.round(F.col("n_hit") * 1.0 / F.col("n_grams"), 4) >= 0.5)
        .select("doc_id")
    )
    train_docs = q.filter(F.col("doc_id") % 20 != 0).select("doc_id")
    clean = train_docs.join(contaminated, "doc_id", "left_anti")

    def stage(n, name, df):
        return df.agg(
            F.lit(n).alias("stage"),
            F.lit(name).alias("name"),
            F.count(F.lit(1)).alias("n_docs"),
        )

    return (
        stage(1, "raw", d)
        .unionAll(stage(2, "exact_dedup", uniq))
        .unionAll(stage(3, "quality_pass", q))
        .unionAll(stage(4, "train_split", train_docs))
        .unionAll(stage(5, "decontaminated", clean))
    )


# ---------------------------------------------------------------------------
# Retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "hash", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_term_sql(term: str) -> str:
    tf = f"len(list_filter(words, x -> x = '{term}'))"
    idf = (
        f"LN(1 + (st.n_docs - df.df_{term} + 0.5) / (df.df_{term} + 0.5))"
    )
    return (
        f"{idf} * ({tf} * ({_BM25_K1} + 1)) / "
        f"({tf} + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / st.avgdl))"
    )


@register(
    "doc_bm25_search",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
d AS (SELECT doc_id, words, len(words) AS dl FROM w),
st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d),
df AS (SELECT
  SUM(CASE WHEN list_contains(words, 'spark') THEN 1 ELSE 0 END) AS df_spark,
  SUM(CASE WHEN list_contains(words, 'hash')  THEN 1 ELSE 0 END) AS df_hash,
  SUM(CASE WHEN list_contains(words, 'merge') THEN 1 ELSE 0 END) AS df_merge
  FROM d)
SELECT doc_id,
       ROUND({_bm25_term_sql("spark")} + {_bm25_term_sql("hash")}
             + {_bm25_term_sql("merge")}, 4) AS score
FROM d, st, df
WHERE list_contains(words, 'spark') OR list_contains(words, 'hash')
   OR list_contains(words, 'merge')
ORDER BY score DESC, doc_id
LIMIT 20
""",
    tags=("text", "search"),
)
def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search over the corpus for a fixed query
    ('spark hash merge'): Okapi BM25 with k1=1.2, b=0.75, Lucene-style
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); top-20 docs.

    Scale shape: corpus stats (N, avgdl, per-term df) are ONE partial
    aggregation producing a single row, broadcast back via cross join;
    per-doc term frequencies are higher-order array functions (JVM
    codegen, no explode, no UDF); the top-20 is TakeOrderedAndProject.
    Total cost: two scans of the corpus, zero wide shuffles. A real
    search engine would maintain an inverted index (see doc_span_dedup
    for the postings shape); this is the scoring semantics on top."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("words")
    )
    d = d.withColumn("dl", F.size("words"))

    def has(term: str):
        return F.array_contains("words", term)

    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(has(t), 1).otherwise(0)).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )

    def term_score(term: str):
        tf = F.size(F.filter("words", lambda x: x == term)).cast("double")
        idf = F.log(
            1
            + (F.col("n_docs") - F.col(f"df_{term}") + 0.5)
            / (F.col(f"df_{term}") + 0.5)
        )
        return (idf * (tf * (_BM25_K1 + 1))) / (
            tf
            + _BM25_K1
            * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )

    scored = (
        d.crossJoin(F.broadcast(stats))
        .filter(has("spark") | has("hash") | has("merge"))
        .select(
            "doc_id",
            F.round(sum(term_score(t) for t in _BM25_TERMS), 4).alias(
                "score"
            ),
        )
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(20)


@register("doc_bpe_vocab", oracle=None, tags=("text", "tokenizer", "ml"))
def doc_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training on the corpus
    (operators/bpe.train_bpe): 30 merge rounds, each one pair-count
    shuffle over the distinct-word histogram plus a JVM-side fold that
    rewrites symbol arrays — the vocabulary-building step an LLM
    pipeline runs before token counting and sequence packing. Returns
    the ordered merge table. Rows-only (iterative; no SQL
    equivalent); exact equality with the sequential reference
    algorithm is pinned in tests/test_properties.py."""
    from ..operators.bpe import train_bpe

    merges, _ = train_bpe(_docs(spark, sf_dir), n_merges=30)
    rows = [
        (i + 1, a, b, a + b, int(cnt)) for i, (a, b, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank INT, left STRING, right STRING, merged STRING, pair_count BIGINT"
    )


# ---------------------------------------------------------------------------
# Embedding-space curation / ML
# ---------------------------------------------------------------------------


@register("sem_dedup", oracle=None, tags=("dedup", "similarity", "ml"))
def sem_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic near-duplicate removal
    (operators/dedup.semantic_dedup): KMeans-partition the embedding
    space, in-cell cosine detection, one kept representative per
    duplicate component — catches paraphrase duplicates that
    MinHash/SimHash (lexical) can never see. The 0.4 threshold matches
    dedup_embedding_pairs' near-dup band for this fixture corpus
    (production SemDeDup uses ~0.95 on real encoder embeddings).
    Rows-only (KMeans assignment isn't SQL-expressible); precision,
    keeper consistency, and recall vs the brute-force baseline gated
    in tests/test_dedup.py."""
    from ..operators.dedup import semantic_dedup

    e = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(e, threshold=0.4).orderBy("vec_id")


@register("ml_quality_classifier", oracle=None, tags=("ml", "text", "eager-io"))
def ml_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FastText-style quality classifier as an MLlib pipeline — the
    heuristic-distillation step LLM data pipelines run (FineWeb/DataComp
    style): the doc_quality heuristic labels a training split
    ('keep' = quality >= 0.67, the corpus median), and a fast model —
    hashed bag-of-words (HashingTF→IDF) + handcrafted stat features
    (length ratio, distinct-token ratio) → logistic regression — learns
    to reproduce the keep decision so it can be applied to corpora
    where the teacher signal is unavailable or too slow.

    Trained distributed (LBFGS over partitioned gradients, no
    driver-side data); deterministic doc_id%5 holdout. Returns per-
    (label, prediction) confusion counts. Rows-only (iterative
    optimizer); the holdout-accuracy floor is gated in
    tests/test_ml.py."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import (
        IDF,
        HashingTF,
        Tokenizer,
        VectorAssembler,
    )

    words = F.split("text", " ")
    quality = 0.5 * F.least(F.lit(1.0), F.size(words) / 50.0) + 0.5 * (
        F.size(F.array_distinct(words)) / F.size(words)
    )
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "text",
        F.least(F.lit(1.0), F.size(words) / 50.0).alias("len_ratio"),
        (F.size(F.array_distinct(words)) / F.size(words)).alias(
            "distinct_ratio"
        ),
        (quality >= 0.67).cast("double").alias("label"),
    )
    train = d.filter(F.col("doc_id") % 5 != 0)
    test = d.filter(F.col("doc_id") % 5 == 0)
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="words"),
            HashingTF(inputCol="words", outputCol="tf", numFeatures=1024),
            IDF(inputCol="tf", outputCol="tfidf"),
            VectorAssembler(
                inputCols=["tfidf", "len_ratio", "distinct_ratio"],
                outputCol="features",
            ),
            LogisticRegression(maxIter=100, regParam=0.001),
        ]
    )
    model = pipe.fit(train)
    # Persist + reload before scoring: the LR training summary pins the
    # fitting session (ObservationManager) into the model and
    # LogisticRegressionModel.copy() PRESERVES it (unlike RF, so the
    # ml/anomaly._strip_summary copy() trick does not work here); a
    # loaded model carries no summary, and the roundtrip is the
    # artifact contract a production scorer uses anyway.
    from ..sources.scratch import scratch_dir

    from pyspark.ml import PipelineModel

    mpath = scratch_dir(prefix="rtpmdp_qclf_") + "/model"
    model.write().overwrite().save(mpath)
    pred = PipelineModel.load(mpath).transform(test)
    return (
        pred.groupBy("label", "prediction")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "prediction")
    )


# ---------------------------------------------------------------------------
# Time-series preparation
# ---------------------------------------------------------------------------


@register(
    "ts_interpolate_linear",
    oracle="""
WITH obs AS (
  SELECT event_type AS key,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket_e,
         AVG(ROUND(value * 100)) AS obs_cents
  FROM events GROUP BY 1, 2
),
spans AS (SELECT key, MIN(bucket_e) AS lo, MAX(bucket_e) AS hi FROM obs GROUP BY key),
grid AS (SELECT key, UNNEST(range(lo, hi + 1, 3600)) AS bucket_e FROM spans),
j AS (
  SELECT g.key, g.bucket_e, o.obs_cents,
         last_value(o.obs_cents IGNORE NULLS) OVER back AS prev_v,
         last_value(CASE WHEN o.obs_cents IS NOT NULL THEN g.bucket_e END IGNORE NULLS)
           OVER back AS prev_e,
         first_value(o.obs_cents IGNORE NULLS) OVER fwd AS next_v,
         first_value(CASE WHEN o.obs_cents IS NOT NULL THEN g.bucket_e END IGNORE NULLS)
           OVER fwd AS next_e
  FROM grid g LEFT JOIN obs o USING (key, bucket_e)
  WINDOW back AS (PARTITION BY g.key ORDER BY g.bucket_e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fwd AS (PARTITION BY g.key ORDER BY g.bucket_e
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT key,
       STRFTIME(to_timestamp(bucket_e), '%Y-%m-%d %H:%M:%S') AS bucket_s,
       obs_cents / 100 AS obs_avg,
       CASE WHEN obs_cents IS NOT NULL THEN obs_cents
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
              prev_v + (next_v - prev_v)
                     * ((bucket_e - prev_e) * 1.0 / (next_e - prev_e))
       END / 100 AS filled_avg,
       obs_cents IS NULL AS is_gap
FROM j
""",
    tags=("timeseries", "window"),
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly regularization with LINEAR interpolation across gaps
    (operators/timeseries.resample_interpolate) — the staircase-free
    fill for drifting sensor series; edge buckets with no bracketing
    pair stay null. Bucket means are exact-integer-cents doubles, the
    interpolation is one deterministic FP expression on both engines."""
    from ..operators.timeseries import resample_interpolate

    ev = _t(spark, sf_dir, "events").withColumn(
        "value_cents", F.round(F.col("value") * 100)
    )
    out = resample_interpolate(
        ev, key_col="event_type", ts_col="ts",
        value_col="value_cents", step_seconds=3600,
    )
    return out.select(
        "key",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_s"),
        (F.col("obs_avg") / 100).alias("obs_avg"),
        (F.col("filled_avg") / 100).alias("filled_avg"),
        "is_gap",
    )


@register(
    "ts_cusum_changepoint",
    oracle="""
WITH b AS (
  SELECT event_type AS key,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket_e,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
k AS (SELECT key, COUNT(*) AS n_buckets, CAST(SUM(cents) AS BIGINT) AS total_cents
      FROM b GROUP BY key),
s AS (
  SELECT b.key, b.bucket_e, k.n_buckets,
         k.n_buckets * SUM(b.cents) OVER (PARTITION BY b.key ORDER BY b.bucket_e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - ROW_NUMBER() OVER (PARTITION BY b.key ORDER BY b.bucket_e)
             * k.total_cents AS s_scaled
  FROM b JOIN k USING (key)
),
r AS (
  SELECT key, n_buckets, bucket_e, s_scaled,
         ROW_NUMBER() OVER (PARTITION BY key
                            ORDER BY ABS(s_scaled) DESC, bucket_e) AS rn
  FROM s
)
SELECT key, n_buckets,
       STRFTIME(to_timestamp(bucket_e), '%Y-%m-%d %H:%M:%S') AS cp_bucket_s,
       CAST(s_scaled AS BIGINT) AS cusum_scaled,
       CASE WHEN s_scaled >= 0 THEN 1 ELSE -1 END AS direction
FROM r WHERE rn = 1
""",
    tags=("timeseries", "window"),
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per key (binary-segmentation first
    split): the hour where the cumulative deviation of hourly load from
    the key's overall mean peaks — a level-shift locator for drifting
    machines. Computed in EXACT integer arithmetic: with hourly cent
    sums c_i and T = Σc_i over n buckets, the scaled statistic
    S'_t = n·Σ_{i≤t} c_i − t·T equals n·Σ(c_i − T/n), so the argmax of
    |S'| is the classic CUSUM changepoint with zero FP divergence
    (running sums of doubles associate differently across engines;
    integer sums cannot).

    Scale shape: bucket agg + two window passes, all shuffled once on
    the key; the argmax is a WindowGroupLimit rank-1, no global sort."""
    from ..functions.timeutil import epoch_bucket

    ev = _t(spark, sf_dir, "events")
    b = (
        ev.select(
            F.col("event_type").alias("key"),
            epoch_bucket(F.col("ts"), 3600).alias("bucket_e"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("key", "bucket_e")
        .agg(F.sum("cents").alias("cents"))
    )
    k = b.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("cents").alias("total_cents"),
    )
    w = Window.partitionBy("key").orderBy("bucket_e")
    s = b.join(k, "key").select(
        "key",
        "n_buckets",
        "bucket_e",
        (
            F.col("n_buckets")
            * F.sum("cents").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.row_number().over(w) * F.col("total_cents")
        ).alias("s_scaled"),
    )
    rn = F.row_number().over(
        Window.partitionBy("key").orderBy(F.abs("s_scaled").desc(), "bucket_e")
    )
    return (
        s.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "key",
            "n_buckets",
            F.date_format(
                F.timestamp_seconds("bucket_e"), "yyyy-MM-dd HH:mm:ss"
            ).alias("cp_bucket_s"),
            "s_scaled",
            F.when(F.col("s_scaled") >= 0, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("direction"),
        )
        .withColumnRenamed("s_scaled", "cusum_scaled")
    )


@register("ml_als_recommend", oracle=None, tags=("ml",))
def ml_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS collaborative filtering over implicit purchase history
    (customer × part counts from orders⋈lineitem) — the matrix-
    factorization surface of MLlib (block-partitioned alternating
    least squares; factors never leave the cluster). Top-3 part
    recommendations for the 20 lowest-numbered customers; seeded, so
    the output is stable run to run. Rows-only (iterative solver);
    contract (exactly 3 recs/user, descending scores, valid part ids)
    gated in tests/test_ml.py."""
    from pyspark.ml.recommendation import ALS

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ratings = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
    )
    als = ALS(
        rank=8,
        maxIter=5,
        seed=42,
        implicitPrefs=True,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
    )
    from ..ml.fitguard import fit_nonempty

    model = fit_nonempty(als, ratings, "ml_als_recommend")
    users = ratings.select("user").distinct().orderBy("user").limit(20)
    recs = model.recommendForUserSubset(users, 3)
    return recs.select(
        "user",
        F.posexplode("recommendations").alias("rnk", "rec"),
    ).select(
        "user",
        (F.col("rnk") + 1).alias("rnk"),
        F.col("rec.item").alias("part"),
        F.round(F.col("rec.rating"), 6).alias("score"),
    )


@register("ml_survival_aft", oracle=None, tags=("ml", "timeseries"))
def ml_survival_aft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining-useful-life modeling with Accelerated Failure Time
    survival regression — the model class predictive maintenance
    actually deploys (time-to-failure with right-censoring: machines
    that have not failed yet are information, not missing data;
    a plain regressor cannot use them).

    Training is point-in-time: the observation horizon is 24 h after
    each machine's first event (the "as of" cut every production RUL
    model trains at). Failures before the horizon are observed
    events (label = hours to failure); machines whose first failure
    falls after the horizon are right-censored at it — included with
    censor=0, exactly the rows a naive regressor would have to throw
    away. Features: activity rate and mean reading, computed ONLY
    from events inside each machine's own observation window
    (strictly before the failure for observed machines, up to the
    horizon for censored ones) — the label's information is never
    visible to the features. MLlib AFT fits a
    Weibull model distributed (iterative L-BFGS over partitioned
    gradients). Output: per-machine predicted median time-to-failure
    for the 15 lowest ids. Rows-only (iterative solver); fit sanity
    and the presence of BOTH censored and observed classes gated in
    tests/test_ml.py."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array
    from pyspark.ml.regression import AFTSurvivalRegression

    from ..functions.timeutil import epoch_us

    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(
        # A row with no machine id or no timestamp cannot be placed on
        # any machine's timeline; a null label/feature row would kill
        # the AFT solver. Pushable scan predicates.
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    # Point-in-time features: every per-machine aggregate below is
    # restricted to the rows a model trained "as of" the label time
    # could have seen — strictly before the failure for observed
    # machines, up to the 24 h horizon for censored ones. Computing
    # t0/t_err as window minima first (one shuffle on user_id, which
    # the groupBy then reuses) lets the feature aggregates condition
    # each event row on its own machine's observation end.
    w = Window.partitionBy("user_id")
    rows = ev.select(
        "user_id",
        epoch_us(F.col("ts")).alias("ts_us"),
        (F.col("event_type") == "error").alias("is_err"),
        F.round(F.col("value") * 100).alias("cents"),
    ).select(
        "*",
        F.min("ts_us").over(w).alias("t0"),
        F.min(F.when(F.col("is_err"), F.col("ts_us"))).over(w).alias("t_err"),
    )
    cutoff = F.col("t0") + F.lit(24 * 3.6e9)  # 24 h in microseconds
    observed = F.col("t_err").isNotNull() & (F.col("t_err") <= cutoff)
    # Observation window end: the label time. Features use ts < t_err
    # for failed machines (the failure event itself is the label, not
    # a feature) and ts <= cutoff for censored ones.
    in_obs = F.when(
        observed, F.col("ts_us") < F.col("t_err")
    ).otherwise(F.col("ts_us") <= cutoff)
    per = rows.groupBy("user_id").agg(
        F.min("t0").alias("t0"),
        F.min("t_err").alias("t_err"),
        F.count(F.when(in_obs, 1)).alias("n_obs"),
        F.max(F.when(in_obs, F.col("ts_us"))).alias("t_end_obs"),
        F.avg(F.when(in_obs, F.col("cents"))).alias("avg_cents_obs"),
    )
    cutoff = F.col("t0") + F.lit(24 * 3.6e9)
    observed = F.col("t_err").isNotNull() & (F.col("t_err") <= cutoff)
    data = per.select(
        "user_id",
        # 1-second floor: AFT requires label > 0, but a machine whose
        # FIRST event is the failure is the most informative RUL
        # sample — flooring keeps it in training instead of silently
        # dropping it
        F.greatest(
            (
                F.when(observed, F.col("t_err")).otherwise(cutoff)
                - F.col("t0")
            )
            / 3.6e9,
            F.lit(1.0 / 3600.0),
        ).alias("label_h"),
        observed.cast("double").alias("censor"),
        # A machine whose first event IS the failure has an empty
        # feature window: rate 0, mean reading 0 — deterministic
        # "no information yet" encoding, not a dropped row.
        (
            F.col("n_obs")
            / (
                (F.coalesce(F.col("t_end_obs"), F.col("t0")) - F.col("t0"))
                / 3.6e9
                + F.lit(1.0)
            )
        ).alias("rate"),
        (F.coalesce(F.col("avg_cents_obs"), F.lit(0.0)) / 100).alias(
            "avg_val"
        ),
    )
    feats = VectorAssembler(
        inputCols=["rate", "avg_val"], outputCol="features"
    ).transform(data)
    aft = AFTSurvivalRegression(
        labelCol="label_h",
        censorCol="censor",  # 1.0 = event observed, 0.0 = censored
        quantileProbabilities=[0.5],
        quantilesCol="q",
    )
    from ..ml.fitguard import fit_nonempty

    model = fit_nonempty(aft, feats, "ml_survival_aft")
    pred = model.transform(feats)
    return (
        pred.orderBy("user_id")
        .limit(15)
        .select(
            "user_id",
            F.round("label_h", 4).alias("observed_h"),
            F.col("censor").cast("int").alias("failed"),
            F.round(
                F.element_at(vector_to_array("q"), 1), 4
            ).alias("median_ttf_h"),
        )
    )


@register(
    "rel_incremental_agg_refresh",
    oracle="""
SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year, o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders GROUP BY 1, 2
""",
    tags=("analytics", "incremental", "eager-io"),
)
def rel_incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a distributive aggregate: a
    materialized base aggregate (years < 1997) is REFRESHED by merging
    only the delta partition's aggregate (years >= 1997) — re-aggregate
    of partial aggregates, never a rescan of the base data. The oracle
    is the full recompute: the IVM identity says they must match
    exactly (COUNT and integer-cents SUM are distributive, so
    partial-merge is lossless at any split point — the foundation of
    every incremental lakehouse pipeline).

    Scale note: at 100 TB the base aggregate is orders of magnitude
    smaller than the fact table; the daily refresh touches only the
    new partition plus the compact aggregate state."""
    from ..sources.scratch import scratch_dir

    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("order_year"),
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    def agg(df):
        return df.groupBy("order_year", "o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total_cents"),
        )

    base_path = scratch_dir(prefix="rtpmdp_ivm_") + "/base_agg"
    agg(o.filter(F.col("order_year") < 1997)).write.parquet(base_path)
    base = spark.read.parquet(base_path)
    delta = agg(o.filter(F.col("order_year") >= 1997))
    return (
        base.unionByName(delta)
        .groupBy("order_year", "o_orderpriority")
        .agg(
            F.sum("n").alias("n"),
            F.sum("total_cents").alias("total_cents"),
        )
    )


@register("emb_pca_whitening", oracle=None, tags=("ml", "similarity"))
def emb_pca_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA whitening of the embedding corpus — the standard retrieval
    post-processing (Jégou & Chum: whitening + re-normalization fixes
    the anisotropy of raw encoder embeddings) and the dimensionality-
    reduction step before IVF/PQ indexing at scale.

    MLlib PCA (distributed covariance via treeAggregate) fits k=16
    components; each vector is projected and per-component variances of
    the projection are reported (descending — the scree curve). The
    projection itself is a broadcast matrix multiply (components ship
    in the model, no shuffle of the corpus). Rows-only (eigensolver);
    orthogonality/variance-ordering gated in tests/test_similarity.py."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    from ..functions.vectors import as_double

    # Null embeddings crash the covariance pass deep inside MLlib;
    # exclude them with a pushable predicate (ANN entry-point policy).
    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id", array_to_vector(as_double("embedding")).alias("features")
        )
    )
    from ..ml.fitguard import fit_nonempty

    model = fit_nonempty(
        PCA(k=16, inputCol="features", outputCol="proj"),
        e,
        "emb_pca_whitening",
        min_rows=2,  # RowMatrix.computeCovariance requires > 1 row
    )
    proj = model.transform(e).select(
        F.posexplode(vector_to_array("proj")).alias("component", "v")
    )
    return (
        proj.groupBy("component")
        .agg(
            F.round(F.var_samp("v"), 6).alias("variance"),
            F.round(F.avg("v"), 6).alias("mean"),
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Event-sequence analytics
# ---------------------------------------------------------------------------


@register(
    "events_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
t AS (SELECT prev_type, event_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, event_type, n,
       n * 1.0 / SUM(n) OVER (PARTITION BY prev_type) AS p
FROM t
""",
    tags=("events", "window"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the behavioral fingerprint (what follows what, with
    what probability) that feeds next-event prediction and anomaly
    scoring on clickstreams.

    Scale shape: one window pass partitioned on user_id (the natural
    high-cardinality key — no skew), then a tiny
    (|event_types|²)-cardinality aggregation; probabilities are exact
    integer ratios so both engines produce identical doubles."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    t = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "event_type",
        "n",
        (F.col("n") * 1.0 / F.sum("n").over(wp)).alias("p"),
    )


@register(
    "events_top_paths",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type, 1) OVER w AS p1,
         LAG(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT p2 || '>' || p1 || '>' || event_type AS path, COUNT(*) AS n
FROM seq WHERE p2 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT 20
""",
    tags=("events", "window"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event trigram paths across all users — the sequential-
    pattern-mining lite that surfaces dominant user journeys (and, in
    the maintenance domain, recurring fault cascades like
    reading>warning>error). One window pass partitioned on user_id,
    a path-key aggregation with map-side combine, TakeOrdered top-20."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    return (
        seq.select(
            # F.concat (not concat_ws): propagates NULLs exactly like the
            # oracle's || operator, so a NULL event_type can never yield
            # a silently-truncated path on one engine only
            F.concat(
                F.col("p2"), F.lit(">"), F.col("p1"), F.lit(">"),
                F.col("event_type"),
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


@register(
    "ts_seasonal_hour_profile",
    oracle="""
WITH c AS (
  SELECT event_type AS key, EXTRACT(HOUR FROM ts) AS hh,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
h AS (SELECT key, hh, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sc
      FROM c GROUP BY 1, 2),
k AS (SELECT key, CAST(SUM(sc) AS BIGINT) AS tot_c, CAST(SUM(n) AS BIGINT) AS tot_n
      FROM h GROUP BY key)
SELECT h.key, h.hh, h.n,
       h.sc * 1.0 / h.n / 100 AS hour_avg,
       h.sc * 1.0 / h.n / 100 - k.tot_c * 1.0 / k.tot_n / 100 AS seasonal_dev
FROM h JOIN k USING (key)
""",
    tags=("timeseries", "events"),
)
def ts_seasonal_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type: mean reading per
    hour slot and its deviation from the type's overall mean — the
    seasonal-naive baseline a forecasting pipeline subtracts before
    modeling residuals. All ratios are exact-integer-cents divisions
    (deterministic doubles on both engines, registry convention).

    Scale shape: 24×|event_types| output — the per-(key, hour) partial
    aggregation combines map-side, and the profile join is a broadcast
    of the tiny per-key totals."""
    ev = _t(spark, sf_dir, "events")
    c = ev.select(
        F.col("event_type").alias("key"),
        F.hour("ts").cast("bigint").alias("hh"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    h = c.groupBy("key", "hh").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sc")
    )
    k = h.groupBy("key").agg(
        F.sum("sc").alias("tot_c"), F.sum("n").alias("tot_n")
    )
    return h.join(F.broadcast(k), "key").select(
        "key",
        "hh",
        "n",
        (F.col("sc") * 1.0 / F.col("n") / 100).alias("hour_avg"),
        (
            F.col("sc") * 1.0 / F.col("n") / 100
            - F.col("tot_c") * 1.0 / F.col("tot_n") / 100
        ).alias("seasonal_dev"),
    )


@register(
    "events_rolling_active_users",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
contrib AS (
  SELECT user_id, d + CAST(o AS INTEGER) AS win_d, o
  FROM ud CROSS JOIN UNNEST(range(0, 7)) AS t(o)
),
days AS (SELECT DISTINCT d FROM ud)
SELECT STRFTIME(days.d, '%Y-%m-%d') AS day_s,
       COUNT(DISTINCT CASE WHEN c.o = 0 THEN c.user_id END) AS dau,
       COUNT(DISTINCT c.user_id) AS wau
FROM days JOIN contrib c ON c.win_d = days.d
GROUP BY days.d
""",
    tags=("events", "window"),
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU per day — the rolling-distinct metric
    SQL windows cannot express (COUNT(DISTINCT) over a RANGE frame is
    unsupported in both engines). The scalable formulation is a
    map-side CONTRIBUTION EXPANSION: each (user, active-day) emits one
    row for every window day it contributes to (7× amplification,
    narrow rows), then one distinct-aggregation per day — no self-join
    of the event table against itself, no per-day re-scan; at 100 TB
    the amplification factor is the window length, constant, and the
    shuffle key (day) is low-cardinality but the pre-aggregated
    (user, day) distinct set it carries is already deduplicated
    map-side."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    contrib = ud.select(
        "user_id",
        "d",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
    ).select(
        "user_id", F.date_add("d", F.col("o")).alias("win_d"), "o"
    )
    days = ud.select("d").distinct()
    return (
        days.join(contrib, days.d == contrib.win_d)
        .groupBy("d")
        .agg(
            F.countDistinct(
                F.when(F.col("o") == 0, F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
        )
        .select(F.date_format("d", "yyyy-MM-dd").alias("day_s"), "dau", "wau")
    )


@register(
    "rel_pareto_cumshare",
    oracle="""
WITH p AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM lineitem GROUP BY l_partkey
),
t AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS total FROM p),
r AS (
  SELECT l_partkey, rev_cents,
         CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey) AS BIGINT)
           AS cum_cents,
         ROW_NUMBER() OVER (ORDER BY rev_cents DESC, l_partkey) AS rnk
  FROM p
)
SELECT r.rnk, r.l_partkey, r.rev_cents,
       r.cum_cents * 1.0 / t.total AS cum_share
FROM r, t
WHERE r.cum_cents * 1.0 / t.total <= 0.2 OR r.rnk <= 10
""",
    tags=("analytics", "window"),
)
def rel_pareto_cumshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration analysis: parts ranked by revenue with
    cumulative revenue share — 'which SKUs make up the first 20 % of
    revenue' (plus a guaranteed top-10 floor so the result is never
    empty). Exact-integer-cents cumulative sums keep the running
    share deterministic across engines.

    Scale note: the global ORDER BY in the window is the honest cost
    of an exact Pareto curve; the part-level pre-aggregation shrinks
    the sorted relation to |parts| rows (≪ lineitem), so the sort is
    over the dimension cardinality, not the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    p = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "rev_cents"
        )
    )
    t = p.agg(F.sum("rev_cents").alias("total"))
    w = Window.orderBy(F.desc("rev_cents"), "l_partkey")
    r = p.select(
        "l_partkey",
        "rev_cents",
        F.sum("rev_cents")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_cents"),
        F.row_number().over(w).alias("rnk"),
    )
    share = F.col("cum_cents") * 1.0 / F.col("total")
    return (
        r.crossJoin(F.broadcast(t))
        .filter((share <= 0.2) | (F.col("rnk") <= 10))
        .select("rnk", "l_partkey", "rev_cents", share.alias("cum_share"))
    )


@register(
    "ts_stl_decompose",
    oracle="""
WITH obs AS (
  SELECT event_type AS key,
         CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket_e,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
spans AS (SELECT key, MIN(bucket_e) AS lo, MAX(bucket_e) AS hi FROM obs GROUP BY key),
b AS (
  SELECT g.key, g.bucket_e, COALESCE(o.x, 0) AS x
  FROM (SELECT key, UNNEST(range(lo, hi + 1, 3600)) AS bucket_e FROM spans) g
  LEFT JOIN obs o USING (key, bucket_e)
),
t AS (
  SELECT key, bucket_e, x,
         AVG(x) OVER (PARTITION BY key ORDER BY bucket_e
                      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS trend
  FROM b
),
d AS (SELECT key, bucket_e, x, trend, x - trend AS detr,
             (bucket_e % 86400) // 3600 AS hh
      FROM t),
s AS (
  SELECT key, hh,
         list_reduce(list_prepend(0.0, list(detr ORDER BY detr)),
                     (a, v) -> a + v) / COUNT(*) AS seasonal
  FROM d GROUP BY key, hh
)
SELECT d.key,
       STRFTIME(to_timestamp(d.bucket_e), '%Y-%m-%d %H:%M:%S') AS bucket_s,
       d.x, d.trend, s.seasonal,
       d.detr - s.seasonal AS residual
FROM d JOIN s USING (key, hh)
""",
    tags=("timeseries", "window"),
)
def ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite additive decomposition of the hourly load series per
    event type: trend (centered ±12 h moving average), seasonal
    (hour-of-day mean of the detrended series), residual — the
    model-ready split a forecasting/anomaly pipeline starts from.

    FP discipline end to end: the series is exact integer cents, the
    moving average is integral-exact under any summation association,
    and the seasonal mean folds a VALUE-SORTED list sequentially
    (functions/timeutil.ordered_fold_sum) — every emitted double is
    bit-identical across engines, so no rounding is needed or applied.
    Hour-of-day comes from epoch arithmetic (bucket_e % 86400), never
    a session-timezone-dependent HOUR().

    Scale shape: bucket agg + one window pass + a (key, 24)-cardinality
    seasonal agg broadcast back — all shuffles on the key."""
    from ..functions.timeutil import epoch_bucket, ordered_fold_sum

    ev = _t(spark, sf_dir, "events")
    obs = (
        ev.select(
            F.col("event_type").alias("key"),
            epoch_bucket(F.col("ts"), 3600).alias("bucket_e"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("key", "bucket_e")
        .agg(F.sum("cents").alias("x"))
    )
    # dense per-key hourly grid with zero-load fill: without it the
    # ROWS frame would stitch across multi-hour gaps and the seasonal
    # means would silently exclude idle hours
    spans = obs.groupBy("key").agg(
        F.min("bucket_e").alias("lo"), F.max("bucket_e").alias("hi")
    )
    grid = spans.select(
        "key", F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("bucket_e")
    )
    b = grid.join(obs, ["key", "bucket_e"], "left").select(
        "key", "bucket_e", F.coalesce("x", F.lit(0)).alias("x")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_e")
        .rowsBetween(-12, 12)
    )
    d = b.select(
        "key",
        "bucket_e",
        "x",
        F.avg("x").over(w).alias("trend"),
    ).withColumns(
        {
            "detr": F.col("x") - F.col("trend"),
            # integer-exact: bucket_e is a multiple of 3600, so the
            # quotient needs no FP detour
            "hh": ((F.col("bucket_e") % 86400) / 3600).cast("long"),
        }
    )
    s = d.groupBy("key", "hh").agg(
        (ordered_fold_sum(F.collect_list("detr")) / F.count(F.lit(1))).alias(
            "seasonal"
        )
    )
    return d.join(F.broadcast(s), ["key", "hh"]).select(
        "key",
        F.date_format(
            F.timestamp_seconds("bucket_e"), "yyyy-MM-dd HH:mm:ss"
        ).alias("bucket_s"),
        "x",
        "trend",
        "seasonal",
        (F.col("detr") - F.col("seasonal")).alias("residual"),
    )


@register(
    "ts_mtbf_stats",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ep_us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_us
  FROM events WHERE event_type = 'error'
),
g AS (
  SELECT user_id, ep_us - prev_us AS gap_us
  FROM e WHERE prev_us IS NOT NULL
)
SELECT user_id, COUNT(*) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) * 1.0 / COUNT(*) / 1000000 AS mtbf_s,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       quantile_cont(gap_us, 0.5) AS median_gap_us
FROM g GROUP BY user_id HAVING COUNT(*) >= 3
""",
    tags=("timeseries", "events"),
)
def ts_mtbf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean time between failures per machine — THE predictive-
    maintenance KPI (the reference's alerting chain reacts to single
    anomalies; an MTBF trend is what maintenance planning consumes).
    Inter-arrival gaps of 'error' events per user: mean (exact integer
    ratio), min/max, and exact interpolated median (selection-based —
    immune to summation-order divergence).

    One window pass partitioned on the entity key, one aggregation on
    the same key — the exchange is reused."""
    from ..functions.timeutil import epoch_us

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id",
        epoch_us(F.col("ts")).alias("ep_us"),
        F.lag(epoch_us(F.col("ts"))).over(w).alias("prev_us"),
    ).filter(F.col("prev_us").isNotNull())
    g = e.select(
        "user_id", (F.col("ep_us") - F.col("prev_us")).alias("gap_us")
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            (F.sum("gap_us") * 1.0 / F.count(F.lit(1)) / 1_000_000).alias(
                "mtbf_s"
            ),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            F.percentile("gap_us", F.lit(0.5)).alias("median_gap_us"),
        )
        .filter(F.col("n_gaps") >= 3)
    )


# ---------------------------------------------------------------------------
# Scalar-function surface additions
# ---------------------------------------------------------------------------


@register(
    "rel_regexp_funcs",
    oracle="""
SELECT event_id,
       array_to_string(regexp_extract_all(props, '[0-9]+'), ',') AS nums,
       CAST(len(regexp_extract_all(props, '[0-9]+')) AS INTEGER) AS n_nums,
       regexp_matches(props, '[0-9][0-9]') AS has_2digit,
       regexp_replace(props, '[0-9]+', '#', 'g') AS masked
FROM events WHERE event_id <= 300
""",
    tags=("functions", "string"),
)
def rel_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-expression function surface: extract-all (list), match
    count, boolean rlike, global replace — all JVM-codegen built-ins
    (never a Python UDF for pattern work)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") <= 300)
    return ev.select(
        "event_id",
        F.array_join(
            F.regexp_extract_all("props", F.lit("([0-9]+)"), 1), ","
        ).alias("nums"),
        F.size(
            F.regexp_extract_all("props", F.lit("([0-9]+)"), 1)
        ).alias("n_nums"),
        F.col("props").rlike("[0-9][0-9]").alias("has_2digit"),
        F.regexp_replace("props", "[0-9]+", "#").alias("masked"),
    )


@register(
    "rel_window_ignore_nulls",
    oracle="""
WITH v AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type <> 'error'
              THEN CAST(ROUND(value * 100) AS BIGINT) END AS cents
  FROM events WHERE user_id <= 40
)
SELECT event_id, user_id, cents,
       LAG(cents IGNORE NULLS) OVER w AS prev_valid,
       LEAD(cents IGNORE NULLS) OVER w AS next_valid,
       NTH_VALUE(cents, 2 IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_valid
FROM v
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("window", "null"),
)
def rel_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation — lag/lead/nth_value skipping
    null readings (here: error events carry no valid reading) — the
    sensor-feed idiom for 'previous/next GOOD measurement'. Exercised
    through the SQL API (PySpark's lag/lead builders don't expose the
    IGNORE NULLS modifier; the SQL surface is the engine contract)."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_win_in")
    return spark.sql("""
WITH v AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type <> 'error'
              THEN CAST(ROUND(value * 100) AS BIGINT) END AS cents
  FROM events_win_in WHERE user_id <= 40
)
SELECT event_id, user_id, cents,
       LAG(cents) IGNORE NULLS OVER w AS prev_valid,
       LEAD(cents) IGNORE NULLS OVER w AS next_valid,
       NTH_VALUE(cents, 2) IGNORE NULLS OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_valid
FROM v
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")


@register(
    "rel_changelog_apply",
    oracle="""
WITH log AS (
  SELECT o_orderkey AS k, 1 AS version, 'I' AS op,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
  UNION ALL
  SELECT o_orderkey, 2, 'U',
         CAST(ROUND(o_totalprice * 100) AS BIGINT) // 2
  FROM orders WHERE o_orderkey % 3 = 0
  UNION ALL
  SELECT o_orderkey, 3, 'D', NULL
  FROM orders WHERE o_orderkey % 7 = 0
),
latest AS (
  SELECT k, op, price_cents,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY version DESC) AS rn
  FROM log
),
snap AS (SELECT k, price_cents FROM latest WHERE rn = 1 AND op <> 'D')
SELECT COUNT(*) AS n_live,
       CAST(SUM(price_cents) AS BIGINT) AS total_cents,
       CAST(MIN(k) AS BIGINT) AS min_key,
       CAST(MAX(k) AS BIGINT) AS max_key
FROM snap
""",
    tags=("cdc", "window"),
)
def rel_changelog_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog replay: materialize the current snapshot from an
    ordered insert/update/delete log (last-writer-wins per key,
    delete tombstones drop the row) — the full Debezium-style
    changelog semantics that MERGE (upsert-only) cannot express. The
    log here is derived deterministically from orders (every key
    inserted at v1, every 3rd halved at v2, every 7th deleted at v3).

    Scale shape: ONE window pass partitioned on the key picks each
    key's latest version (WindowGroupLimit prunes to rank 1 inside
    each task — no full sort materialization), then a tombstone filter
    and a summary aggregate. Shuffle count: one exchange on the key,
    exactly like the equivalent MERGE chain but in a single pass over
    the whole log instead of one pass per batch."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    log = (
        o.select(
            "k", F.lit(1).alias("version"), F.lit("I").alias("op"),
            F.col("cents").alias("price_cents"),
        )
        .unionAll(
            o.filter(F.col("k") % 3 == 0).select(
                "k", F.lit(2), F.lit("U"),
                (F.col("cents") / 2).cast("long"),
            )
        )
        .unionAll(
            o.filter(F.col("k") % 7 == 0).select(
                "k", F.lit(3), F.lit("D"),
                F.lit(None).cast("long"),
            )
        )
    )
    w = Window.partitionBy("k").orderBy(F.desc("version"))
    snap = (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
    )
    return snap.agg(
        F.count(F.lit(1)).alias("n_live"),
        F.sum("price_cents").alias("total_cents"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )


@register(
    "rel_dq_expectations",
    oracle="""
SELECT 'orders_custkey_fk' AS rule,
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_violations,
       (SELECT COUNT(*) FROM orders) AS n_checked
UNION ALL
SELECT 'lineitem_quantity_range',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'customer_key_unique',
       (SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer),
       (SELECT COUNT(*) FROM customer)
UNION ALL
SELECT 'events_value_nonneg',
       (SELECT COUNT(*) FROM events WHERE value IS NULL OR value < 0),
       (SELECT COUNT(*) FROM events)
UNION ALL
SELECT 'orders_date_in_window',
       (SELECT COUNT(*) FROM orders
        WHERE o_orderdate < DATE '1992-01-01'
           OR o_orderdate > DATE '1998-12-31'),
       (SELECT COUNT(*) FROM orders)
""",
    tags=("quality", "analytics"),
)
def rel_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality expectation suite as one plan: five
    declarative rules — referential integrity (orders→customer),
    value-range, key uniqueness, non-negativity, date-window sanity —
    each reported as (rule, n_violations, n_checked). The DQ gate a
    lake pipeline runs before publishing a partition.

    Scale shape: each rule is a single partial-aggregating scan (the
    FK check is a broadcast LEFT ANTI count, not a row-level join
    materialization); the five 1-row results union driver-free. At
    100 TB the rules share nothing, so Spark schedules the five scans
    as independent stages."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")

    def rule(name, viol_df, total_df):
        return viol_df.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).alias("n_violations"),
        ).crossJoin(total_df.agg(F.count(F.lit(1)).alias("n_checked")))

    fk = o.join(
        F.broadcast(c.select("c_custkey")),
        o.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    qty = li.filter(
        F.col("l_quantity").isNull()
        | (F.col("l_quantity") < 1)
        | (F.col("l_quantity") > 50)
    )
    uniq = (
        c.agg(
            F.lit("customer_key_unique").alias("rule"),
            (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias(
                "n_violations"
            ),
            F.count(F.lit(1)).alias("n_checked"),
        )
    )
    val = ev.filter(F.col("value").isNull() | (F.col("value") < 0))
    dates = o.filter(
        (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
        | (F.col("o_orderdate") > F.lit("1998-12-31").cast("date"))
    )
    return (
        rule("orders_custkey_fk", fk, o)
        .unionAll(rule("lineitem_quantity_range", qty, li))
        .unionAll(uniq)
        .unionAll(rule("events_value_nonneg", val, ev))
        .unionAll(rule("orders_date_in_window", dates, o))
    )


# ---------------------------------------------------------------------------
# Lake-robustness sources
# ---------------------------------------------------------------------------


@register(
    "src_dynamic_overwrite",
    oracle="""
SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year, COUNT(*) AS n
FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) <> 1996
GROUP BY 1
UNION ALL
SELECT 1996 AS order_year, COUNT(*) AS n
FROM orders
WHERE EXTRACT(YEAR FROM o_orderdate) = 1996 AND o_orderpriority = '1-URGENT'
""",
    tags=("source", "partitioning", "eager-io"),
)
def src_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the idempotent daily-batch
    pattern: rewriting one partition's data replaces ONLY the
    partitions present in the incoming frame, leaving every other
    partition untouched (static overwrite mode would truncate the
    whole table). Here the 1996 partition is rewritten to just its
    urgent orders; the readback proves 1996 shrank and all other
    years survived byte-for-byte."""
    from ..sources.scratch import scratch_dir

    o = _t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = scratch_dir(prefix="rtpmdp_dynover_")
    o.write.mode("overwrite").partitionBy("order_year").parquet(path)
    (
        o.filter(
            (F.col("order_year") == 1996)
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("order_year")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy("order_year").agg(F.count(F.lit(1)).alias("n"))


@register(
    "src_schema_evolution",
    oracle="""
SELECT n_regionkey, COUNT(*) AS n_rows, COUNT(n_comment_len) AS n_with_extra
FROM (
  SELECT n_regionkey, NULL AS n_comment_len FROM nation WHERE n_nationkey % 2 = 0
  UNION ALL
  SELECT n_regionkey, length(n_name) AS n_comment_len FROM nation WHERE n_nationkey % 2 = 1
)
GROUP BY n_regionkey
""",
    tags=("source", "eager-io"),
)
def src_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on the lake: two parquet batches with
    different schemas (the second adds a column) land in one dataset;
    ``mergeSchema`` reads the union schema with nulls for the missing
    column in old files — the append-only evolution contract every
    long-lived ingest pipeline depends on."""
    from ..sources.scratch import scratch_dir

    n = _t(spark, sf_dir, "nation")
    path = scratch_dir(prefix="rtpmdp_evolve_")
    n.filter(F.col("n_nationkey") % 2 == 0).write.parquet(f"{path}/b=0")
    n.filter(F.col("n_nationkey") % 2 == 1).withColumn(
        "n_comment_len", F.length("n_name")
    ).write.parquet(f"{path}/b=1")
    back = spark.read.option("mergeSchema", True).parquet(
        f"{path}/b=0", f"{path}/b=1"
    )
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("n_comment_len").alias("n_with_extra"),
    )


@register(
    "src_csv_quarantine",
    oracle="""
SELECT COUNT(*) FILTER (WHERE n_nationkey % 5 <> 0) AS n_good,
       COUNT(*) FILTER (WHERE n_nationkey % 5 = 0) AS n_quarantined
FROM nation
""",
    tags=("source", "quality", "eager-io", "caches"),
)
def src_csv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record quarantine on a batch CSV ingest (the batch
    twin of the streaming JSON quarantine, O24 parity surface): rows
    whose key field fails the schema cast land in the
    ``columnNameOfCorruptRecord`` column under PERMISSIVE mode instead
    of killing the job; the pipeline splits good rows from the
    quarantine count. Every 5th row is deterministically corrupted at
    write time to exercise the path."""
    from ..sources.scratch import scratch_dir

    n = _t(spark, sf_dir, "nation")
    path = scratch_dir(prefix="rtpmdp_badcsv_")
    lines = n.select(
        F.concat_ws(
            ",",
            F.when(
                F.col("n_nationkey") % 5 == 0,
                F.concat(F.lit("X"), F.col("n_nationkey")),
            ).otherwise(F.col("n_nationkey").cast("string")),
            F.col("n_name"),
            F.col("n_regionkey").cast("string"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)
    back = (
        spark.read.schema(
            "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, _corrupt STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        # caching is the documented requirement for referencing the
        # corrupt-record column in a downstream query (Spark raises
        # otherwise: the column exists only during parsing)
        .cache()
    )
    return back.agg(
        F.count(F.when(F.col("_corrupt").isNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("_corrupt").isNotNull(), 1)).alias(
            "n_quarantined"
        ),
    )


# ---------------------------------------------------------------------------
# Graph analytics
# ---------------------------------------------------------------------------


@register(
    "graph_triangle_count",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT a.p AS u, b.p AS v
      FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
nodes AS (SELECT u AS x FROM e UNION SELECT v FROM e),
tri AS (SELECT COUNT(*) AS t
        FROM e e1 JOIN e e2 ON e1.v = e2.u
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT t FROM tri) AS n_triangles
""",
    tags=("graph",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the part co-occurrence graph (parts bought
    together in one order) — the clustering-coefficient numerator, and
    the standard benchmark for distributed graph processing on a
    relational engine.

    Spark shape is the degree-oriented algorithm (Suri & Vassilvitskii
    "Counting Triangles and the Curse of the Last Reducer"): orient
    every edge from the (degree, id)-smaller endpoint to the larger, so
    each triangle is counted exactly once AND the wedge-join fan-out is
    bounded by sqrt(m) per node even under power-law skew — the naive
    id-oriented join (which the DuckDB oracle runs; counts are
    identical by symmetry) lets one celebrity node dominate a reducer.
    Two self-joins on oriented edges, both shuffled on node keys."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    # The edge list feeds FOUR consumers (degrees, the orientation
    # join, n_edges, and — oriented — all three legs of the wedge
    # join); without materialization every branch re-ran the distinct
    # self-join pipeline (r17: measured 18 jobs / 7.5 s at sf0.1).
    # localCheckpoint (not persist) so the AQE broadcast futures of
    # the wedge join can't race on an unmaterialized cache block (the
    # r12 minhash finding). Same below for the oriented frame.
    e = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient by (deg, id): u -> v iff (deg_u, u) < (deg_v, v)
    ed = (
        e.join(deg.withColumnRenamed("x", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("deg", "dv"), "v")
    )
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
    ).localCheckpoint(eager=True)
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.t") == F.col("e2.s"))
        .join(
            e3,
            (F.col("e3.s") == F.col("e1.s")) & (F.col("e3.t") == F.col("e2.t")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    counts = e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    return counts.crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")
