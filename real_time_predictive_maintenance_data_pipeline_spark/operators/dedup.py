"""Deduplication operator family for large-scale training-data pipelines.

Five strategies, each a composition of built-in DataFrame ops (no
custom physical operators):

- ``exact_dedup``            : hash-groupBy on the full text
- ``ngram_jaccard_pairs``    : blocked exact word-set Jaccard
- ``minhash_lsh_pairs``      : MinHashLSH banding (approx Jaccard)
- ``simhash_signatures`` / ``simhash_pairs`` : 64-bit SimHash + Hamming
- embedding cosine near-dup lives in ``operators.similarity``

Scale notes (100 TB): exact dedup is one shuffle on a 256-bit digest —
group keys are hashes, not full documents, so shuffle payload is small
when callers pre-hash. Blocked Jaccard bounds the candidate set by the
blocking key's group sizes (quadratic *within* block only). MinHashLSH
shuffles on (band, bucket) — linear in corpus size — and is the
correct strategy when no natural blocking key exists. SimHash packs a
document into 8 bytes, so the pair join moves minimal data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import distinct_tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: keep min-id row per identical text.

    Groups on ``sha2(text, 256)`` so the shuffle carries a 64-char digest
    instead of arbitrarily long documents (reference docs can be MBs).
    Returns (keeper_id, n_copies).
    """
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("__digest"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keeper_id", "n_copies")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact word-set Jaccard similarity pairs within a blocking key.

    jaccard = |A ∩ B| / |A ∪ B| over distinct whitespace tokens.
    Quadratic within block — pick blocking keys so group sizes stay
    bounded (lang × length-bucket at real scale).
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, 4-dp rounded.
    """
    d = df.select(
        F.col(id_col).alias("__id"),
        F.col(block_col).alias("__blk"),
        distinct_tokens(F.col(text_col)).alias("__words"),
    )
    a = d.alias("a")
    b = d.alias("b")
    inter = F.size(F.array_intersect(F.col("a.__words"), F.col("b.__words")))
    union = F.size(F.array_union(F.col("a.__words"), F.col("b.__words")))
    jac = F.round(inter.cast("double") / union, 4)
    return (
        a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("doc_a"),
            F.col("b.__id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.9,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Approximate Jaccard near-dup pairs via MinHashLSH banding.

    word set → binary HashingTF vector → MinHash signatures →
    ``approxSimilarityJoin`` at distance 1 - threshold. Linear-time
    candidate generation (shuffle on hash buckets), the scale path when
    no blocking key bounds the corpus.
    Returns (doc_a, doc_b, jaccard_dist) with doc_a < doc_b.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = df.select(
        F.col(id_col).alias("id"), distinct_tokens(F.col(text_col)).alias("words")
    ).filter(F.size("words") > 0)
    tf = HashingTF(
        inputCol="words", outputCol="features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(d)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, 1.0 - jaccard_threshold, distCol="jaccard_dist"
    )
    return (
        pairs.select(
            F.col("datasetA.id").alias("doc_a"),
            F.col("datasetB.id").alias("doc_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document, as one JVM-side expression.

    Each distinct token hashes to 64 bits (xxhash64); bit *i* of the
    signature is the sign of Σ over tokens of (±1 per token bit *i*).
    Pure higher-order expressions — no explode, no shuffle, no UDF.
    Returns (id_col, simhash: long).
    """
    # F.shiftright/shiftleft only take literal shift amounts in the
    # Python API; call_function reaches the SQL builtins, which accept a
    # column-valued shift (needed inside the per-bit lambdas).
    shr = lambda h, i: F.call_function("shiftright", h, i)  # noqa: E731
    shl = lambda h, i: F.call_function("shiftleft", h, i)  # noqa: E731

    words = distinct_tokens(F.col(text_col))
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    # For each bit position, majority vote across token hashes.
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(shr(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        ),
    )
    sig = F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(63)),
            lambda v, i: F.when(v > 0, shl(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    return df.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    block_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance within a block.

    The join moves only (id, block, 8-byte signature) — at corpus scale
    the candidate join is tiny even when the corpus is not. A banded
    (4×16-bit chunk) equi-join variant drops the block requirement; the
    chunk trick is left to the LSH path which covers that need.
    Returns (doc_a, doc_b, hamming).
    """
    sigs = simhash_signatures(df, text_col, id_col).join(
        df.select(F.col(id_col), F.col(block_col).alias("__blk")), id_col
    )
    a = sigs.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"), "__blk"
    )
    b = sigs.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"), "__blk"
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["__blk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
