"""Distributed byte-pair-encoding (BPE) tokenizer training.

The classic vocab-building step of an LLM data pipeline (Sennrich et
al. 2016; GPT-2's byte-level variant), expressed as an iterative
DataFrame computation: each round counts adjacent symbol pairs across
the corpus (one map-side-combined shuffle on the pair key), picks the
most frequent pair (deterministic tie-break: count desc, then pair
lexicographically), and rewrites every word's symbol array with the
merged token (a JVM-side ``aggregate`` fold — left-to-right, exactly
like the sequential reference algorithm, so overlapping occurrences
such as 'a a a' merge as '(aa) a').

Scale shape per round: the corpus stays distributed as
(word, symbols[]) with a count per distinct word — BPE counts pairs
over the DISTINCT-word histogram (standard trick: corpus token volume
collapses to vocabulary size), the pair count is a narrow shuffle of
(pair, n) with partial aggregation, and the chosen pair is a 1-row
collect (the merge rule — the only driver-side data). Lineage is
truncated with localCheckpoint every few rounds (iterative-DataFrame
pattern, same as operators/dedup.min_label_components).
"""

from __future__ import annotations

# module-scope: pandas_udf resolves stringified type hints (PEP 563)
# against module globals, so `pd` must exist here, not inside the
# enclosing function
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _java_regex_escape(s: str) -> str:
    """Escape a literal for a Java regex pattern: every
    non-alphanumeric char gets a backslash (Java accepts escaped
    punctuation; escaping alphabetics would be an error there, so this
    mirrors what ``re.escape`` produces for ASCII and escapes nothing
    alphanumeric)."""
    return "".join(c if c.isalnum() else "\\" + c for c in s)


def _fold_pair_regex(a: str, b: str, merged: str):
    """Left-to-right single-pair collapse over a symbol array as ONE
    linear JVM expression (r16): symbols join on a space (words are
    whitespace-split upstream, so no symbol can contain one), then
    ``regexp_replace`` rewrites every `` a b`` occurrence followed by a
    space to `` merged`` — Java's replaceAll scans left to right and
    resumes AFTER each match, and the trailing space is matched by
    LOOKAHEAD (not consumed), so an ``a a a a`` run collapses to
    ``(aa)(aa)`` exactly like ``reference_bpe``'s sequential fold while
    ``a a a`` leaves the trailing odd ``a``.

    Why not the old ``F.aggregate`` fold: Catalyst arrays are
    immutable, so the per-element concat built a fresh copy per symbol
    — O(len²) per word per round; a single 20k-symbol garbage token
    (base64 blob, minified JS — routine at crawl scale) cost ~400M
    element copies per merge and made the degenerate-text audit's BPE
    entries ~100 s. Why not a pandas UDF: the linear Python fold fixes
    the monster token but pays an Arrow+worker round-trip per merge
    round — measured 2.4× slower than the JVM on a normal corpus
    (7.5 s → 18.2 s for 30 rounds at sf0.001). The regex form is
    linear AND stays inside whole-stage codegen."""
    pat = f" {_java_regex_escape(a)} {_java_regex_escape(b)}(?= )"
    rep = " " + merged.replace("\\", "\\\\").replace("$", "\\$")

    def fold(symbols):
        joined = F.concat(F.lit(" "), F.array_join(symbols, " "), F.lit(" "))
        out = F.regexp_replace(joined, pat, rep)
        # strip exactly the sentinel spaces (NOT trim: a symbol can BE
        # whitespace, e.g. a '\t' character of a control-char token,
        # and trim would eat it)
        return F.split(F.regexp_replace(out, "^ | $", ""), " ")

    return fold


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 30,
    checkpoint_every: int = 5,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a corpus.

    Words are whitespace tokens; initial symbols are characters with a
    word-end marker '</w>' appended (classic BPE). Returns the ordered
    merge list [(left, right, pair_count), ...] and the final
    (word, n, symbols) histogram frame.
    """
    # distinct-word histogram: all pair counting happens at vocab
    # cardinality, weighted by word frequency — never corpus volume
    words = (
        docs.select(F.explode(F.split(text_col, " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hist = words.select(
        "word",
        "n",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit("</w>"))
        ).alias("symbols"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    since_ckpt = 0
    topk = 16
    while len(merges) < n_merges:
        pairs = hist.filter(F.size("symbols") >= 2).select(
            "n",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("symbols") - 1),
                    lambda i: F.struct(
                        F.element_at("symbols", i).alias("a"),
                        F.element_at("symbols", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(topk)
            .collect()
        )
        if not top or top[0].cnt < 2:
            break
        # MULTI-MERGE BATCH (r17): accept a prefix of the ranked top-k
        # whose sequential application provably equals one-merge-at-a-
        # time training, so k merges share ONE pair-count shuffle and
        # ONE collect. Safety argument (each accepted candidate i is
        # exactly the top-1 the sequential algorithm would pick after
        # merges 1..i-1):
        # - merging (a, b) removes every " a b " adjacency and never
        #   increases any old pair's count, so accepted pairs vanish
        #   and every other OLD pair keeps or lowers its count — the
        #   pre-batch (cnt desc, a, b) rank order (identical to the
        #   reference tie-break, including at post-decrease count
        #   ties) remains valid for old pairs;
        # - candidates overlapping an accepted symbol stop the scan
        #   (their own count may have changed, so their rank is no
        #   longer trustworthy);
        # - NEW pairs involve a merged symbol and their counts are
        #   bounded by the old counts of the overlapping pairs they
        #   came from ((x,ab) ≤ (x,a); (ab,y) ≤ (b,y); (ab,cd) ≤
        #   (b,c)); those live either later in the top-k (known
        #   counts) or below it (≤ the k-th count), so candidate i is
        #   accepted only when its count STRICTLY exceeds that bound
        #   (ties are unsafe: a new pair's lexicographic name is
        #   arbitrary);
        # - EXCEPT a same-symbol merge (a == b): a run "a a a a"
        #   collapses to "(aa)(aa)", so the new pair (aa,aa) is bounded
        #   only by the ACCEPTED pair's own count — no later candidate
        #   can dominate it (caught by the metacharacter-run test:
        #   after (z,z) the true next merge is (zz,zz)). A run merge
        #   therefore always ENDS its batch. Worst case the batch is
        #   one merge — exactly the old behavior.
        full_tail = top[-1].cnt if len(top) == topk else 0
        batch: list[tuple[str, str, int]] = []
        syms: set[str] = set()
        for i, row in enumerate(top):
            a, b, cnt = row.a, row.b, row.cnt
            if cnt < 2 or len(merges) + len(batch) >= n_merges:
                break
            if batch:
                if a in syms or b in syms:
                    break
                bound = full_tail
                for later in top[i + 1 :]:
                    if later.a in syms or later.b in syms:
                        bound = max(bound, later.cnt)
                if cnt <= bound:
                    break
            batch.append((a, b, cnt))
            syms.add(a)
            syms.add(b)
            if a == b:
                break
        for a, b, cnt in batch:
            merges.append((a, b, cnt))
            merged = a + b
            # Left-to-right pair collapse, exactly the sequential
            # reference semantics: the accumulated tail is `a` and the
            # incoming symbol is `b` → replace the tail with the merged
            # symbol (a freshly-merged tail no longer equals `a`, so
            # overlapping runs collapse left-to-right). Per-row HYBRID,
            # both branches JVM (r16): ordinary words take the array
            # fold — O(len²) in Catalyst's immutable arrays, but at
            # len ≤ 64 that's a few thousand in-register copies and it
            # beats string building; pathological symbol runs (a
            # 20k-char crawl token: base64, minified JS) take the
            # LINEAR regex rewrite (_fold_pair_regex), which replaced a
            # measured ~100 s/entry on the degenerate-text audit.
            # when() evaluates lazily per row, so the cheap path never
            # pays for the rare one.
            fold = F.aggregate(
                "symbols",
                F.array().cast("array<string>"),
                # plain closure capture is safe: F.aggregate invokes the
                # lambda synchronously while building the expression, so
                # each batch member's (a, b, merged) is read immediately
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == a)
                    & (x == b),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            )
            hist = hist.select(
                "word",
                "n",
                F.when(F.size("symbols") <= 64, fold)
                .otherwise(_fold_pair_regex(a, b, merged)("symbols"))
                .alias("symbols"),
            )
        since_ckpt += len(batch)
        if since_ckpt >= checkpoint_every:
            hist = hist.localCheckpoint(eager=True)
            since_ckpt = 0
    return merges, hist


def reference_bpe(
    word_counts: dict[str, int], n_merges: int = 30
) -> list[tuple[str, str, int]]:
    """Single-process reference implementation (Sennrich-style) with
    the identical deterministic tie-break — the test oracle for
    train_bpe."""
    hist = {
        tuple(list(w) + ["</w>"]): n for w, n in word_counts.items()
    }
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in hist.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + n
                )
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        merged = a + b
        new_hist: dict[tuple[str, ...], int] = {}
        for syms, n in hist.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = merged
                else:
                    out.append(x)
            new_hist[tuple(out)] = new_hist.get(tuple(out), 0) + n
        hist = new_hist
    return merges


def encode_word(word: str, merge_seq: list[tuple[str, str]]) -> list[str]:
    """Sequential BPE encode of one word: replay the learned merges in
    training order with the identical left-to-right collapse — so a
    word seen during training encodes to exactly the symbols the final
    training histogram holds for it."""
    syms: list[str] = list(word) + ["</w>"]
    for a, b in merge_seq:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out
    return syms


def encode_words(
    words: DataFrame, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """Distributed BPE encoding of a (word) frame → (word,
    n_bpe_tokens). The merge table is KiB-scale and ships to executors
    inside the Arrow-batched pandas UDF's closure (the standard
    broadcast-the-model shape); per-word work is
    O(len(word) * n_merges) with no shuffle. Callers run this at
    DISTINCT-word cardinality and join counts back to documents —
    corpus volume never reaches Python."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    merge_seq = [(a, b) for a, b, _ in merges]

    @pandas_udf("int")
    def _n_tokens(s: pd.Series) -> pd.Series:
        return s.map(lambda w: len(encode_word(w, merge_seq)))

    return words.select("word", _n_tokens("word").alias("n_bpe_tokens"))
