"""Whole-catalog degenerate-TEXT robustness — the dirty-document shape.

Seventh of the degenerate-input family (zero rows, one row, nulls,
constants, NaN/±Inf, hot-key skew — and now DEGENERATE TEXT). The
numeric audits poison measures; this one poisons the ``documents.text``
surface every tokenizer, hash, UDF and UDTF in the LLM-pipeline family
consumes. At 100 TB these shapes are routine crawl output, not edge
cases:

- empty string and whitespace-only documents (tokenizers that divide
  by token/char counts, entropy of a zero-length distribution);
- single-token documents (bigram/shingle windows larger than the doc);
- CJK text with no spaces (whitespace tokenization yields ONE giant
  token — n-gram and fingerprint windows collapse);
- a 20 000-char single token (regex/codegen hot paths, Arrow batch
  transfer, BPE merge loops);
- control characters including NUL bytes, plus punctuation-only runs
  (UTF-8-legal but hostile to naive parsers);
- emoji + RTL scripts (multi-byte clusters; byte-vs-char confusion);
- a document that is one token repeated 100× (zero entropy, repetition
  ratios at their poles).

Half the rows keep their real fixture text so estimators (BPE corpus,
TF-IDF, LSH banding) still have signal — the contract is the same as
the null audit's: EVERY registered catalog query completes on the
degenerate-text fixture. Any exception is a regression; a crisp
fitguard error is allowed only where an operator genuinely cannot
train (none expected at 50 % real text).
"""

from __future__ import annotations

import os
import shutil

import pytest

from .audit_walk import walk_catalog
from .conftest import SF_SMOKE

DEGENERATE_TEXTS = (
    "",
    "   ",
    "x",
    "火车站的列车时刻表显示今天所有列车准点运行并且月台上的乘客正在依次上车",
    "a" * 20_000,
    "\t\n\x00\x01 ,,, !!! ### $$$",
    "🚂🚂🚂 مرحبا בוקר טוב 🚂 ‏‎",
    " ".join(["dup"] * 100),
)


@pytest.fixture(scope="module")
def degtext_sf_dir(tmp_path_factory):
    """Fixture copy where every EVEN documents row's text is replaced
    by a rotating degenerate shape; all other tables byte-identical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sf_degtext")
    for f in os.listdir(SF_SMOKE):
        if not f.endswith(".parquet"):
            continue
        src = os.path.join(SF_SMOKE, f)
        if f != "documents.parquet":
            shutil.copyfile(src, str(d / f))
            continue
        t = pq.read_table(src)
        n = t.num_rows
        texts = t.column("text").to_pylist()
        for i in range(0, n, 2):
            texts[i] = DEGENERATE_TEXTS[(i // 2) % len(DEGENERATE_TEXTS)]
        cols = [
            pa.array(texts, type=field.type)
            if field.name == "text"
            else t.column(idx)
            for idx, field in enumerate(t.schema)
        ]
        pq.write_table(pa.table(cols, schema=t.schema), str(d / f))
    return str(d)


def test_degenerate_fixture_actually_poisons(spark, degtext_sf_dir):
    """Canary: the audit is meaningless if the poison silently no-ops.
    Every degenerate shape must be present in the documents table the
    catalog walk reads."""
    texts = {
        r.text
        for r in spark.read.parquet(
            os.path.join(degtext_sf_dir, "documents.parquet")
        ).collect()
    }
    missing = [t[:30] for t in DEGENERATE_TEXTS if t not in texts]
    assert not missing, f"degenerate shapes absent from fixture: {missing}"


@pytest.mark.slow
def test_every_query_survives_degenerate_text(spark, degtext_sf_dir):
    crisp, bad = walk_catalog(spark, degtext_sf_dir)
    assert not bad, f"not degenerate-text-safe: {bad}"
    # degenerate text leaves row counts intact — estimators still fit
    assert crisp == set(), f"estimators stopped fitting: {crisp}"
