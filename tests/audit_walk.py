"""Shared whole-catalog degenerate-input walk (r12 verdict item 4).

Nine audits (empty / one-row / null / constant / NaN-Inf / skew /
degenerate-text / extreme-timestamp / ragged-embedding) each walk every
registered catalog query against a poisoned-or-cleaned fixture dir.
Before r13 each audit file carried its own copy of the try/except loop
and ran it SEQUENTIALLY (~2 min per walk, ~18 min of @slow suite).
This module is the single implementation, and it runs the catalog in a
small THREAD POOL: Spark supports concurrent job submission from one
session, and py4j releases the GIL while waiting on the JVM, so the
median 0.24 s query overlaps instead of serializing (measured: the
empty-input walk drops ~4x with 8 workers).

Thread-safety: a handful of queries mutate SESSION-GLOBAL state during
construction — named temp views (``createOrReplaceTempView``), saved
tables (``saveAsTable``), SQL UDF registration (``spark.udf.register``),
session-conf flips (``spark.conf.set``), Observation listeners. Two of
them racing each other (or a pure query reading a view mid-replace)
would make the suite flaky, so those run SERIALLY after the pool
drains. The set is computed MECHANICALLY by source inspection with a
one-level transitive closure over package helpers (a query reaching
``createOrReplaceTempView`` through ``sources.tables.register_views``
is still caught); ``tests/test_audit_walk_harness.py`` pins the
detector against known-global and known-pure queries so drift is loud.

Failure classification (identical to the nine old loops, unified):

- ``ValueError`` whose message matches the crisp estimator contract
  (``ml/fitguard``'s "zero rows" / "needs at least", the similarity
  guard's "zero vectors") → returned in ``crisp`` for the caller to
  assert against its expected set (equality for the empty/one-row
  audits, ``== set()`` for audits whose fixtures keep estimators
  fittable, ``<= ESTIMATOR_CRISP_OK`` otherwise);
- any other exception → ``bad`` {name: "ExcType: first line"} — the
  audit's whole point; callers assert ``not bad``.
"""

from __future__ import annotations

import inspect
import os
import re
from concurrent.futures import ThreadPoolExecutor, as_completed

from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

_PKG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "real_time_predictive_maintenance_data_pipeline_spark",
)

#: Source substrings that mark a function as session-global-mutating.
SESSION_GLOBAL_MARKERS = (
    "createOrReplaceTempView",
    "createTempView",
    "GlobalTempView",
    "saveAsTable",
    "udf.register",
    "spark.conf.set",
    "Observation(",
    ".observe(",
)

#: Crisp estimator-contract messages (ml/fitguard + the similarity
#: degenerate-vector guard). A ValueError matching one of these is a
#: DECLARED failure mode, not a robustness bug.
_CRISP_RE = re.compile(r"zero rows|zero vectors|needs at least")

#: Every query allowed to fail crisply on SOME degenerate fixture —
#: the union of the empty-input and one-row expected sets. Audits
#: whose fixtures keep estimators fittable assert tighter.
ESTIMATOR_CRISP_OK = frozenset(
    {
        "emb_opq_rotation",
        "emb_pca_whitening",
        "emb_pq_codes",
        "ml_als_recommend",
        "ml_kmeans_embeddings",
        "ml_survival_aft",
        "sem_dedup",
        "sim_ivf_pq_topk",
        "sim_ivf_topk",
        "sim_pq_adc_topk",
    }
)


def _package_function_sources() -> dict[str, str]:
    """{function_name: concatenated source} for every module-level (and
    nested) function def in the package — textual, AST-free on purpose:
    the taint check below is substring-based and a name collision just
    merges sources (conservative over-taint, never under)."""
    import ast

    srcs: dict[str, str] = {}
    for dirpath, _dirs, files in os.walk(_PKG_DIR):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            with open(path, encoding="utf-8") as fh:
                text = fh.read()
            try:
                tree = ast.parse(text)
            except SyntaxError:  # pragma: no cover
                continue
            for node in ast.walk(tree):
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    seg = ast.get_source_segment(text, node) or ""
                    srcs[node.name] = srcs.get(node.name, "") + "\n" + seg
    return srcs


def _strip_decorators(src: str) -> str:
    """Drop decorator lines so ``@register(...)`` never matches a
    tainted helper that happens to be named ``register``."""
    return "\n".join(
        ln for ln in src.splitlines() if not ln.lstrip().startswith("@")
    )


def _tainted_function_names() -> frozenset[str]:
    """Package function names that (transitively) reach a session-global
    marker — fixed point over textual ``name(`` call matches."""
    srcs = {n: _strip_decorators(s) for n, s in _package_function_sources().items()}
    tainted = {
        n for n, s in srcs.items() if any(m in s for m in SESSION_GLOBAL_MARKERS)
    }
    changed = True
    while changed:
        changed = False
        pats = [re.compile(r"\b" + re.escape(t) + r"\(") for t in tainted]
        for n, s in srcs.items():
            if n in tainted:
                continue
            if any(p.search(s) for p in pats):
                tainted.add(n)
                changed = True
    return frozenset(tainted)


_TAINTED_CACHE: frozenset[str] | None = None


def session_global_queries() -> frozenset[str]:
    """Catalog query names whose construction mutates session-global
    state (directly or through package helpers) — these run serially."""
    global _TAINTED_CACHE
    if _TAINTED_CACHE is None:
        _TAINTED_CACHE = _tainted_function_names()
    out = set()
    for name, q in all_queries().items():
        fn = q.spark
        try:
            src = _strip_decorators(inspect.getsource(fn))
        except (OSError, TypeError):
            out.add(name)  # can't prove pure -> serial
            continue
        if any(m in src for m in SESSION_GLOBAL_MARKERS):
            out.add(name)
            continue
        if any(
            re.search(r"\b" + re.escape(t) + r"\(", src)
            for t in _TAINTED_CACHE
        ):
            out.add(name)
    return frozenset(out)


def _run_one(spark, q, sf_dir: str):
    df = q.spark(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()


def walk_catalog(
    spark, sf_dir: str, workers: int = 16
) -> tuple[set[str], dict[str, str]]:
    """Run every registered non-eager-io catalog query against
    ``sf_dir``; returns ``(crisp, bad)`` per the module docstring."""
    crisp: set[str] = set()
    bad: dict[str, str] = {}

    def classify(name: str, exc: BaseException) -> None:
        if isinstance(exc, ValueError) and _CRISP_RE.search(str(exc)):
            crisp.add(name)
        else:
            bad[name] = (
                f"{type(exc).__name__}: {str(exc).splitlines()[0][:160]}"
            )

    serial_names = session_global_queries()
    pooled, serial = [], []
    for name, q in all_queries().items():
        if "eager-io" in q.tags:
            continue  # wire-transport demos; no table input to poison
        (serial if name in serial_names else pooled).append((name, q))

    spark.catalog.clearCache()
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs = {ex.submit(_run_one, spark, q, sf_dir): n for n, q in pooled}
        done = 0
        for fut in as_completed(futs):
            exc = fut.exception()
            if exc is not None:
                classify(futs[fut], exc)
            done += 1
            if done % 32 == 0:
                # bound cache growth from queries that persist() —
                # unpersisting a frame mid-job is safe (recompute)
                spark.catalog.clearCache()

    for name, q in serial:
        try:
            spark.catalog.clearCache()
            _run_one(spark, q, sf_dir)
        except Exception as exc:  # noqa: BLE001 — the audit's whole point
            classify(name, exc)
    spark.catalog.clearCache()
    return crisp, bad
