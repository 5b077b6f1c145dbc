"""Query registry: the single source of truth for the engine's query
surface (`__spark_entry__.queries()` / `oracle_sql()` are thin views
over this).

Each entry pairs a DataFrame-building callable with the equivalent
ANSI SQL that DuckDB runs as the correctness oracle. Oracle-less
entries (``oracle=None``) are allowed for genuinely non-SQL ops
(custom stateful streaming, opaque-binary plumbing) and get the
driver's weaker rows-only check.

Determinism contract (FIXTURES.md): every computed column is aliased
identically on both sides; float aggregates are rounded on both
sides; top-k queries carry total-order tie-breakers.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str
    category: str = ""


# SURVEY.md §2 category strata, keyed by defining module — lets the
# driver's sampler and the judge stratify the 340-query surface
# without per-query annotation churn; individual queries can override
# via ``register(..., category=...)``.
MODULE_CATEGORY = {
    "relational": "relational-core (scan/filter/join/set-ops/scalar)",
    "tpch_more": "relational-core (scan/filter/join/set-ops/scalar)",
    "advanced": "aggregation-advanced (rollup/percentile/sketch/pivot)",
    "windows": "windows-sort-topk",
    "events": "events-temporal",
    "analytics": "analytics-stats (regression/tests/causal)",
    "dedup": "llm-dedup",
    "similarity": "llm-similarity-ann",
    "textstats": "llm-text-analysis",
    "multimodal": "llm-multimodal",
    "udf_surface": "udf-udaf-udtf",
    "pipeline_more": "llm-pipeline-ops",
    "corpus_ops": "llm-corpus-pipeline",
    "extras": "mixed-extensions",
    "mleval": "ml-eval-calibration",
    "closing_ops": "llm-pipeline-extended",
    "expansion": "llm-pipeline-extended",
}


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, category: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the
    registry, with its DuckDB oracle SQL and SURVEY §2 category
    (defaulted from the defining module via ``MODULE_CATEGORY``)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        mod = fn.__module__.rsplit(".", 1)[-1]
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=fn.__doc__ or "",
            category=category or MODULE_CATEGORY.get(mod, mod),
        )
        return fn

    return deco


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from .queries import (  # noqa: F401
        advanced,
        analytics,
        closing_ops,
        corpus_ops,
        dedup,
        events,
        expansion,
        extras,
        mleval,
        multimodal,
        pipeline_more,
        relational,
        round5,
        round5b,
        round6,
        round7,
        round8,
        round9,
        similarity,
        textstats,
        tpch_more,
        udf_surface,
        windows,
    )

    return REGISTRY
