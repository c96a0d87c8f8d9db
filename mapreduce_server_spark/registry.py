"""Query registry — the single source of truth for the engine's surface.

Each operator module registers its queries with the :func:`query` decorator.
``__spark_entry__.py`` (the driver contract) and ``bench.py`` are thin views
over :data:`REGISTRY`, so adding an operator is exactly one decorated
function (plus its DuckDB oracle SQL, when SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: QueryFn
    #: the undecorated builder — always constructs a FRESH logical plan.
    #: Callers that must re-plan under changed session state (e.g. the
    #: shared-scan scheduler pinning a table after `fn`'s memoized plan
    #: was already physically planned) use this instead of `fn`.
    raw_fn: QueryFn
    #: ANSI SQL equivalent runnable by DuckDB over the same parquet views;
    #: ``None`` for non-SQL-expressible ops (driver falls back to rows-only).
    oracle: str | None
    #: SURVEY.md §2 category tag, e.g. "D.agg", "J.text" — for coverage reports.
    category: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}

#: Plan cache: (applicationId, sf_dir, key) → built DataFrame.
#:
#: Spark re-analyzes, re-optimizes and re-codegens every freshly
#: constructed plan (~0.4 s/query here — 5× the actual execution time at
#: sf0.1); unlike engines with prepared-statement caches it keeps nothing
#: across queries. DataFrames are immutable logical plans over read-only
#: fixture paths, so memoizing the built plan per (session, sf_dir) is
#: semantically transparent: re-collecting a cached plan re-executes it
#: against the files. This is the serving-layer pattern for repeated
#: analytical queries; it never crosses sessions (applicationId key).
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def query(
    key: str,
    *,
    oracle: str | None = None,
    category: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the implementation of query ``key``.

    The registered callable memoizes the built plan via the plan cache;
    the decorated function itself is returned unwrapped (tests composing
    fresh plans can call it directly).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate query key: {key}")

        def cached(spark: SparkSession, sf_dir: str) -> DataFrame:
            cache_key = (spark.sparkContext.applicationId, sf_dir, key)
            df = _PLAN_CACHE.get(cache_key)
            if df is None:
                df = fn(spark, sf_dir)
                _PLAN_CACHE[cache_key] = df
            return df

        cached.__name__ = fn.__name__
        cached.__doc__ = fn.__doc__
        REGISTRY[key] = QuerySpec(
            key=key,
            fn=cached,
            raw_fn=fn,
            oracle=oracle,
            category=category,
            tags=tuple(tags),
        )
        return fn

    return deco
