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
    #: ANSI SQL equivalent runnable by DuckDB over the same parquet views;
    #: ``None`` for non-SQL-expressible ops (driver falls back to rows-only).
    oracle: str | None
    #: SURVEY.md §2 category tag, e.g. "D.agg", "J.text" — for coverage reports.
    category: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    key: str,
    *,
    oracle: str | None = None,
    category: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the implementation of query ``key``.

    The wrapped function keeps its identity (usable directly in tests);
    registration is a side effect at import time.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        REGISTRY[key] = QuerySpec(
            key=key, fn=fn, oracle=oracle, category=category, tags=tuple(tags)
        )
        return fn

    return deco
