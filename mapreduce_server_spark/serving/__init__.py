"""Serving-layer patterns: materialized views with incremental refresh."""

from .matview import MaterializedView  # noqa: F401
