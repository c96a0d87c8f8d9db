"""mapreduce_server_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing surface of the reference
``LIUYOU2015/MapReduce-Server`` (a MapReduce-model server; see SURVEY.md §0
— the reference checkout at /root/reference is empty, so the capability
surface is pinned by the public MapReduce model [Dean & Ghemawat, OSDI'04],
the Hadoop MR API semantics, and the driver contract) as idiomatic Spark
DataFrame plans, plus the LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) the north star requires.

Architecture (Spark-first, see README.md):
- every operator is a declarative DataFrame plan → Catalyst owns pushdown,
  pruning, join strategy, partial aggregation; we never hand-schedule.
- operators register themselves in :mod:`.registry`; the driver contract
  (``__spark_entry__.py``) is a thin view over the registry.
- one shared loader (:mod:`.sources.loader`) owns the events-nanos fix and
  session-level conf pinning so every entry point sees identical tables.
"""

from .registry import REGISTRY, QuerySpec, query
from .session import get_spark
from .sources.loader import Tables, load_table

# Importing the operator packages populates REGISTRY.
from . import operators  # noqa: E402,F401

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "query",
    "get_spark",
    "Tables",
    "load_table",
]
