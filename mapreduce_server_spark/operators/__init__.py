"""Operator modules — importing this package populates the query registry.

Module ↔ SURVEY.md §2 category map:
- analytics.py    → composite analytics (co-occurrence, funnel, CDC merge,
                    SCD2, anomaly flagging)
- curation.py     → corpus curation (hash sampling, mixture reweighting,
                    repetition metrics)
- quality.py      → data-quality gates (column profile, constraint
                    validation, exact heavy hitters via candidate-prune)
- relational.py   → B (filters/projections), C (joins)
- aggregates.py   → D (aggregations)
- windows.py      → E (window functions)
- sorts_sets.py   → F (sorts/limits/top-k), G (set operations)
- scalars.py      → H (scalar function bundles)
- events_batch.py → I (streaming-shaped ops, batch-verifiable forms)
- stats_ml.py     → D/J (per-group OLS, entropy, seasonality, k-means)
- text.py         → J (text analysis: wordcount/grep/index/tf-idf)
- dedup.py        → J (exact + near dedup)
- similarity.py   → J (knn / embeddings / multimodal)
- udfs.py         → K (UDF/UDAF/UDTF surface)
"""

from . import aggregates  # noqa: F401
from . import analytics  # noqa: F401
from . import curation  # noqa: F401
from . import dedup  # noqa: F401
from . import events_batch  # noqa: F401
from . import graph  # noqa: F401
from . import multimodal_ops  # noqa: F401
from . import pipeline  # noqa: F401
from . import quality  # noqa: F401
from . import relational  # noqa: F401
from . import scalars  # noqa: F401
from . import scale_patterns  # noqa: F401
from . import similarity  # noqa: F401
from . import sorts_sets  # noqa: F401
from . import sources_ops  # noqa: F401
from . import stats_ml  # noqa: F401
from . import text  # noqa: F401
from . import tpch_shapes  # noqa: F401
from . import tpch_suite  # noqa: F401
from . import udfs  # noqa: F401
from . import windows  # noqa: F401
