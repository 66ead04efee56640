"""Named engine queries + DuckDB oracle SQL (the driver contract).

Each module registers queries into :data:`REGISTRY` via
:func:`~enclaveid_data_pipeline_spark.queries.registry.register`.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry.
"""

from .registry import REGISTRY, QueryDef, register

# Import for registration side effects — order defines display order.
from . import takeout_queries  # noqa: E402,F401
from . import session_queries  # noqa: E402,F401
from . import similarity_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import dedup_queries  # noqa: E402,F401
from . import ml_queries  # noqa: E402,F401
from . import relational_queries  # noqa: E402,F401
from . import coverage_queries  # noqa: E402,F401
from . import asof_queries  # noqa: E402,F401
from . import tpch_queries  # noqa: E402,F401
from . import tpch2_queries  # noqa: E402,F401
from . import trainprep_queries  # noqa: E402,F401
from . import cdc_queries  # noqa: E402,F401
from . import graph_queries  # noqa: E402,F401
from . import dbscan_queries  # noqa: E402,F401
from . import mview_queries  # noqa: E402,F401
from . import skyline_queries  # noqa: E402,F401
from . import privacy_queries  # noqa: E402,F401

__all__ = ["REGISTRY", "QueryDef", "register"]
