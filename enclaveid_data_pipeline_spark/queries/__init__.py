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

def release_shared_caches() -> None:
    """Drop every session-scoped shared intermediate (the per-
    (applicationId, sf_dir) family truth tables) and unpersist their
    pinned blocks.

    Round-13 judge #1: ``bench.py``'s min-of-3 measured a WARM build
    for any benched query that reads a ``_SHARED`` table —
    ``top1_neighbor_graph``'s pass-1 built the per-label pair table
    and passes 2–3 read pinned blocks (``catalog.clearCache()`` does
    not drop localCheckpoint RDDs), so the headline number stopped
    measuring the query. The bench GC fence calls this between
    passes so every pass rebuilds from parquet; the correctness gate
    never calls it, so family sharing still serves the 287-query
    oracle run. Thread-safety: each family's own lock guards its
    dict; entries popped here have no readers by contract (the fence
    runs between sequential bench actions).
    """
    from ..materialize import release_blocks

    from . import (
        dbscan_queries as _dbq,
        dedup_queries as _ddq,
        graph_queries as _gq,
        similarity_queries as _sq,
        text_queries as _tq,
    )

    def _drain(lock, cache) -> None:
        with lock:
            entries = list(cache.values())
            cache.clear()
        for v in entries:
            if isinstance(v, dict):
                for m in v.values():
                    if hasattr(m, "_jdf"):
                        release_blocks(m)
            elif hasattr(v, "_jdf"):
                release_blocks(v)

    _drain(_dbq._PAIRS_LOCK, _dbq._PAIRS_SHARED)
    _drain(_ddq._CAND_LOCK, _ddq._CAND_SHARED)
    _drain(_sq._SIM_LOCK, _sq._SIM_SHARED)
    _drain(_gq._EDGES_LOCK, _gq._EDGES_SHARED)
    _drain(_tq._UNIGRAM_LOCK, _tq._UNIGRAM_SHARED)
    _drain(_tq._TF_LOCK, _tq._TF_SHARED)
    _drain(_tq._CLF_LOCK, _tq._CLF_SHARED)


__all__ = ["REGISTRY", "QueryDef", "register", "release_shared_caches"]
