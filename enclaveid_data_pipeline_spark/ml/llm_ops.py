"""Model-backed batch operators (SURVEY §2.10 M1-M4, M8).

Execution model: ``mapInPandas`` / ``applyInPandas`` with a backend
built ONCE per python worker (executor-scoped cache), Arrow batches
as the unit of model batching. This is the Spark-native shape of the
reference's per-chunk async fan-out (utils/recent_history_utils.py:
101-124): parallelism comes from partitions/tasks instead of an
asyncio gather, and the per-worker RateLimiter bounds the external
call rate (cluster-wide rate = task rate × concurrent tasks).
"""

from __future__ import annotations

import atexit
import uuid
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .backends import CompletionBackend, EmbeddingBackend, release_backend

# Executor-side backend cache: one instance per (worker, key).
_BACKEND_CACHE: dict[str, object] = {}
_ATEXIT_REGISTERED = False


def _release_all() -> None:
    """Drain this python worker's backend cache, calling ``release()``
    on every backend that defines one (backends.release_backend).
    Idempotent: a drained cache is a no-op."""
    while _BACKEND_CACHE:
        _, backend = _BACKEND_CACHE.popitem()
        release_backend(backend)


def _cached(key: str, build: Callable[[], object]) -> object:
    global _ATEXIT_REGISTERED
    if key not in _BACKEND_CACHE:
        if not _ATEXIT_REGISTERED:
            # Worker-lifetime finally-path: clean python-worker exit
            # releases whatever is still cached, so even a pipeline
            # that never calls release_executor_backends frees its
            # models deliberately rather than by process death.
            atexit.register(_release_all)
            _ATEXIT_REGISTERED = True
        _BACKEND_CACHE[key] = build()
    return _BACKEND_CACHE[key]


def release_executor_backends(spark, parallelism: int | None = None) -> None:
    """Deliberate teardown of executor-cached model backends — the
    engine's twin of the reference's explicit GPU free between
    stages (utils/old_history_utils.py:137-165: delete the vLLM
    engine, empty the CUDA cache, so the next stage's model fits).

    Runs a small all-partitions ``mapInPandas`` job — the SAME
    worker pool the model operators run on (python workers are
    reuse-pooled per (exec, env); a plain RDD job would land on a
    different pool and drain nothing). Every worker that picks up a
    task drains its cache and calls ``release()`` on each cached
    backend exactly once (the cache is popped before the call, so
    re-entry is a no-op). Best-effort by construction — an idle
    worker not scheduled keeps its cache until process exit, where
    the atexit finally-path fires instead. Call it where the
    reference frees its model: after the last action that needs the
    backend, before a stage that needs the memory."""
    n = parallelism or spark.sparkContext.defaultParallelism * 2

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _release_all()
        yield from batches

    spark.range(n).repartition(n).mapInPandas(op, "id long").count()


def embed_text(
    df: DataFrame,
    text_col: str,
    build_backend: Callable[[], EmbeddingBackend],
    dim: int,
    out_col: str = "embedding",
    cache_key: str | None = None,
    resources=None,
) -> DataFrame:
    """M2/M4: embedding operator.

    ``mapInPandas`` so the vector is computed IN-ROW — no positional
    column attach across a shuffle (the reference aligns an external
    array by position, assets/recent_history.py:235-238; SURVEY §7.3
    hard part 7 forbids that shape).

    ``resources`` (ml.resources.ModelResources) declares the stage's
    accelerator needs: the session is validated against its GPU
    confs (fail at plan time, not CUDA-OOM mid-job) and the stage's
    task fan-out is capped at ``max_concurrent_tasks`` (GPU memory
    and HTTP rate both scale with concurrent tasks).
    """
    if resources is not None:
        resources.validate_session(df.sparkSession)
        df = resources.apply_cap(df)
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )
    cols = [f.name for f in df.schema.fields]
    # Unique per operator construction: caching is still once per
    # worker per operator, but two operators with different configs
    # (e.g. dims) can never collide in a reused python worker.
    cache_key = cache_key or f"embed-{uuid.uuid4().hex}"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = _cached(cache_key, build_backend)
        for pdf in batches:
            vecs = backend.embed(pdf[text_col].fillna("").tolist())
            out = pdf[cols].copy()
            out[out_col] = vecs
            yield out

    return df.mapInPandas(op, schema=schema)


def summarize_chunks(
    chunked: DataFrame,
    build_backend: Callable[[], CompletionBackend],
    group_cols: tuple[str, ...] = ("user_id", "date_s", "chunk_id"),
    hour_col: str = "hour_s",
    title_col: str = "title",
    cache_key: str | None = None,
    resources=None,
) -> DataFrame:
    """M1: chunk → prompt → completion → raw response, one row per
    chunk (UDTF-shaped downstream: response parses into N sessions).

    Prompt rendering mirrors the reference's deterministic row
    formatting (utils/recent_history_utils.py:104-121): one
    ``hour title`` line per event, ordered — no pretty-printer.
    The response stays RAW here; json extraction + strict-schema
    parse + validity counters are downstream relational stages
    (functions.jsonextract, operators.quality).

    Execution shape (r4 rewrite): prompt ASSEMBLY is pure JVM SQL —
    one groupBy folding each chunk's (hour, title)-sorted lines into
    its prompt string (sort_array over structs; no pandas, no
    per-group Python call) — and the model stage is ``mapInPandas``
    over the |chunks|-row prompt table, so ``backend.complete``
    receives a WHOLE ARROW BATCH of prompts per call (the reference
    fans out per-chunk requests with asyncio,
    utils/recent_history_utils.py:101-124; a batched backend call is
    the engine's equivalent, and HTTP/vLLM backends amortize per-call
    overhead across the batch). The previous applyInPandas form
    called the backend once per chunk — batch size 1, thousands of
    Python round trips.

    Key columns render into the header via CAST AS STRING — integer
    and string keys are byte-identical to the old Python ``str()``
    rendering; NULL hours/titles would drop their line (the old form
    printed ``None``) — keep them non-null upstream.

    ``resources``: see :func:`embed_text` — the concurrency cap
    coalesces the prompt table to ``max_concurrent_tasks`` before
    the model stage.
    """
    keys = list(group_cols)
    if resources is not None:
        resources.validate_session(chunked.sparkSession)
    header = F.concat_ws(
        ";",
        *[
            F.concat(F.lit(f"{k}="), F.col(k).cast("string"))
            for k in keys
        ],
    )
    line_structs = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(hour_col).alias("h"), F.col(title_col).alias("t")
            )
        )
    )
    body = F.array_join(
        F.transform(
            line_structs, lambda s: F.concat(s["h"], F.lit(" "), s["t"])
        ),
        "\n",
    )
    prompts = (
        chunked.groupBy(*keys)
        .agg(body.alias("__body"))
        .select(
            *keys,
            F.concat(header, F.lit("\n---\n"), F.col("__body")).alias(
                "prompt"
            ),
        )
    )
    if resources is not None and resources.max_concurrent_tasks:
        prompts = prompts.coalesce(resources.max_concurrent_tasks)
    schema = T.StructType(
        [prompts.schema[k] for k in keys]
        + [
            T.StructField("prompt", T.StringType()),
            T.StructField("response", T.StringType()),
        ]
    )
    cache_key = cache_key or f"complete-{uuid.uuid4().hex}"
    cols = keys + ["prompt"]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = _cached(cache_key, build_backend)
        for pdf in batches:
            out = pdf[cols].copy()
            out["response"] = backend.complete(pdf["prompt"].tolist())
            yield out

    return prompts.mapInPandas(op, schema=schema)
