"""Production backend adapters (SURVEY §2.10 M1-M7 real paths).

The mocks in ``backends.py`` drive oracle coverage; these adapters
are what a deployment plugs into the same operators:

- :class:`HttpChatBackend` / :class:`HttpEmbeddingBackend` — an
  OpenAI-compatible HTTP API (``/chat/completions``, ``/embeddings``)
  covering the reference's remote Mistral chat + embed calls
  (utils/recent_history_utils.py:69-124, 189-233). stdlib-only
  (urllib), per-worker rate limiting (M8), bounded retries with
  backoff on 429/5xx.
- :func:`sentence_transformer_backend` — local sentence embedding
  (reference utils/old_history_utils.py:176-182), import-guarded.
- :func:`vllm_completion_backend` — local generation (reference
  utils/old_history_utils.py:129-173), import-guarded.
- :func:`umap_hdbscan_label_fn` — UMAP reduce → HDBSCAN cluster per
  group (reference assets/old_history.py:154-176), as a ``label_fn``
  for ``ml.clustering.cluster_embeddings``; import-guarded.

Import guards follow one pattern: the adapter CONSTRUCTOR imports the
optional lib and raises a clear ImportError naming it — so a driver
misconfiguration fails fast at plan-build/backend-build time, not
row-one of a 100 TB stage. Heavy handles are built per python worker
via the ``build_backend`` pattern (llm_ops._cached) — never pickled
into closures.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable, Sequence

from .backends import RateLimiter

#: HTTP statuses worth retrying (throttle + transient server errors).
_RETRYABLE = {429, 500, 502, 503, 504}


def _free_accelerator_memory() -> None:
    """gc + CUDA cache empty, guarded: the second half of the
    reference's teardown (utils/old_history_utils.py:137-165)."""
    import gc

    gc.collect()
    try:
        import torch

        if torch.cuda.is_available():  # pragma: no cover - no GPU here
            torch.cuda.empty_cache()
    except ImportError:
        pass


def _post_json(
    url: str,
    payload: dict,
    headers: dict[str, str],
    timeout: float,
    max_retries: int,
    backoff_s: float,
) -> dict:
    """POST with bounded exponential backoff on retryable statuses.

    Honors ``Retry-After`` when the server sends one (the reference's
    AsyncLimiter only shapes the request rate; real APIs still 429
    under burst and the retry contract is on the client).
    """
    body = json.dumps(payload).encode()
    last: Exception | None = None
    for attempt in range(max_retries + 1):
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json", **headers}
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            last = e
            if e.code not in _RETRYABLE or attempt == max_retries:
                raise
            retry_after = e.headers.get("Retry-After")
            delay = (
                float(retry_after)
                if retry_after
                else backoff_s * (2**attempt)
            )
            time.sleep(delay)
        except urllib.error.URLError as e:
            last = e
            if attempt == max_retries:
                raise
            time.sleep(backoff_s * (2**attempt))
    raise last  # unreachable; keeps the type checker honest


class HttpChatBackend:
    """CompletionBackend over an OpenAI-compatible chat API.

    One request per prompt (chat APIs take one conversation each);
    batching across prompts comes from the Arrow batch the operator
    hands us, concurrency from Spark tasks. ``rate_per_sec`` bounds
    THIS worker; cluster-wide rate = per-task rate × concurrent
    tasks (cap the stage's task count to bound the product — same
    note as backends.RateLimiter).
    """

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        system_prompt: str | None = None,
        temperature: float = 0.0,
        max_tokens: int | None = None,
        timeout_s: float = 60.0,
        max_retries: int = 3,
        backoff_s: float = 1.0,
        rate_per_sec: float | None = None,
    ):
        self.url = base_url.rstrip("/") + "/chat/completions"
        self.model = model
        self.system_prompt = system_prompt
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.headers = (
            {"Authorization": f"Bearer {api_key}"} if api_key else {}
        )
        self.limiter = RateLimiter(rate_per_sec) if rate_per_sec else None

    def complete(self, prompts: Sequence[str]) -> list[str]:
        out = []
        for p in prompts:
            if self.limiter:
                self.limiter.acquire()
            messages = (
                [{"role": "system", "content": self.system_prompt}]
                if self.system_prompt
                else []
            ) + [{"role": "user", "content": p}]
            payload: dict = {
                "model": self.model,
                "messages": messages,
                "temperature": self.temperature,
            }
            if self.max_tokens is not None:
                payload["max_tokens"] = self.max_tokens
            resp = _post_json(
                self.url, payload, self.headers, self.timeout_s,
                self.max_retries, self.backoff_s,
            )
            out.append(resp["choices"][0]["message"]["content"])
        return out


class HttpEmbeddingBackend:
    """EmbeddingBackend over an OpenAI-compatible embeddings API.

    The API takes a LIST of inputs per request — requests carry
    ``batch_size`` texts (the reference embeds per-chunk lists the
    same way, utils/recent_history_utils.py:189-233). Responses are
    re-ordered by the API's ``index`` field before return, so the
    operator's in-row alignment is safe even against out-of-order
    response arrays.
    """

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        batch_size: int = 64,
        timeout_s: float = 60.0,
        max_retries: int = 3,
        backoff_s: float = 1.0,
        rate_per_sec: float | None = None,
    ):
        self.url = base_url.rstrip("/") + "/embeddings"
        self.model = model
        self.batch_size = batch_size
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.headers = (
            {"Authorization": f"Bearer {api_key}"} if api_key else {}
        )
        self.limiter = RateLimiter(rate_per_sec) if rate_per_sec else None

    def embed(self, texts: Sequence[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for i in range(0, len(texts), self.batch_size):
            chunk = list(texts[i : i + self.batch_size])
            if self.limiter:
                self.limiter.acquire()
            resp = _post_json(
                self.url,
                {"model": self.model, "input": chunk},
                self.headers,
                self.timeout_s,
                self.max_retries,
                self.backoff_s,
            )
            data = sorted(resp["data"], key=lambda d: d["index"])
            if len(data) != len(chunk):
                raise ValueError(
                    f"embeddings API returned {len(data)} vectors for "
                    f"{len(chunk)} inputs"
                )
            out.extend(d["embedding"] for d in data)
        return out


def sentence_transformer_backend(
    model_name: str, device: str | None = None, batch_size: int = 64
):
    """Local sentence-embedding adapter (reference
    utils/old_history_utils.py:176-182). Returns an EmbeddingBackend;
    requires ``sentence-transformers``.
    """
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as e:  # pragma: no cover - exercised via fake module
        raise ImportError(
            "sentence_transformer_backend requires the "
            "'sentence-transformers' package on every executor"
        ) from e

    class _STBackend:
        def __init__(self):
            self.model = SentenceTransformer(model_name, device=device)

        def embed(self, texts: Sequence[str]) -> list[list[float]]:
            vecs = self.model.encode(
                list(texts), batch_size=batch_size, show_progress_bar=False
            )
            return [list(map(float, v)) for v in vecs]

        def release(self) -> None:
            # reference utils/old_history_utils.py:137-165 frees the
            # model deliberately; llm_ops.release_executor_backends
            # routes here
            self.model = None
            _free_accelerator_memory()

    return _STBackend()


def vllm_completion_backend(
    model_name: str, sampling_params: dict | None = None
):
    """Local-generation adapter (reference utils/old_history_utils.py:
    129-173 loads one vLLM engine per process and batch-generates).
    Returns a CompletionBackend; requires ``vllm``. Build it through
    ``llm_ops`` build_backend so the engine loads once per worker —
    the reference's load-once-per-GPU-process lifecycle.
    """
    try:
        from vllm import LLM, SamplingParams
    except ImportError as e:  # pragma: no cover - exercised via fake module
        raise ImportError(
            "vllm_completion_backend requires the 'vllm' package (and a "
            "GPU task resource request) on every executor"
        ) from e

    class _VllmBackend:
        def __init__(self):
            self.llm = LLM(model=model_name)
            self.params = SamplingParams(**(sampling_params or {}))

        def complete(self, prompts: Sequence[str]) -> list[str]:
            outs = self.llm.generate(list(prompts), self.params)
            return [o.outputs[0].text for o in outs]

        def release(self) -> None:
            # the reference's explicit GPU free: drop the engine and
            # empty the CUDA cache so the next model fits
            self.llm = None
            _free_accelerator_memory()

    return _VllmBackend()


def umap_hdbscan_label_fn(
    n_components: int = 10,
    n_neighbors: int = 15,
    min_cluster_size: int = 5,
    min_samples: int | None = None,
    random_state: int = 42,
) -> Callable:
    """Real clusterer for ``ml.clustering.cluster_embeddings``:
    UMAP-reduce each group's vectors, then HDBSCAN on cosine-shaped
    distances — the reference's per-user pipeline
    (assets/old_history.py:154-176: UMAP(n_components, cosine) →
    pairwise distances → HDBSCAN(leaf, eom)). Requires ``umap-learn``
    and ``hdbscan`` on executors; import happens inside the returned
    closure (executor-side, once per worker via module import cache).

    The returned labels are HDBSCAN's (-1 = noise); the operator
    remaps them to min-member-id so output is stable regardless of
    the library's label numbering.
    """

    def label_fn(vectors):
        try:
            import hdbscan
            import umap
        except ImportError as e:
            raise ImportError(
                "umap_hdbscan_label_fn requires 'umap-learn' and "
                "'hdbscan' on every executor"
            ) from e

        import numpy as np

        n = len(vectors)
        if n == 0:
            return np.empty(0, dtype=np.int64)
        if n <= min_cluster_size:
            return np.full(n, -1, dtype=np.int64)
        # UMAP needs n_neighbors < n; the reference clamps implicitly
        # by only clustering users with enough interests.
        reducer = umap.UMAP(
            n_components=min(n_components, max(2, n - 2)),
            n_neighbors=min(n_neighbors, n - 1),
            metric="cosine",
            random_state=random_state,
        )
        reduced = reducer.fit_transform(np.asarray(vectors))
        clusterer = hdbscan.HDBSCAN(
            min_cluster_size=min_cluster_size,
            min_samples=min_samples,
            cluster_selection_method="eom",
        )
        return np.asarray(clusterer.fit_predict(reduced), dtype=np.int64)

    return label_fn
