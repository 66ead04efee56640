"""Pluggable model backends (SURVEY §2.10 M1-M4, §7.0 design stance).

The reference hard-wires its model calls: Mistral chat + embed over
HTTP with an AsyncLimiter (utils/recent_history_utils.py:69-124,
189-233), local vLLM two-turn generation (utils/old_history_utils.py:
129-173), SentenceTransformers embedding (176-182). Here every model
touchpoint is a Backend protocol so the operators are testable
hermetically and swappable in production:

- ``CompletionBackend.complete(prompts) -> responses`` (batch),
- ``EmbeddingBackend.embed(texts) -> vectors`` (batch).

The mocks are DETERMINISTIC md5 functions of their inputs — the same
arithmetic is expressible in SQL, so even the model-shaped pipeline
stages get DuckDB oracle coverage (the reference can only validate
LLM output post-hoc; we can assert byte-equality end-to-end).

Backends are constructed per executor (build_fn pattern in llm_ops)
— model handles never ride the closure, matching the reference's
load-once-per-process GPU lifecycle (old_history_utils.py:137-141).
"""

from __future__ import annotations

import hashlib
import json
from typing import Protocol, Sequence


class CompletionBackend(Protocol):
    def complete(self, prompts: Sequence[str]) -> list[str]: ...


class EmbeddingBackend(Protocol):
    def embed(self, texts: Sequence[str]) -> list[list[float]]: ...


def release_backend(backend: object) -> None:
    """Teardown half of the backend protocol: backends MAY define
    ``release()`` to free heavy resources deliberately (GPU memory,
    connection pools) — the engine's form of the reference's explicit
    model free between pipeline stages (utils/old_history_utils.py:
    137-165 deletes the vLLM engine and empties the CUDA cache so the
    NEXT model fits). Backends without one need no teardown; see
    ``llm_ops.release_executor_backends`` for when it runs."""
    rel = getattr(backend, "release", None)
    if callable(rel):
        rel()


_HIGH = set("89abcdef")


def _mock_dim_value(seed: int, text: str) -> float:
    """Deterministic value in [-1, 1] with 1/4 steps: count of
    high-bit hex digits among the first 8 of md5(seed|text)."""
    h = hashlib.md5(f"{seed}|{text}".encode()).hexdigest()[:8]
    return sum(1 for c in h if c in _HIGH) / 4.0 - 1.0


class MockEmbeddingBackend:
    """Deterministic stand-in for mistral-embed / SentenceTransformers
    (M2/M4). dim defaults small; the reference's remote model is
    1024-d float64 (utils/recent_history_utils.py:233)."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def embed(self, texts: Sequence[str]) -> list[list[float]]:
        return [
            [_mock_dim_value(j, t or "") for j in range(self.dim)]
            for t in texts
        ]


class MockCompletionBackend:
    """Deterministic stand-in for the chat model (M1/M3).

    The real LLM's response shape varies — the reference handles a
    single JSON object, MULTIPLE objects in one response, and a JSON
    array of objects, flattening all of them to session rows
    (utils/recent_history_utils.py:125-137). ``mode`` reproduces
    each envelope deterministically so the multi-session parse path
    is oracle-checkable:

    - ``single`` (default): one session object summarizing the whole
      chunk — byte-identical to the historical mock.
    - ``array``: the chunk's (hour, title)-sorted lines split into
      runs of ``sub_size``; ONE ``[...]`` candidate carrying one
      session object per run (the "LLM returned a list" case).
    - ``objects``: the same sessions as ``array`` but emitted as
      SEPARATE ``{...}`` spans with prose between (the "LLM returned
      several objects" case).
    - ``noisy``: ``array`` plus deterministic garbage keyed on
      ``chunk_id % 4`` — 0 appends a wrong-key dict, 1 a ``[1, 2]``
      list (two non-dict objects), 2 a right-key dict with non-HH:MM
      times, 3 falsy/unparseable spans (``{}``/``[]``/bare text)
      that must count as NOTHING — exercising every branch of the
      reference's validity accounting (recent_history_utils.py:
      138-168).

    Every emitted value is a pure function of the prompt text, so a
    SQL oracle replays the whole path exactly.
    """

    def __init__(self, mode: str = "single", sub_size: int = 6):
        if mode not in ("single", "array", "objects", "noisy"):
            raise ValueError(f"unknown mock mode {mode!r}")
        self.mode = mode
        self.sub_size = sub_size

    @staticmethod
    def _session_doc(lines: list[str]) -> dict:
        hours = [ln.split(" ", 1)[0] for ln in lines]
        kinds = sorted({ln.split(" ", 2)[1] for ln in lines if " " in ln})
        return {
            "time_start": min(hours) if hours else None,
            "time_end": max(hours) if hours else None,
            "description": f"{len(lines)} events starting with "
            + (lines[0].split(" ", 2)[1] if lines else "nothing"),
            "interests": kinds,
        }

    def complete(self, prompts: Sequence[str]) -> list[str]:
        out = []
        for p in prompts:
            header, _, body = p.partition("\n---\n")
            meta = dict(
                kv.split("=", 1) for kv in header.split(";") if "=" in kv
            )
            lines = [ln for ln in body.splitlines() if ln.strip()]
            if self.mode == "single":
                doc = self._session_doc(lines)
                out.append(
                    "Here is the summary: "
                    + json.dumps(doc, sort_keys=True)
                )
                continue
            subs = [
                self._session_doc(lines[i : i + self.sub_size])
                for i in range(0, len(lines), self.sub_size)
            ]
            if self.mode == "objects":
                out.append(
                    f"I found {len(subs)} sessions. "
                    + " Next: ".join(
                        json.dumps(d, sort_keys=True) for d in subs
                    )
                )
                continue
            resp = f"Here are {len(subs)} sessions: " + json.dumps(
                subs, sort_keys=True
            )
            if self.mode == "noisy":
                c = int(meta.get("chunk_id", 0)) % 4
                if c == 0:
                    resp += ' also {"foo": 1} appeared'
                elif c == 1:
                    resp += " plus noise [1, 2] here"
                elif c == 2:
                    resp += (
                        ' and {"description": "x", "interests": [], '
                        '"time_end": "9:9", "time_start": "9:9"} trailing'
                    )
                else:
                    resp += " finally {} [] not-json"
            out.append(resp)
        return out


class RateLimiter:
    """Per-worker token bucket (M8). The reference rate-limits with
    AsyncLimiter(5 req/s) per process (utils/recent_history_utils.py:
    101,216); cluster-wide rate = per-task rate × max concurrent
    tasks — cap the stage's task count to bound it."""

    def __init__(self, rate_per_sec: float):
        self.rate = rate_per_sec
        self._next_free = 0.0

    def acquire(self, n: int = 1) -> None:
        import time

        now = time.monotonic()
        start = max(now, self._next_free)
        self._next_free = start + n / self.rate
        delay = start - now
        if delay > 0:
            time.sleep(delay)
