from .backends import (
    CompletionBackend,
    EmbeddingBackend,
    MockCompletionBackend,
    MockEmbeddingBackend,
)
from .llm_ops import embed_text, summarize_chunks

__all__ = [
    "CompletionBackend",
    "EmbeddingBackend",
    "MockCompletionBackend",
    "MockEmbeddingBackend",
    "embed_text",
    "summarize_chunks",
]
