from .sessions import streaming_session_counts

__all__ = ["streaming_session_counts"]
