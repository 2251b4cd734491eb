"""Streaming & resumable execution: checkpointed micro-batch runner
(Structured Streaming foreachBatch) and an Iceberg-style manifest-commit
batch runner with per-partition lineage + metrics."""

from .runner import ResumableExtractJob, stream_extract

__all__ = ["ResumableExtractJob", "stream_extract"]
