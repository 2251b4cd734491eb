"""Plans: SparkSession construction + job/pipeline configuration."""

from .session import build_session, PipelineConfig

__all__ = ["build_session", "PipelineConfig"]
