"""Structured Streaming inference (SURVEY.md §2.9, §3.3)."""

from feature_store_test_spark.streaming.inference import InferencePipeline

__all__ = ["InferencePipeline"]
