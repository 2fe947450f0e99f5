"""Pipeline spec → lazy DataFrame plan (the reference's YAML config
shape compiled onto Catalyst)."""

from connect_spark.plans.pipeline import Pipeline, build_pipeline

__all__ = ["Pipeline", "build_pipeline"]
