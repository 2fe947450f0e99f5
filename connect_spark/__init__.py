"""connect_spark — a PySpark-native engine with the query and
data-processing capabilities of redpanda-data/connect (Benthos lineage).

Everything here is built on public Apache Spark APIs. Pipelines are lazy
DataFrame plans: processors are ``DataFrame -> DataFrame`` transforms,
the Bloblang scalar surface maps onto ``pyspark.sql.functions`` Column
builders, and streaming semantics map onto Structured Streaming.

Reference parity citations in docstrings point into the read-only
reference checkout (redpanda-data/connect) as ``path:line``.
"""

from connect_spark.session import get_spark, stop_spark
from connect_spark.catalog import load_tables, register_views


def build_pipeline(spark, config, env=None):
    """Build a pipeline from a config dict / YAML text / file path
    (lazy import keeps bare-package import light)."""
    from connect_spark.plans.pipeline import build_pipeline as _bp

    return _bp(spark, config, env=env)


__all__ = [
    "get_spark", "stop_spark", "load_tables", "register_views",
    "build_pipeline",
]

__version__ = "0.1.0"
