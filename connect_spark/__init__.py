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

__all__ = ["get_spark", "stop_spark", "load_tables", "register_views"]

__version__ = "0.1.0"
