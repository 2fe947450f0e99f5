"""Source adapters (SURVEY.md §2.D) onto spark.read / readStream."""

from connect_spark.sources.files import read_file_messages, stream_files
from connect_spark.sources.kafka import kafka_reader_options, kafka_source
from connect_spark.sources.cdc import snapshot_jdbc_plan

__all__ = [
    "read_file_messages",
    "stream_files",
    "kafka_reader_options",
    "kafka_source",
    "snapshot_jdbc_plan",
]
