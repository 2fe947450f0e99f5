"""Format/parsing function surface (SURVEY.md §2.F) beyond what the
Bloblang method registry covers."""

from connect_spark.functions.formats import (
    compress_udf,
    decompress_udf,
    grok_extract,
    parse_syslog,
    text_chunks,
)

__all__ = [
    "compress_udf",
    "decompress_udf",
    "grok_extract",
    "parse_syslog",
    "text_chunks",
]
