"""State backends (SURVEY.md §2.I caches/buffers)."""

from connect_spark.state.cache import ParquetKVCache, TwoLevelKVCache

__all__ = ["ParquetKVCache", "TwoLevelKVCache"]
