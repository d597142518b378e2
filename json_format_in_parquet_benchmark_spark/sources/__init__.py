"""Sources and sinks: NDJSON scan (raw + schema-inferred), Parquet ZSTD
sink/scan wrappers."""

from .ndjson import read_ndjson_parsed, read_ndjson_raw  # noqa: F401
