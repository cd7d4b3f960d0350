from .ingest import streaming_extract  # noqa: F401
