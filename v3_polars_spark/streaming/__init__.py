from .ingest_stream import run_available_now, stream_table, streaming_resample

__all__ = ["run_available_now", "stream_table", "streaming_resample"]
