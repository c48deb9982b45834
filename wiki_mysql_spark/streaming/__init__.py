from wiki_mysql_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
)

__all__ = ["read_events_stream", "run_stream_to_memory"]
