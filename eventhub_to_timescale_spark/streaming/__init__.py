from eventhub_to_timescale_spark.streaming.pipeline import (  # noqa: F401
    dedup_stream,
    read_raw_stream,
    stream_to_conditions,
    streaming_bucket_avg,
    write_conditions_stream,
)
