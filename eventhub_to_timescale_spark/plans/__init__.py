from eventhub_to_timescale_spark.plans.adaptive import (  # noqa: F401
    adaptive_mode_bucket_seconds,
    daily_branch_bucket_seconds,
    resolution_bucket_seconds,
    span_seconds,
)
