from eventhub_to_timescale_spark.sources.testdata import (  # noqa: F401
    events_as_conditions,
    load_table,
)
