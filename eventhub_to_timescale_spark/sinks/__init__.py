from eventhub_to_timescale_spark.sinks.conditions import (  # noqa: F401
    records_to_conditions,
    write_conditions_parquet,
    write_conditions_jdbc,
)
