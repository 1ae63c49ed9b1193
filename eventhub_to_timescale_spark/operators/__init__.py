from eventhub_to_timescale_spark.operators.timeseries import (  # noqa: F401
    aggregated_by_interval,
    aggregated_data,
    aggregated_by_day,
    most_frequent_value,
    unique_subjects,
    changed_rows,
    state_intervals,
)
from eventhub_to_timescale_spark.operators.timeweight import (  # noqa: F401
    time_weighted_average,
)
from eventhub_to_timescale_spark.operators.asap import asap_smooth  # noqa: F401
