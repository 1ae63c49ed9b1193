from eventhub_to_timescale_spark.ingest.envelope import (  # noqa: F401
    parse_envelope,
    with_correlation_id,
)
from eventhub_to_timescale_spark.ingest.glow import glow_to_records  # noqa: F401
from eventhub_to_timescale_spark.ingest.homie import homie_to_records  # noqa: F401
from eventhub_to_timescale_spark.ingest.emon import emon_to_records  # noqa: F401
from eventhub_to_timescale_spark.ingest.bmw import bmw_to_records  # noqa: F401
from eventhub_to_timescale_spark.ingest.router import route_to_records  # noqa: F401
from eventhub_to_timescale_spark.ingest.records import (  # noqa: F401
    parse_record_batches,
    parse_record_messages,
    validate_records,
)
