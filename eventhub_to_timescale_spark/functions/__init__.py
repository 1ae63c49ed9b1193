from eventhub_to_timescale_spark.functions.scalars import (  # noqa: F401
    epoch_bucket,
    iso_utc_string,
    parse_bool,
    parse_timestamp_any,
    portable_hash32,
    topic_part,
    topic_publisher,
    topic_subject,
    wkt_point,
)
from eventhub_to_timescale_spark.functions.typeinfer import (  # noqa: F401
    infer_type_tag,
)
