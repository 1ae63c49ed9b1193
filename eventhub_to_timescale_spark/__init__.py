"""PySpark-native analytics engine with the query and data-processing
capabilities of mnbf9rca/eventhub-to-timescale.

A brand-new Spark-first design (NOT a port): the reference's Azure
Functions + TimescaleDB pipeline (reference: /root/reference) is
re-expressed as declarative DataFrame plans —

- ingest:     envelope ``from_json`` → publisher routing → per-publisher
              converter (projection + unpivot) → canonical atomic-record
              DataFrame (``schema.ATOMIC_RECORD_SCHEMA``)
- sink:       long→wide pivot into the ``conditions`` hypertable shape,
              parquet ``partitionBy(date)`` (≙ hypertable chunking) or JDBC
- queries:    the reference's 8 plpgsql table functions (SURVEY.md §2.3
              Q1–Q9) as parameterized DataFrame-returning functions
- streaming:  Structured Streaming wiring with watermarks + keyed dedup
- llm ops:    dedup / similarity-search / text-analysis / multimodal
              operators for large-scale training-data pipelines
"""

__version__ = "0.1.0"

from eventhub_to_timescale_spark.session import get_spark  # noqa: F401
