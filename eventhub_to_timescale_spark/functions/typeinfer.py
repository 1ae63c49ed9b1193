"""Value-type inference: leaf JSON value → PayloadType tag.

Mirrors the reference's ``get_record_type`` (timeseries.py:101-126)
semantics as a single codegen'd ``when/otherwise`` chain over the raw
string rendering of a JSON leaf:

- boolean is checked BEFORE number — the reference does this because
  Python ``bool`` subclasses ``int`` (timeseries.py:116); for us it
  means the literal tokens ``true``/``false`` are booleans even though
  they are not numeric anyway, and the check order is preserved for
  parity.
- a 2-element numeric array is GEOGRAPHY (timeseries.py:120-124).
- numerics (int or float rendering) are NUMBER.
- anything else is STRING (the reference raises TypeError for
  non-scalar leaves; in a distributed plan unknown shapes are tagged
  STRING and can be filtered on an error channel instead of killing
  the job).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.schema import (
    TYPE_BOOLEAN,
    TYPE_GEOGRAPHY,
    TYPE_NUMBER,
    TYPE_STRING,
)

_NUMERIC_RE = r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"
_GEO_RE = (
    r"^\[\s*-?\d+(\.\d+)?([eE][+-]?\d+)?\s*,"
    r"\s*-?\d+(\.\d+)?([eE][+-]?\d+)?\s*\]$"
)


def infer_type_tag(raw: Column) -> Column:
    """Raw JSON-leaf text (as produced by ``get_json_object`` /
    ``to_json``) → type tag column."""
    s = F.trim(raw.cast("string"))
    return (
        F.when(s.isNull(), F.lit(TYPE_STRING))
        .when(F.lower(s).isin("true", "false"), F.lit(TYPE_BOOLEAN))
        .when(s.rlike(_NUMERIC_RE), F.lit(TYPE_NUMBER))
        .when(s.rlike(_GEO_RE), F.lit(TYPE_GEOGRAPHY))
        .otherwise(F.lit(TYPE_STRING))
    )
