"""Scalar column functions (the §2.4 function surface).

All JVM-side Column expressions — no Python UDFs — so every use stays
inside whole-stage codegen and is eligible for predicate pushdown /
constant folding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Valid epoch-seconds range accepted by the reference
# (helpers.py:81-83): 0 .. 253402300799 (9999-12-31T23:59:59Z).
EPOCH_MIN = 0
EPOCH_MAX = 253402300799


def parse_timestamp_any(col: Column) -> Column:
    """Normalize a heterogeneous timestamp value to ``TimestampType``.

    Accepts epoch seconds (int/float, range-checked like reference
    helpers.py:78-95) or an ISO-8601-ish parseable string. Out-of-range
    epochs and unparseable strings yield NULL (error-channel semantics:
    the reference raises per record; a distributed plan filters).
    """
    s = col.cast("string")
    # A value that is entirely numeric (fractional/scientific allowed —
    # JSON re-rendering may produce 1.7E9 forms) is an epoch.
    is_epoch = s.rlike(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")
    epoch = s.try_cast("double")
    epoch_ok = is_epoch & epoch.between(float(EPOCH_MIN), float(EPOCH_MAX))
    # round (not truncate) to the nearest microsecond — matches CPython
    # datetime.fromtimestamp, which the reference's formatter uses
    # (helpers.py:83). epoch*1e6 is integer-exact in double up to 2^53
    # (≈ year 2255); beyond that the microsecond part degrades, which
    # the source double couldn't represent anyway
    micros = F.round(epoch * F.lit(1_000_000.0)).cast("long")
    return (
        F.when(epoch_ok, F.timestamp_micros(micros))
        .when(is_epoch, F.lit(None).cast("timestamp"))
        .otherwise(F.to_timestamp(s))
    )


def iso_utc_string(ts: Column) -> Column:
    """TimestampType → reference's canonical `%Y-%m-%dT%H:%M:%S.%fZ`
    string (helpers.py:83,89) for sink/interop edges only.

    Renders the instant's UTC wall time regardless of the session
    timezone — ``date_format`` alone renders session-local time, which
    under a non-UTC host session would pair local wall clock with a
    literal 'Z' and shift every consumed timestamp by the offset.

    Known edge: ``to_utc_timestamp`` treats its input as wall time in
    the given zone, so an instant whose session-local rendering falls
    inside a DST transition window is shifted by the DST delta for
    that one hour per year. The engine's own sessions pin UTC
    (ensure_session_confs), where the edge cannot occur; only a
    foreign non-UTC session during a transition hour is affected."""
    utc = F.to_utc_timestamp(ts, F.current_timezone())
    return F.date_format(utc, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")


def parse_bool(col: Column) -> Column:
    """Boolean coercion: real booleans, or case-insensitive
    'true'/'yes'/'on' ↔ 'false'/'no'/'off' strings (superset of
    reference timescale.py:196-205, which only accepts true/false —
    but its callers' bool() made EVERY non-empty string truthy, so
    'no' meant True there; the documented narrowing maps negative
    words to False and routes anything else → NULL → reject
    channel)."""
    s = F.lower(F.trim(col.cast("string")))
    return (
        F.when(s.isin("true", "yes", "on"), F.lit(True))
        .when(s.isin("false", "no", "off"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def wkt_point(lat: Column, lon: Column) -> Column:
    """(lat, lon) → WKT ``SRID=4326;POINT(lon lat)`` — lon FIRST in the
    output (reference timescale.py:270) with range validation
    lat∈[-90,90], lon∈[-180,180] (timescale.py:260-263); out-of-range →
    NULL.

    Documented rendering divergence: JVM double→string uses Java
    ``Double.toString``, which switches to scientific notation below
    1e-3 ("5.0E-4") where Python's str() keeps "0.0005" — coordinate
    bytes can differ from the reference for sub-milli-degree values
    (~100 m precision region; none occur in the goldens). Consumers
    parsing WKT numerically are unaffected."""
    ok = lat.between(-90.0, 90.0) & lon.between(-180.0, 180.0)
    # %s of a double renders shortest-repr like Python's str(float).
    return F.when(
        ok, F.format_string("SRID=4326;POINT(%s %s)", lon, lat)
    ).otherwise(F.lit(None).cast("string"))


def topic_part(topic: Column, index: int) -> Column:
    """N-th '/'-separated topic segment; negative indexes from the end
    (reference splits topics with str.split, json_converter.py:168,
    helpers.py:17, homie.py:63-65)."""
    parts = F.split(topic, "/")
    return F.element_at(parts, index)


def topic_publisher(topic: Column) -> Column:
    """First topic segment = publisher (reference json_converter.py:168)."""
    return topic_part(topic, 1)


def topic_subject(topic: Column) -> Column:
    """Last topic segment = candidate measurement subject
    (reference helpers.py:17)."""
    return topic_part(topic, -1)


def portable_hash32(col: Column, seed: str = "") -> Column:
    """Deterministic 32-bit unsigned hash that DuckDB can reproduce:
    first 8 hex chars of md5(seed || value) as a BIGINT.

    Used by MinHash/SimHash so the DuckDB oracle can compute an
    identical value: ``CAST(('0x'||substr(md5(s),1,8)) AS BIGINT)``.
    md5 is JVM-side (no UDF); at scale this is one codegen'd expression
    per row.
    """
    payload = F.concat(F.lit(seed), col.cast("string")) if seed else col.cast("string")
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")


def epoch_bucket(ts: Column, bucket_seconds: Column | int | float) -> Column:
    """Tumbling-window bucket start: epoch-floor arithmetic
    ``timestamp_seconds(floor(epoch/W)*W)``.

    Equivalent to TimescaleDB ``time_bucket(interval, ts)`` for
    origin-aligned buckets (reference
    db/get_aggregated_data_by_interval.sql:15) and portable to the
    DuckDB oracle as the same arithmetic. Stays in codegen — unlike
    ``window()`` it yields a flat column, which keeps groupBy keys
    cheap."""
    if not isinstance(bucket_seconds, Column):
        bucket_seconds = F.lit(float(bucket_seconds))
    epoch = F.unix_micros(ts) / F.lit(1_000_000.0)
    return F.timestamp_seconds(
        F.floor(epoch / bucket_seconds) * bucket_seconds
    )
