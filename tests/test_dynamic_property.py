"""Property-based differential test: the dynamic flatten vs an
independent Python model of the reference's semantics
(``recursively_deserialize`` helpers.py:112-127 +
``create_record_recursive`` timeseries.py:43-98, re-implemented here
from the spec, not copied).

Hypothesis generates arbitrary nested payloads — dicts, scalars,
lists, JSON-encoded-string subtrees — and the engine's leaf records
must match the model's (key, value, type) multiset exactly. Value
comparison is by type: numbers numerically (text renderings may
differ in exponent form), everything else exactly.

Known representational exclusions: strings that jsonparse to scalars
with non-minimal renderings ("1.50") are not generated — the engine
keeps the original text where json.loads canonicalizes. Keys have no
restrictions: quotes, spaces and even the empty string are generated
(the root sentinel is NULL, not "").
"""

from __future__ import annotations

import json
import math

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

KEYS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_.-'\" $", min_size=0, max_size=8
)

_SCALAR = st.one_of(
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(alphabet="abcdefghij XYZ", max_size=12),
    st.none(),
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=16),
        min_size=0,
        max_size=3,
    ),
)


def _payloads(depth: int):
    if depth == 0:
        return _SCALAR
    sub = _payloads(depth - 1)
    node = st.dictionaries(KEYS, sub, max_size=4)
    # sometimes a subtree arrives as a JSON-encoded STRING — the
    # recursively_deserialize case
    packed = node.map(lambda d: json.dumps(d, separators=(",", ":")))
    return st.one_of(_SCALAR, node, packed)


PAYLOAD = st.dictionaries(KEYS, _payloads(3), min_size=0, max_size=5)


def _rd(item):
    """Model of reference recursively_deserialize."""
    if isinstance(item, dict):
        return {k: _rd(v) for k, v in item.items()}
    if isinstance(item, list):
        return [_rd(v) for v in item]
    if not isinstance(item, str):
        return item
    try:
        return _rd(json.loads(item))
    except (json.JSONDecodeError, ValueError):
        return item


def _model_leaves(payload, ignore=(), prefix=None):
    """Model of reference create_record_recursive over the
    deserialized payload, with this engine's documented divergences:
    null leaves drop (reference raises) and non-geo lists tag string
    (reference raises)."""
    out = []

    def walk(node):
        for k, v in node.items():
            if k in ignore:
                continue
            if isinstance(v, dict):
                walk(v)
                continue
            name = f"{prefix}_{k}" if prefix else k
            if v is None:
                continue
            if isinstance(v, bool):
                out.append((name, "boolean", "true" if v else "false"))
            elif isinstance(v, (int, float)):
                out.append((name, "number", v))
            elif isinstance(v, list):
                ok = len(v) == 2 and all(
                    isinstance(x, (int, float)) and not isinstance(x, bool)
                    for x in v
                )
                out.append(
                    (name, "geography" if ok else "string", [float(x) for x in v])
                    if ok
                    else (name, "string", v)
                )
            else:
                out.append((name, "string", v))

    walk(_rd(payload))
    return out


def _norm(kind, raw):
    if kind == "number":
        return float(raw)
    if kind in ("geography",):
        return [float(x) for x in json.loads(raw)]
    if isinstance(raw, str) and raw.startswith("["):
        # non-geo list leaf: get_json_object re-renders the extracted
        # subtree (Jackson style, e.g. 2.4E-7 vs 2.4e-07) — compare
        # numerically, not textually
        try:
            return [float(x) for x in json.loads(raw)]
        except (ValueError, TypeError):
            return raw
    return raw


# One Spark action per BATCH of generated payloads, not per payload:
# the depth-6 flatten expression tree costs ~2 s of analysis +
# interpreted evaluation per action, so 25 one-row actions was ~50 s
# of pure per-action overhead (measured).  3 examples × ≤25 payloads
# keeps the generated-case volume while shrinking still works (the
# list strategy shrinks element-wise).
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    payloads=st.lists(PAYLOAD, min_size=1, max_size=25)
)
def test_dynamic_flatten_matches_reference_model(spark_session, payloads):
    from pyspark.sql import functions as F  # noqa: F401

    from eventhub_to_timescale_spark.ingest.dynamic import flatten_payload_dynamic

    df = spark_session.createDataFrame(
        [
            (i, json.dumps(p, separators=(",", ":")))
            for i, p in enumerate(payloads)
        ],
        "pid int, payload string",
    )
    rows = flatten_payload_dynamic(df, "payload").collect()
    for i, payload in enumerate(payloads):
        got = sorted(
            (
                r.measurement_of,
                r.measurement_data_type,
                repr(_norm(r.measurement_data_type, r.measurement_value)),
            )
            for r in rows
            if r.pid == i
        )
        want_raw = _model_leaves(payload)
        want = sorted(
            (
                name,
                kind,
                repr(
                    float(v)
                    if kind == "number"
                    else (
                        [float(x) for x in v]
                        if kind == "geography" or isinstance(v, list)
                        else v
                    )
                ),
            )
            for (name, kind, v) in want_raw
        )
        assert got == want, payload


@pytest.fixture(scope="module")
def spark_session(spark):
    return spark
