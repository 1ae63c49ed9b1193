"""Spark-side gate output type contract — the twin of
tests/test_oracle_types.py (which pins the DuckDB side).

The driver's correctness gate canonicalizes every ``queries()``
result through pandas; list/struct/map cells crash it with
"unhashable type: 'list'" (the r9 ``emb_random_projection`` red row),
and decimal columns would type-tag differently from the oracle's
double/bigint.  So the authoring contract is: no registry entry may
RETURN an array, map, struct, or decimal output column — array-valued
operators stay array-valued for real callers, but their registry
wrappers posexplode (or serialize) to scalar rows.

Schema resolution is lazy (no job runs), so walking all entries costs
plan analysis only.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _names():
    return list(entrymod.queries())


@pytest.mark.parametrize("name", _names())
def test_gate_entry_ships_no_complex_output(spark, name):
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    fn = entrymod.queries()[name]
    schema = fn(spark, SF_DIR).schema  # analysis only — nothing executes
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType, DecimalType))
    ]
    assert not bad, (
        f"registry entry '{name}' returns driver-unhashable column(s) "
        f"(posexplode/serialize in the wrapper): {bad}"
    )
