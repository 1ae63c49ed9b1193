"""Oracle-authoring type contract (r9 lesson, VERDICT r9 ask #6).

The driver's value hasher is TYPE-TAGGED: it normalizes integer widths
up to 64 bits (bigint-vs-int passes) but tags DuckDB HUGEINT (int128,
what an un-CAST ``SUM(int)`` returns) differently from Spark's bigint,
and its pandas canonicalizer crashes outright on list/struct cells
("unhashable type: 'list'", the r9 ``emb_random_projection`` red row).
So the authoring contract is: NO oracle may ship a HUGEINT, DECIMAL,
array, struct, or map output column — ``CAST(SUM(...) AS BIGINT)``,
and explode/serialize arrays on both sides of the gate wrapper.

This test walks every ``oracle_sql()`` entry and asserts the contract
via ``con.sql(q).types`` — binding only, no execution, so the whole
sweep is cheap.  It fails on revert of the r10 CAST fixes at
relational.py (shipmode), trending.py (journey trigrams),
substrdup.py (span removal), and on re-introduction of array-valued
gate wrappers (embeddings).
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _banned(type_str: str) -> str | None:
    """Return the violation label for a DuckDB result type, or None.

    Mirrors scripts/check_parity.py:duck_class — any change here must
    land there too (that harness is the full-gate rehearsal; this test
    is the cheap always-on contract pin).
    """
    u = str(type_str).upper()
    if "[]" in u or u.startswith(("LIST", "STRUCT", "MAP", "UNION")):
        return f"complex type {u} (driver _canon cannot hash list cells)"
    if u in ("HUGEINT", "UHUGEINT"):
        return f"{u} (un-CAST integer SUM — wrap in CAST(... AS BIGINT))"
    if u.startswith("DECIMAL"):
        return f"{u} (driver type tag differs from Spark double/bigint)"
    return None


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _oracle_items():
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
    return sorted(entrymod.oracle_sql().items())


@pytest.mark.parametrize(
    "name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()]
)
def test_oracle_ships_no_banned_types(duck, name, sql):
    rel = duck.sql(sql)  # binds (types resolved); nothing is executed
    violations = [
        f"{col}: {reason}"
        for col, t in zip(rel.columns, rel.types)
        if (reason := _banned(t)) is not None
    ]
    assert not violations, (
        f"oracle '{name}' ships driver-unhashable output column(s):\n  "
        + "\n  ".join(violations)
    )
