"""Runtime Bloom-filter semi-join pruning: Spark injects a
``might_contain(bloom, xxhash64(key))`` filter on the FACT side of a
shuffle join when the other side is selective — the engine-native
version of the sideways-information-passing a 100 TB star join needs
(the probe scan drops non-matching rows before the exchange).

The trigger conditions are size thresholds
(``runtime.bloomFilter.applicationSideScanSizeThreshold`` defaults to
10 GB — i.e. production fact scans qualify automatically; a local
test must lower it to witness the plan). This pin proves the engine
configuration path works and that our join shapes are eligible: a
regression that restructures ``shipmode_priority_mix``'s join into a
form Spark can't inject into fails here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_selective_dim_injects_bloom_on_fact_scan(bloom_conf, tmp_path):
    spark = bloom_conf
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan
    # the filter sits on the lineitem (application) side scan branch
    fact_side = plan[plan.find("might_contain"):]
    assert "l_orderkey" in plan[: plan.find("might_contain") + 400]


def test_q12_shape_is_bloom_eligible(bloom_conf):
    from eventhub_to_timescale_spark.operators.relational import (
        shipmode_priority_mix,
    )

    spark = bloom_conf
    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").filter(
        F.col("o_orderpriority").isin("1-URGENT")
    )
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    plan = (
        shipmode_priority_mix(o, li)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "might_contain" in plan
