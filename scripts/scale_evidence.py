"""Scale-evidence harness (VERDICT r1 #7): measure how every contract
query scales from sf0.1 to a synthesized 10× dataset ("sf1").

No sf1 parquet ships in this environment, so the harness builds one
under /tmp by replicating sf0.1 ten times with shifted identities:

- events: event_id += i*(max+1), user_id += i*(users) — new users, so
  per-user density stays constant (the generator's own scaling rule)
  while total volume grows 10×; ts stays nanos-encoded like the
  driver's files.
- documents: doc_id shifted; a per-copy suffix token keeps copies
  from being exact duplicates (identical clones would inflate
  near-dup candidate pairs ~100× — an input artifact, not engine
  scaling).
- embeddings: id shifted; the vector is circularly rotated by the
  copy index — norm and distribution preserved, clones decorrelated.

Then each query from ``__spark_entry__.queries()`` runs at both scales
(cold once, then warm min-of-2) and the scaling exponent
``log10(t_sf1/t_sf01)`` is reported: 1.0 = linear, <1 sub-linear
(fixed overheads amortizing), >1 super-linear (flag).

Usage: python scripts/scale_evidence.py [out.json] [--rebuild] [query ...]
(query names restrict the run; results for a restricted run should be
merged into SCALE_SF1.json rather than replacing it)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from eventhub_to_timescale_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
SCALED = "/tmp/spark_graft_sf1"
COPIES = 10


def build_scaled(spark) -> None:
    from eventhub_to_timescale_spark.sources.testdata import ensure_session_confs

    ensure_session_confs(spark)
    os.makedirs(SCALED, exist_ok=True)

    # events — keep ts as raw nanos long exactly like the driver files
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    mx = ev.agg(
        F.max("event_id").alias("e"), F.max("user_id").alias("u")
    ).collect()[0]
    copies = []
    for i in range(COPIES):
        copies.append(
            ev.select(
                (F.col("event_id") + i * (mx.e + 1)).alias("event_id"),
                F.col("ts"),
                (F.col("user_id") + i * (mx.u + 1)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(f"{SCALED}/events.parquet")

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    dmax = docs.agg(F.max("doc_id").alias("d")).collect()[0].d
    dcopies = []
    for i in range(COPIES):
        dcopies.append(
            docs.select(
                (F.col("doc_id") + i * (dmax + 1)).alias("doc_id"),
                *[
                    (
                        F.concat(F.col(c), F.lit(f" c{i}")).alias(c)
                        if c == "text"
                        else F.col(c)
                    )
                    for c in docs.columns
                    if c != "doc_id"
                ],
            )
        )
    dout = dcopies[0]
    for c in dcopies[1:]:
        dout = dout.unionByName(c)
    dout.repartition(32).write.mode("overwrite").parquet(
        f"{SCALED}/documents.parquet"
    )

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    id_col, vec = "vec_id", "embedding"
    emax = emb.agg(F.max(id_col).alias("m")).collect()[0].m
    ecopies = []
    for i in range(COPIES):
        rot = (
            F.col(vec)
            if i == 0
            else F.concat(
                F.slice(F.col(vec), i + 1, 10_000), F.slice(F.col(vec), 1, i)
            )
        )
        ecopies.append(
            emb.select(
                (F.col(id_col) + i * (emax + 1)).alias(id_col),
                rot.alias(vec),
                *[c for c in emb.columns if c not in (id_col, vec)],
            )
        )
    eout = ecopies[0]
    for c in ecopies[1:]:
        eout = eout.unionByName(c)
    eout.repartition(32).write.mode("overwrite").parquet(
        f"{SCALED}/embeddings.parquet"
    )

    # star-schema facts: replicate orders + lineitem 10× with shifted
    # order keys (same customers — fact growth against a fixed dim set,
    # the realistic 100 TB shape for the relational queries)
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    omax = orders.agg(F.max("o_orderkey").alias("m")).collect()[0].m
    ocopies = [
        orders.select(
            (F.col("o_orderkey") + i * (omax + 1)).alias("o_orderkey"),
            *[c for c in orders.columns if c != "o_orderkey"],
        )
        for i in range(COPIES)
    ]
    oout = ocopies[0]
    for c in ocopies[1:]:
        oout = oout.unionByName(c)
    oout.repartition(32).write.mode("overwrite").parquet(
        f"{SCALED}/orders.parquet"
    )
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    lcopies = [
        li.select(
            (F.col("l_orderkey") + i * (omax + 1)).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        for i in range(COPIES)
    ]
    lout = lcopies[0]
    for c in lcopies[1:]:
        lout = lout.unionByName(c)
    lout.repartition(32).write.mode("overwrite").parquet(
        f"{SCALED}/lineitem.parquet"
    )

    # dimensions pass through unscaled (fixed-cardinality at any SF)
    for t in ("region", "nation", "customer", "supplier", "part"):
        src = f"{BASE}/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                f"{SCALED}/{t}.parquet"
            )


def time_query(fn, spark, sf_dir) -> tuple[float, float, int]:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = df.count()
    cold = time.perf_counter() - t0
    warms = []
    for _ in range(2):
        t1 = time.perf_counter()
        df.count()
        warms.append(time.perf_counter() - t1)
    return cold, min(warms), n


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_evidence.json"
    rebuild = "--rebuild" in sys.argv
    only = {a for a in sys.argv[2:] if not a.startswith("--")}

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="scale-evidence")
    spark.sparkContext.setLogLevel("ERROR")
    if rebuild or not os.path.exists(f"{SCALED}/events.parquet"):
        print("building scaled dataset ...", file=sys.stderr)
        build_scaled(spark)

    results = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        # release the previous query's caller-owned operator caches
        # (same contract note as bench.py / check_parity.py)
        spark.catalog.clearCache()
        try:
            c0, w0, n0 = time_query(fn, spark, BASE)
            c1, w1, n1 = time_query(fn, spark, SCALED)
            exponent = (
                round(math.log10(max(w1, 1e-3) / max(w0, 1e-3)), 2)
                if w0 > 0
                else None
            )
            results[name] = {
                "sf0.1_warm_s": round(w0, 3),
                "sf1_warm_s": round(w1, 3),
                "ratio": round(w1 / w0, 2) if w0 > 0 else None,
                "exponent": exponent,
                "rows": [n0, n1],
            }
            print(
                f"{name}: {w0:.2f}s -> {w1:.2f}s  ratio {results[name]['ratio']}"
                f"  exp {exponent}  rows {n0}->{n1}",
                file=sys.stderr,
            )
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
            print(f"{name}: ERROR {e}", file=sys.stderr)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    flagged = {
        k: v
        for k, v in results.items()
        if isinstance(v.get("exponent"), float) and v["exponent"] > 1.15
    }
    print(json.dumps({"out": out_path, "super_linear": sorted(flagged)}))


if __name__ == "__main__":
    main()
