"""Portable Bloom-filter membership sketch (Bloom 1970, CACM 13(7)).

The missing member of the sketch family (HLL = distinct count, CMS =
frequency, KMV = overlap, GK = quantiles — this = set MEMBERSHIP):
"is this key possibly in the reference set?" with one-sided error,
the primitive behind decontamination pre-filters, dedup candidate
pruning and semi-join pushdown (Spark's own runtime row-group
filtering uses exactly this shape; the reference's duplicate_check
table answers the same question exactly, at exact-storage cost).

Portability contract (same rule as every sketch here): the k bit
positions are ``portable_hash32(key, 'bloom{i}:') % m`` — the repo's
md5-derived 32-bit hash — so the DuckDB oracle sets and probes
EXACTLY the same bits and the verdict frame matches bit-for-bit.  No
engine-native bloom_filter_agg (its hash is an engine detail).

Plan shape, 100 TB posture:

- BUILD: one projection fans each reference key to its k positions,
  one DISTINCT collapses them to the ≤ m set bits — map-side
  combinable, output bounded by m (2^20 default ⇒ at most ~1M rows of
  one int each) regardless of corpus size.  At deployment scale this
  frame is broadcastable (m bits = 128 KiB as a bitmap; the frame
  form keeps the plan engine-checkable here).
- PROBE: each probe key fans to its k positions, LEFT-joins the bit
  frame on the position (equi-join on a ≤ m key space — never a
  scan), and a key is a MAYBE iff all k positions hit: groupBy(key)
  count(hit) == k.  The exact verdict (for false-positive accounting)
  is one more left-semi join against the reference keys.
- Both shuffles key on bounded spaces (position space m, then the
  probe keys); nothing is ever corpus × corpus.

False-positive math, stated so the defaults are auditable: with n
reference keys, FP rate ≈ (1 − e^{−kn/m})^k; the m=2^20, k=4 default
holds ~1% at n ≈ 100k.  Size m for the deployment's n — the operator
takes both as knobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.functions.scalars import portable_hash32

__all__ = [
    "bloom_bits",
    "bloom_probe",
    "bloom_probe_oracle_sql",
    "bloom_seen_verdicts",
    "bloom_seen_oracle_sql",
]

_DEFAULT_M = 1 << 20
_DEFAULT_K = 4


def _positions(key_col, m: int, k: int):
    """Array of the k bit positions for a key — one md5 per hash
    function, all JVM-side expression work."""
    return F.array(
        *[
            (portable_hash32(key_col, f"bloom{i}:") % m).cast("long")
            for i in range(k)
        ]
    )


def bloom_bits(
    ref: DataFrame,
    key_col: str = "key",
    m: int = _DEFAULT_M,
    k: int = _DEFAULT_K,
) -> DataFrame:
    """→ (pos): the DISTINCT set bits of the Bloom filter over the
    reference frame's keys.  Bounded by m rows."""
    if m < 2 or k < 1:
        raise ValueError(f"need m ≥ 2 and k ≥ 1, got {m}, {k}")
    return (
        ref.filter(F.col(key_col).isNotNull())
        .select(
            F.explode(_positions(F.col(key_col), m, k)).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    ref: DataFrame,
    probe: DataFrame,
    ref_key: str = "key",
    probe_key: str = "key",
    m: int = _DEFAULT_M,
    k: int = _DEFAULT_K,
) -> DataFrame:
    """Probe every distinct key of ``probe`` against the Bloom filter
    built from ``ref`` → (key, bloom_maybe, actual), ordered by key.

    ``bloom_maybe`` = all k positions set (the sketch's answer);
    ``actual`` = exact membership (one semi-join) — so the frame IS
    the false-positive audit: rows with bloom_maybe AND NOT actual are
    the FPs, and bloom_maybe is NEVER false when actual is true (the
    one-sided guarantee a test pins)."""
    bits = bloom_bits(ref, key_col=ref_key, m=m, k=k)
    keys = (
        probe.filter(F.col(probe_key).isNotNull())
        .select(F.col(probe_key).cast("string").alias("key"))
        .distinct()
    )
    fan = keys.select(
        "key", F.explode(_positions(F.col("key"), m, k)).alias("pos")
    )
    # bits is ≤ m rows of one long (m=2^20 ⇒ ~8 MB) — broadcast it so
    # the k×|probe| fan never shuffles; the groupBy(key) then
    # repartitions only the probe keys, map-side combined.
    hits = (
        fan.join(
            F.broadcast(bits.withColumn("_hit", F.lit(1))), "pos", "left"
        )
        .groupBy("key")
        .agg((F.count("_hit") == k).alias("bloom_maybe"))
    )
    truth = (
        ref.filter(F.col(ref_key).isNotNull())
        .select(F.col(ref_key).cast("string").alias("key"))
        .distinct()
        .withColumn("_true", F.lit(True))
    )
    return (
        hits.join(truth, "key", "left")
        .select(
            "key",
            "bloom_maybe",
            F.coalesce("_true", F.lit(False)).alias("actual"),
        )
        .orderBy("key")
    )


def bloom_probe_oracle_sql(
    ref_sql: str,
    probe_sql: str,
    m: int = _DEFAULT_M,
    k: int = _DEFAULT_K,
) -> str:
    """DuckDB rendering: same md5-derived positions, same all-k-hits
    rule, same exact-membership join.  ``ref_sql`` / ``probe_sql``
    must each yield one ``key`` column."""
    pos_exprs = ", ".join(
        f"CAST(('0x' || substr(md5('bloom{i}:' || key), 1, 8)) AS BIGINT)"
        f" % {m}"
        for i in range(k)
    )
    return f"""
WITH ref_keys AS (
  SELECT DISTINCT CAST(key AS VARCHAR) AS key FROM ({ref_sql})
  WHERE key IS NOT NULL
),
probe_keys AS (
  SELECT DISTINCT CAST(key AS VARCHAR) AS key FROM ({probe_sql})
  WHERE key IS NOT NULL
),
bits AS (
  SELECT DISTINCT unnest([{pos_exprs}]) AS pos FROM ref_keys
),
fan AS (
  SELECT key, unnest([{pos_exprs}]) AS pos FROM probe_keys
),
hits AS (
  SELECT f.key,
         COUNT(b.pos) = {k} AS bloom_maybe
  FROM fan f LEFT JOIN bits b ON b.pos = f.pos
  GROUP BY f.key
)
SELECT h.key, h.bloom_maybe,
       (r.key IS NOT NULL) AS actual
FROM hits h LEFT JOIN ref_keys r ON r.key = h.key
ORDER BY h.key
"""


def bloom_seen_verdicts(
    docs: DataFrame,
    key_expr=None,
    id_col: str = "doc_id",
    m: int = _DEFAULT_M,
    k: int = _DEFAULT_K,
    stage: bool = True,
) -> DataFrame:
    """Sequential Bloom pre-filter verdicts → (doc_id, maybe_seen):
    for every document, in ``doc_id`` (arrival) order, "had ALL k of
    my key's bit positions been set by EARLIER documents?" — the
    batch twin of the streaming Bloom membership operator
    (streaming/bloomprobe.py; convergence proved by
    tests/test_streaming_bloomprobe.py on an ordered replay).

    Semantics: position p's first-setter is the smallest doc_id that
    hashes to p; ``maybe_seen`` ⟺ every position of this doc's key
    has a first-setter strictly smaller than this doc.  One-sided
    like any Bloom answer: an exact duplicate of an earlier document
    is ALWAYS maybe_seen (its positions were all set by the earlier
    copy); a True can be a false positive (k-way position collision).

    Default key = md5(text) (NULL texts excluded).

    100 TB posture: one JVM-side fan of k positions per document, one
    shuffle on the ≤ m position space for the min-aggregation
    (map-side combinable), one equi-join back on position, one
    map-side-combinable min per doc.  Never corpus × corpus; the
    first-setter frame is bounded by m rows.

    ``stage`` (default on, r16): the (doc_id, pos) fan is materialized
    once as a stage boundary — it feeds BOTH the first-setter
    aggregation and the probe join, so the lazy form ran the corpus
    md5 key + k position hashes twice per action (guide §2.4).
    ``stage=False`` keeps the fully-lazy recomputable form.
    """
    if m < 2 or k < 1:
        raise ValueError(f"need m ≥ 2 and k ≥ 1, got {m}, {k}")
    key = key_expr if key_expr is not None else F.md5(F.col("text"))
    keys = docs.filter(
        F.col(id_col).isNotNull() & key.isNotNull()
    ).select(F.col(id_col).alias("doc_id"), key.alias("_key"))
    fan = keys.select(
        "doc_id",
        F.explode(_positions(F.col("_key"), m, k)).alias("pos"),
    )
    if stage:
        from eventhub_to_timescale_spark.operators.boundary import (
            stage_boundary as _boundary,
        )

        fan = _boundary(fan)
    first = fan.groupBy("pos").agg(F.min("doc_id").alias("_first"))
    return (
        fan.join(F.broadcast(first), "pos")
        .groupBy("doc_id")
        .agg(
            F.min(
                (F.col("_first") < F.col("doc_id")).cast("int")
            ).cast("boolean").alias("maybe_seen")
        )
        .orderBy("doc_id")
    )


def bloom_seen_oracle_sql(
    table: str = "documents",
    m: int = _DEFAULT_M,
    k: int = _DEFAULT_K,
) -> str:
    """DuckDB rendering of ``bloom_seen_verdicts`` — same md5-derived
    positions, same strict first-setter rule."""
    pos_exprs = ", ".join(
        f"CAST(('0x' || substr(md5('bloom{i}:' || key), 1, 8)) AS BIGINT)"
        f" % {m}"
        for i in range(k)
    )
    return f"""
WITH keys AS (
  SELECT doc_id, md5(text) AS key FROM {table}
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
),
fan AS (
  SELECT doc_id, unnest([{pos_exprs}]) AS pos FROM keys
),
first_set AS (
  SELECT pos, MIN(doc_id) AS first_doc FROM fan GROUP BY pos
)
SELECT f.doc_id,
       CAST(MIN(CASE WHEN fs.first_doc < f.doc_id THEN 1 ELSE 0 END)
            AS BOOLEAN) AS maybe_seen
FROM fan f JOIN first_set fs ON fs.pos = f.pos
GROUP BY f.doc_id
ORDER BY f.doc_id
"""
