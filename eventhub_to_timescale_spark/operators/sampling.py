"""Deterministic sampling for training-data pipelines.

At 100 TB you cannot afford nondeterministic ``df.sample`` for corpus
curation: re-runs must select the SAME rows (resumable pipelines,
reproducible ablations, stable train/test membership across
incremental rebuilds). Everything here keys selection on a
cryptographic hash of a stable row key + a caller salt:

- ``sample_fraction`` — keep ~fraction of rows, membership decided by
  ``md5(key || salt)``: a pure, codegen'd filter. No shuffle, no RNG
  state, pushdown-friendly (the filter sits directly on the scan),
  and adding/removing OTHER rows never changes a row's membership —
  unlike reservoir or row_number()-based sampling, which both need a
  global pass.
- ``sample_stratified`` — per-class fractions as one CASE chain over
  the class column (single pass; the reference for the shape is
  ``DataFrame.sampleBy``, which is seeded-RNG rather than
  content-keyed and so not rerun-stable across partitioning changes).
- ``train_test_split`` — complementary-threshold variant: every row
  gets a split label, the test set is exactly the ``sample_fraction``
  set for the same (key, salt), so split membership is stable under
  corpus growth.

Hash-prefix semantics: the first 4 hex chars of the md5 are compared
AS A STRING against the 4-hex rendering of ``floor(fraction *
16**4)``. Fixed-length lowercase-hex string comparison is identical
in every engine with an md5() (the DuckDB oracles use the same
expression), sidestepping cross-engine hex-to-int quirks. Resolution
is 1/65536 — curation fractions below 0.01% should widen the prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX_LEN = 4
_SPACE = 16 ** _PREFIX_LEN


def _bucket_hex(key: Column, salt: str) -> Column:
    """First 4 hex chars of md5(key || salt) — the row's sampling
    coordinate in [0x0000, 0xffff], uniform for any reasonable key."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(salt)).cast("binary")),
        1,
        _PREFIX_LEN,
    )


def _threshold_hex(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        # 'g' sorts after every hex char, so `bucket < 'g'` keeps all
        # rows — no special-casing at the call sites
        return "g"
    return format(int(fraction * _SPACE), f"0{_PREFIX_LEN}x")


def sample_fraction(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically in the row key."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return df
    if fraction <= 0.0:
        return df.filter(F.lit(False))
    return df.filter(
        _bucket_hex(F.col(key_col), salt) < F.lit(_threshold_hex(fraction))
    )


def sample_stratified(
    df: DataFrame,
    key_col: str,
    class_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-class keep-fractions (e.g. downsample boilerplate-heavy web
    text, keep all books) as one codegen'd CASE chain — no join, no
    shuffle, one scan."""
    threshold = F.lit(_threshold_hex(default_fraction))
    for cls, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(class_col) == cls, F.lit(_threshold_hex(frac))
        ).otherwise(threshold)
    return df.filter(_bucket_hex(F.col(key_col), salt) < threshold)


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.1,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Label every row 'test' or 'train'; the test set is exactly
    ``sample_fraction(df, key_col, test_fraction, salt)``, so
    membership never flips as the corpus grows."""
    is_test = _bucket_hex(F.col(key_col), salt) < F.lit(
        _threshold_hex(test_fraction)
    )
    return df.withColumn(
        split_col, F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def shard_order(
    df: DataFrame,
    key_col: str,
    num_shards: int = 64,
    salt: str = "order",
) -> DataFrame:
    """Deterministic global training order: → (key, shard, pos).

    Training runs need a reproducible data order that (a) looks
    shuffled, (b) is recomputable from scratch after a crash, and
    (c) scales — a global ``ORDER BY random()`` is a single total sort
    with RNG state.  Instead: ``shard = int(md5-prefix) mod N`` and
    ``pos = row_number`` within the shard ordered by the full md5.
    The only shuffle is a hash partition on ``shard`` — N uniform
    partitions by construction (md5 is uniform), so the per-shard sort
    is balanced and the ordering is stable under corpus growth within
    a shard-count choice.  Readers consume shard files in (shard, pos)
    order; any sub-sequence is addressable for resume.
    """
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    from pyspark.sql import Window

    h = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(salt)).cast("binary")
    )
    with_shard = df.select(
        F.col(key_col),
        h.alias("_h"),
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % num_shards)
        .alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(key_col))
    return with_shard.select(
        key_col,
        "shard",
        F.row_number().over(w).alias("pos"),
    )


def source_quota(
    df: DataFrame,
    key_col: str,
    group_col: str,
    quota: int,
    salt: str = "quota",
) -> DataFrame:
    """Corpus-mixing quota: keep at most ``quota`` rows per
    ``group_col`` value (per data source / domain / language), chosen
    deterministically by md5 order — the training-mix primitive for
    capping over-represented sources while keeping reruns and
    incremental rebuilds stable (a row only loses its slot if a
    SMALLER-hash row arrives in its group).

    → input rows (all columns) of the surviving set.

    100 TB posture: one shuffle on ``group_col``, then a bounded
    per-group top-``quota`` by hash rank.  Source cardinality is
    typically small (tens-hundreds) → per-group skew is the real
    hazard; the plan uses ``row_number`` over the group window, which
    Spark executes as a partial top-k per map task ONLY when written
    as rank-filter (WindowGroupLimit pushes ``rank <= k`` into the
    shuffle map side since 3.5), so each map task ships at most
    ``quota`` rows per group — shuffle volume is |groups|×quota per
    task, not the group's raw volume.
    """
    if quota <= 0:
        raise ValueError(f"quota must be positive, got {quota}")
    from pyspark.sql import Window

    h = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(salt)).cast("binary")
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )


def source_quota_oracle_sql(
    cols: str,
    key_expr: str,
    group_expr: str,
    quota: int,
    salt: str = "quota",
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``source_quota`` membership."""
    return f"""
WITH ranked AS (
    SELECT {cols},
           row_number() OVER (
               PARTITION BY {group_expr}
               ORDER BY md5(CAST({key_expr} AS VARCHAR) || '{salt}'),
                        {key_expr}
           ) AS rk
    FROM {table}
)
SELECT {cols} FROM ranked WHERE rk <= {quota}
"""


def sample_weighted(
    df: DataFrame,
    key_col: str,
    weight: Column,
    salt: str = "weighted",
) -> DataFrame:
    """Per-row keep-probability from a weight expression in [0, 1]
    (values outside are clipped) — quality-weighted corpus resampling:
    a doc with weight 0.9 is ~9× likelier to survive than one at 0.1,
    and membership is a pure function of (key, salt, weight), so
    reruns and ablations with the same weights select the same rows.

    The membership test compares the integer value of the md5 prefix
    against ``floor(clip(w) * 65536)`` — integer comparison, identical
    in every engine with md5().  A codegen'd filter: no shuffle, no
    RNG, pushdown-eligible when the weight is a column expression.
    """
    coord = F.conv(
        _bucket_hex(F.col(key_col), salt), 16, 10
    ).cast("long")
    thr = F.floor(
        F.least(F.greatest(weight, F.lit(0.0)), F.lit(1.0)) * _SPACE
    ).cast("long")
    return df.filter(coord < thr)


def weighted_oracle_predicate(
    key_expr: str, weight_expr: str, salt: str = "weighted"
) -> str:
    """DuckDB rendering of ``sample_weighted`` membership."""
    return (
        f"CAST(('0x' || substring(md5(CAST({key_expr} AS VARCHAR) || "
        f"'{salt}'), 1, {_PREFIX_LEN})) AS BIGINT) < "
        f"CAST(floor(LEAST(GREATEST({weight_expr}, 0.0), 1.0) * {_SPACE})"
        f" AS BIGINT)"
    )


def shard_order_oracle_sql(
    key_expr: str,
    num_shards: int = 64,
    salt: str = "order",
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``shard_order`` (hex-prefix cast via the
    '0x' literal form, identical value to Spark's ``conv(_, 16, 10)``)."""
    return f"""
WITH hashed AS (
    SELECT {key_expr} AS k,
           md5(CAST({key_expr} AS VARCHAR) || '{salt}') AS hx
    FROM {table}
), sharded AS (
    SELECT k, hx,
           CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % {num_shards}
               AS shard
    FROM hashed
)
SELECT k AS {key_expr}, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, k)
            AS INT) AS pos
FROM sharded
"""


def sampling_oracle_predicate(
    key_expr: str, fraction: float, salt: str = ""
) -> str:
    """The DuckDB-side rendering of the same membership test — kept
    next to the Spark expression so the two evolve together."""
    thr = _threshold_hex(fraction)
    return (
        f"substring(md5(CAST({key_expr} AS VARCHAR) || '{salt}'), 1, "
        f"{_PREFIX_LEN}) < '{thr}'"
    )


def stratified_oracle_predicate(
    key_expr: str,
    class_expr: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> str:
    """DuckDB rendering of ``sample_stratified``'s membership test."""
    cases = " ".join(
        f"WHEN '{cls}' THEN '{_threshold_hex(frac)}'"
        for cls, frac in sorted(fractions.items())
    )
    thr = (
        f"(CASE {class_expr} {cases} "
        f"ELSE '{_threshold_hex(default_fraction)}' END)"
    )
    return (
        f"substring(md5(CAST({key_expr} AS VARCHAR) || '{salt}'), 1, "
        f"{_PREFIX_LEN}) < {thr}"
    )


def token_budget_select(
    docs: DataFrame,
    budget: int,
    salt: str = "budget",
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_hex_len: int = 2,
    token_counts: DataFrame | None = None,
) -> DataFrame:
    """Deterministic token-budget corpus selection: walk the corpus in
    md5-shuffled order and keep documents while the running token
    total stays ≤ ``budget`` → (doc_id, n_tokens).

    The selection a training run actually wants — "give me ~N tokens,
    sampled uniformly, reproducibly" — is a prefix of a deterministic
    global order, but a naive global cumulative sum is ONE total sort
    on a single window partition.  Two-phase instead:

    1. bucket every doc by the first ``bucket_hex_len`` md5 hex chars
       (16^len buckets) and aggregate per-bucket token sums — one
       map-side-combinable groupBy producing ≤16^len rows;
    2. a bounded driver prefix-sum over those rows finds the boundary
       bucket b*: buckets before it are kept WHOLESALE (scan filter,
       no sort), buckets after are dropped, and only the ~1/16^len
       slice inside b* pays an ordered cumulative-sum window.

    At 100 TB raise ``bucket_hex_len`` (4 hex chars → 65 536 buckets →
    the sorted slice is ~0.0015% of the corpus).  The driver collect
    is bounded at 16^len rows by construction.  Token counting uses
    the same ``[a-z]+|[0-9]+`` lexer as text.token_stats — or, when
    ``token_counts`` is given, a caller-supplied (id, n_tokens)
    frame (e.g. ``bpe.bpe_token_counts`` for tokenizer-faithful
    budgeting, r14 verdict ask #5): the counts join replaces the
    inline lexer, docs absent from the frame count 0 tokens (the
    zero-lexer-word case), and the two-phase bucket walk is
    unchanged — the budget semantics never depend on HOW a token
    was counted.
    """
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    h = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(salt)).cast("binary")
    )
    if token_counts is not None:
        toks_frame = token_counts.select(
            F.col(id_col), F.col("n_tokens").alias("_tc")
        )
        base = (
            docs.join(toks_frame, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("_tc"), F.lit(0))
                .cast("long")
                .alias("n_tokens"),
                h.alias("_h"),
                F.substring(h, 1, bucket_hex_len).alias("_b"),
            )
        )
    else:
        toks = F.size(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(r"[a-z]+|[0-9]+"), 0
            )
        ).cast("long")
        base = docs.select(
            F.col(id_col),
            toks.alias("n_tokens"),
            h.alias("_h"),
            F.substring(h, 1, bucket_hex_len).alias("_b"),
        )
    # phase 1: per-bucket token totals (bounded: 16^bucket_hex_len rows)
    totals = sorted(
        base.groupBy("_b").agg(F.sum("n_tokens").alias("t")).collect(),
        key=lambda r: r["_b"],
    )
    run = 0
    boundary, offset = None, 0
    full_buckets: list[str] = []
    for r in totals:
        if run + r["t"] <= budget:
            full_buckets.append(r["_b"])
            run += r["t"]
        else:
            boundary, offset = r["_b"], run
            break
    # phase 2: wholesale filter + one in-bucket cumulative window
    kept = base.filter(F.col("_b").isin(full_buckets)) if full_buckets \
        else base.limit(0)
    if boundary is not None:
        from pyspark.sql import Window

        w = (
            Window.partitionBy("_b")  # one bucket → one partition, no
            .orderBy("_h", id_col)    # global-sort WindowExec
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        edge = (
            base.filter(F.col("_b") == boundary)
            .withColumn("_run", F.sum("n_tokens").over(w) + F.lit(offset))
            .filter(F.col("_run") <= budget)
            .drop("_run")
        )
        kept = kept.unionByName(edge)
    return kept.select(id_col, "n_tokens")


def token_budget_oracle_sql(
    budget: int,
    salt: str = "budget",
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``token_budget_select`` — the naive global
    running sum over the identical md5 order (the two-phase Spark plan
    must select the exact same prefix)."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0))
              AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR) || '{salt}') AS h
  FROM {table}
), c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS run
  FROM t
)
SELECT doc_id, n_tokens FROM c WHERE run <= {budget}
"""


def temperature_mix(
    docs: DataFrame,
    total: int,
    group_col: str = "lang",
    salt: str = "mix",
    id_col: str = "doc_id",
    bucket_hex_len: int = 2,
) -> DataFrame:
    """α=0.5 temperature source mixing → (doc_id, group): draw a
    ``total``-doc training mix whose per-group share is flattened from
    the corpus share — quota_g = total·⌊√n_g⌋ / Σ_h ⌊√n_h⌋ (floor
    division), then pick each group's quota deterministically in
    md5-shuffled order.

    The data-mixing step every multi-source LLM corpus runs (GPT-3 /
    LLaMA style w_g ∝ n_g^α, α=0.5): majority sources are down-
    weighted, minority sources over-represented relative to raw share.
    Quotas use ``math.isqrt`` so they are INTEGER-exact — the DuckDB
    oracle's ``floor(sqrt(n))`` agrees bit-for-bit for any group size
    below 2^52 (IEEE sqrt is correctly rounded, so it never crosses an
    integer boundary at representable counts).

    100 TB posture (same two-phase shape as token_budget_select): the
    corpus is never rank-windowed per group — that would shuffle every
    row into |groups| skewed partitions.  Phase 1 aggregates per
    (group, md5-hex-prefix bucket) counts — bounded at
    |groups|·16^bucket_hex_len rows, collected to the driver.  Phase 2
    keeps full buckets wholesale with a scan-side membership filter;
    only each group's single boundary bucket pays a row_number window,
    partitioned by (group, bucket) so the sorted slice is ~1/16^len of
    the group.

    NULL-group rows are EXCLUDED up front (filter + the oracle's
    WHERE): the driver-side quota key would stringify None while the
    Spark-side concat_ws silently skips NULLs, so a NULL group could
    never round-trip the membership keys — a mix over an ungrouped
    residue is undefined here by contract, not dropped silently.
    """
    if total < 0:
        raise ValueError(f"total must be non-negative, got {total}")
    import math
    from collections import defaultdict

    g = F.col(group_col)
    h = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(salt)).cast("binary")
    )
    docs = docs.filter(g.isNotNull())
    base = docs.select(
        F.col(id_col),
        g,
        h.alias("_h"),
        F.substring(h, 1, bucket_hex_len).alias("_b"),
    )
    # phase 1: bounded (group, bucket) histogram
    counts = base.groupBy(group_col, "_b").count().collect()
    n: dict = defaultdict(int)
    for r in counts:
        n[r[group_col]] += r["count"]
    s = {grp: math.isqrt(v) for grp, v in n.items()}
    ssum = sum(s.values())
    quota = {grp: (total * s[grp]) // ssum if ssum else 0 for grp in s}
    per_group: dict = defaultdict(list)
    for r in counts:
        per_group[r[group_col]].append((r["_b"], r["count"]))
    SEP = "\x00"
    full_keys: list[str] = []
    edge_rem: dict[str, int] = {}
    for grp, buckets in per_group.items():
        rem = quota[grp]
        for b, c in sorted(buckets):
            if c <= rem:
                full_keys.append(f"{grp}{SEP}{b}")
                rem -= c
            else:
                if rem > 0:
                    edge_rem[f"{grp}{SEP}{b}"] = rem
                break
    key = F.concat_ws(SEP, g.cast("string"), F.col("_b"))
    kept = (
        base.filter(key.isin(full_keys))
        if full_keys
        else base.limit(0)
    )
    if edge_rem:
        from pyspark.sql import Window

        w = Window.partitionBy(group_col, "_b").orderBy("_h", id_col)
        rem_col = F.lit(None).cast("long")
        for k, v in edge_rem.items():
            rem_col = F.when(key == k, F.lit(v)).otherwise(rem_col)
        edge = (
            base.filter(key.isin(list(edge_rem)))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= rem_col)
            .drop("_rn")
        )
        kept = kept.unionByName(edge)
    return kept.select(id_col, group_col)


def temperature_mix_oracle_sql(
    total: int,
    group_col: str = "lang",
    salt: str = "mix",
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``temperature_mix`` — the naive global
    per-group rank over the identical md5 order, with the same
    integer-exact ⌊√n⌋ quota arithmetic and the same NULL-group
    exclusion."""
    return f"""
WITH base AS (
  SELECT * FROM {table} WHERE {group_col} IS NOT NULL
), n AS (
  SELECT {group_col}, count(*) AS cnt FROM base GROUP BY {group_col}
), w AS (
  SELECT {group_col},
         CAST(floor(sqrt(CAST(cnt AS DOUBLE))) AS BIGINT) AS s
  FROM n
), q AS (
  SELECT {group_col},
         ({total} * s) // (SELECT sum(s) FROM w) AS quota
  FROM w
), r AS (
  SELECT doc_id, {group_col},
         row_number() OVER (
           PARTITION BY {group_col}
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '{salt}'), doc_id
         ) AS rk
  FROM base
)
SELECT r.doc_id, r.{group_col}
FROM r JOIN q USING ({group_col})
WHERE r.rk <= q.quota
"""


__all__ = [
    "sample_fraction",
    "sample_stratified",
    "train_test_split",
    "shard_order",
    "source_quota",
    "sample_weighted",
    "shard_order_oracle_sql",
    "source_quota_oracle_sql",
    "sampling_oracle_predicate",
    "stratified_oracle_predicate",
    "weighted_oracle_predicate",
    "token_budget_select",
    "token_budget_oracle_sql",
    "temperature_mix",
    "temperature_mix_oracle_sql",
]


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    test_fraction: float = 0.1,
    salt: str = "lsplit-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, cluster, split): train/test assignment where every
    near-duplicate CLUSTER lands on one side atomically — the
    leakage-safe split an evaluation pipeline needs (a per-document
    md5 split, ``sample_split_counts``'s semantics, puts one near-dup
    copy in train and its twin in test, leaking the answer; splitting
    on the cluster-canonical id makes that impossible by
    construction).

    ``pairs`` is any near-dup pair frame (MinHash, winnowing, …);
    clusters come from the exact connected components
    (operators/dedup.py:near_dedup_components), unpaired documents are
    their own cluster, and the split membership test is the repo's
    deterministic md5-threshold on the CLUSTER id — so two documents
    share a split whenever they share a cluster, independent of
    partitioning, engine, or pair-frame row order.

    100 TB posture: components run on the PAIR graph only (corpus
    never enters the iteration); the cluster map is pair-graph-sized
    and enters as one left join; the membership test is a scan-side
    codegen'd expression.
    """
    from eventhub_to_timescale_spark.operators.dedup import (
        near_dedup_components,
    )

    comps = near_dedup_components(pairs).select(
        F.col("doc_id").alias("_cd"), F.col("cluster_id").alias("_cc")
    )
    cluster = F.coalesce(F.col("_cc"), F.col("_id"))
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(comps, on=[F.col("_id") == F.col("_cd")], how="left")
        .select(
            F.col("_id").alias("doc_id"),
            cluster.alias("cluster"),
            F.when(
                _bucket_hex(cluster, salt)
                < F.lit(_threshold_hex(test_fraction)),
                F.lit("test"),
            )
            .otherwise(F.lit("train"))
            .alias("split"),
        )
        .orderBy("doc_id")
    )


def leakage_safe_split_oracle_predicate(
    cluster_expr: str, test_fraction: float, salt: str = "lsplit-v1"
) -> str:
    """DuckDB rendering of the cluster-keyed membership test."""
    return sampling_oracle_predicate(cluster_expr, test_fraction, salt)


def cv_fold_assign(
    docs: DataFrame,
    k: int = 5,
    *,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    salt: str = "cvfold-v1",
) -> DataFrame:
    """Stratified k-fold cross-validation assignment with EXACT
    balance: within each stratum, rows are ordered by a salted md5 of
    their id (a deterministic shuffle) and dealt round-robin, so every
    (stratum, fold) cell holds floor(n/k) or ceil(n/k) rows — the
    guarantee hash-mod assignment (`fold = hash % k`, fully map-side
    but binomially noisy) cannot give.  The salt keys the permutation:
    a different salt is a fresh, reproducible re-deal.

    → (doc_id, stratum, fold); fold in [0, k).

    100 TB posture: one shuffle — the row_number window partitions by
    stratum, parallel across strata; a single dominant stratum makes
    that window a straggler, at which point sub-stratify (stratum x
    md5-prefix) and deal within sub-strata: balance degrades only by
    the sub-stratum count.  Everything else is scan-side expressions.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        _bucket_hex(F.col(id_col), salt), F.col(id_col)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        ((F.row_number().over(w) - 1) % k).alias("fold"),
    )


def cv_fold_oracle_sql(
    k: int = 5,
    *,
    id_expr: str = "doc_id",
    stratum_expr: str = "lang",
    salt: str = "cvfold-v1",
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``cv_fold_assign`` + the per-cell balance
    summary — same salted-md5 deal order, same round-robin."""
    coord = (
        f"substring(md5(CAST({id_expr} AS VARCHAR) || '{salt}'), 1, "
        f"{_PREFIX_LEN})"
    )
    return f"""
WITH dealt AS (
  SELECT {id_expr} AS doc_id, {stratum_expr} AS stratum, n_chars,
         (ROW_NUMBER() OVER (
            PARTITION BY {stratum_expr}
            ORDER BY {coord}, {id_expr}) - 1) % {k} AS fold
  FROM {table}
)
SELECT stratum, CAST(fold AS INT) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM dealt
GROUP BY stratum, fold
ORDER BY stratum, fold
"""
