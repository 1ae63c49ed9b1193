"""Ordered-step funnel conversion over the raw event stream —
"how many users progressed view → click → purchase, in that order?"
(ClickHouse ``windowFunnel`` / product-analytics funnel semantics,
greedy earliest-progression matching).

Extension beyond the reference's per-subject time-series surface
(SURVEY.md §2.6), framed as such.

Mechanism — a JVM-side higher-order fold, no UDF, no self-join:

1. one shuffle: per user, ``sort_array(collect_list(struct(ts, id,
   type)))`` assembles the user's time-ordered event array (struct
   ordering sorts by ts first, id as the deterministic tie-break);
2. ``F.aggregate`` folds the array through the step machine: advance
   to step s+1 on the FIRST event matching step s+1's type with
   ``ts > t(s)`` (strictly-later, so two steps cannot share one
   instant — mirrors the oracle's correlated ``min(ts) WHERE ts >
   prev`` chain exactly);
3. the per-user furthest step explodes to one row per reached stage,
   and a map-side-combinable count yields the cumulative funnel
   (``n_users`` at stage s = users who reached AT LEAST s).

The textbook SQL formulation is a correlated-subquery chain (one scan
per step); this plan scans the facts once regardless of step count.

100 TB posture: the only fact-table pass is the collect_list partial
aggregate; everything after runs on one array per user. Per-user
arrays are bounded by per-user activity — a bot-grade hot user
inflates ONE row, not a join fan-out; cap with a per-(user, day)
pre-limit upstream if the source allows unbounded per-key volume.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_reached(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """→ (stage, step_name, n_users): cumulative funnel — users whose
    greedy earliest progression reached at least stage s (1-based).
    Stages nobody reached still appear with ``n_users = 0``? No —
    empty stages emit no row (the oracle matches); join against the
    step list downstream if dense output is needed."""
    if not steps:
        raise ValueError("steps must be non-empty")
    step_arr = F.array(*[F.lit(s) for s in steps])
    ev = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(id_col).alias("id"),
                F.col(type_col).alias("tp"),
            )
        )
    )
    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("timestamp").alias("t"),
    )

    def advance(acc, x):
        return F.when(
            (acc["stage"] < F.lit(len(steps)))
            & (x["tp"] == F.element_at(step_arr, acc["stage"] + 1))
            & (acc["t"].isNull() | (x["ts"] > acc["t"])),
            F.struct(
                (acc["stage"] + 1).alias("stage"), x["ts"].alias("t")
            ),
        ).otherwise(acc)

    per_user = (
        events.filter(
            F.col(ts_col).isNotNull() & F.col(type_col).isin(list(steps))
        )
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.aggregate(ev, init, advance)["stage"].alias("furthest"))
    )
    return (
        per_user.filter(F.col("furthest") > 0)
        .select(
            "u",
            F.explode(F.sequence(F.lit(1), F.col("furthest"))).alias(
                "stage"
            ),
        )
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "stage",
            F.element_at(step_arr, F.col("stage")).alias("step_name"),
            "n_users",
        )
    )


def funnel_oracle_sql(
    steps: Sequence[str],
    user_expr: str = "user_id",
    ts_expr: str = "ts",
    type_expr: str = "event_type",
    table: str = "events",
) -> str:
    """DuckDB rendering: correlated min-progression chain, one CTE per
    step, then the cumulative stage counts. Semantics identical to the
    greedy fold (earliest strictly-later match per step)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    ctes = [
        f"""s1 AS (
  SELECT {user_expr} AS u, MIN({ts_expr}) AS t
  FROM {table}
  WHERE {type_expr} = '{steps[0]}' AND {ts_expr} IS NOT NULL
  GROUP BY 1
)"""
    ]
    for i, s in enumerate(steps[1:], start=2):
        ctes.append(
            f"""s{i} AS (
  SELECT e.{user_expr} AS u, MIN(e.{ts_expr}) AS t
  FROM {table} e JOIN s{i - 1} p ON e.{user_expr} = p.u
  WHERE e.{type_expr} = '{s}' AND e.{ts_expr} > p.t
  GROUP BY 1
)"""
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS stage, '{s}' AS step_name, "
        f"(SELECT COUNT(*) FROM s{i}) AS n_users"
        for i, s in enumerate(steps, start=1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT * FROM (\n{unions}\n) WHERE n_users > 0"
    )


__all__ = ["funnel_reached", "funnel_oracle_sql"]
