"""Stage-boundary materialization, gated by a session-level setting.

Several operators materialize a multi-consumer intermediate frame —
pipeline stage outputs, trained model rows (DSIR weight map), sketch
tables (KMV), staged term frequencies (TF-IDF), phase-1 heavy-hitter
summaries, edit-distance gram indexes.  The boundary serves two
purposes (guide §3.3/§5): it truncates the logical plan so Catalyst
does not re-plan (or re-run) the upstream subtree once per consumer,
and it mirrors the staged table / stored artifact a production
pipeline would persist between phases.

The MECHANISM is deployment-dependent (r15 ADVICE):

- ``localCheckpoint`` (default): cheapest lineage cut — blocks live on
  the local executors, non-replicated, unrecoverable on executor loss.
  Right for the single-node bench and for any cluster job that can
  simply re-run on failure.
- ``checkpoint``: reliable checkpoint to ``sc.setCheckpointDir`` —
  fault-tolerant, costs a write to shared storage.  The choice for
  long cluster jobs where losing an executor must not kill the run.
- ``persist``: storage only, NO lineage cut — keeps the frame
  recomputable on executor loss, but downstream plans still carry the
  full upstream tree (the pre-r15 behaviour; known to re-introduce
  the Catalyst re-planning cost on multi-consumer pipelines).

Set ``spark.eventhub_to_timescale.stageBoundary`` on the session to
pick; unset means ``localCheckpoint``.  The setting deliberately does
NOT offer "none": operators that need a fully-lazy form for oracle
comparison expose their own ``stage=False`` / ``persist_stages=False``
escape hatches, which skip the boundary call entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

BOUNDARY_CONF = "spark.eventhub_to_timescale.stageBoundary"
_MODES = ("localCheckpoint", "checkpoint", "persist")


def stage_boundary(df: DataFrame) -> DataFrame:
    """Materialize ``df`` as a stage boundary using the session-chosen
    mechanism (see module docstring).  Eager in every mode, so the
    boundary is computed exactly once at construction and every
    consumer reads the materialized form."""
    mode = df.sparkSession.conf.get(BOUNDARY_CONF, "localCheckpoint")
    if mode == "localCheckpoint":
        return df.localCheckpoint(eager=True)
    if mode == "checkpoint":
        # requires sc.setCheckpointDir; let Spark's own error surface
        # if it is missing — it names the fix
        return df.checkpoint(eager=True)
    if mode == "persist":
        df = df.persist()
        df.count()  # eager, like the other modes
        return df
    raise ValueError(
        f"{BOUNDARY_CONF}={mode!r} — expected one of {_MODES}"
    )


__all__ = ["stage_boundary", "BOUNDARY_CONF"]
