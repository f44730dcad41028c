"""Master-record lifecycle state machine (reference C6:
lifecycle_management.py:105-268).

States PROPOSED → ACTIVE → DEPRECATED → RETIRED with guarded
transitions; invalid transitions raise. The reference mutates a pandas
frame row-by-row; here a transition is one vectorized conditional
update over the master DataFrame plus append-only history / change-log
rows (reference T2) — no driver-side iteration, so a transition over a
billion-row master is a single map-stage job.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATES = ("PROPOSED", "ACTIVE", "DEPRECATED", "RETIRED")

# state -> states it may move to (reference lifecycle_management.py:105-165)
ALLOWED = {
    "PROPOSED": {"ACTIVE"},
    "ACTIVE": {"DEPRECATED"},
    "DEPRECATED": {"RETIRED", "ACTIVE"},  # reactivation allowed, retirement terminal
    "RETIRED": set(),
}


class InvalidTransition(RuntimeError):
    pass


@dataclass
class TransitionResult:
    master: DataFrame  # updated master
    history: DataFrame  # append-only rows: key, old_state, new_state, actor, ts


def lifecycle_transition(
    master: DataFrame,
    key: str,
    predicate: Column,
    new_state: str,
    actor: str,
    ts: str,
    state_col: str = "lifecycle_state",
    strict: bool = True,
) -> TransitionResult:
    """Move every row matching ``predicate`` to ``new_state``.

    strict=True raises if ANY matched row sits in a state that may not
    transition to ``new_state`` (the reference's guard errors);
    strict=False skips those rows (no-op) instead.
    """
    if new_state not in STATES:
        raise InvalidTransition(f"unknown state {new_state!r}; states: {STATES}")
    legal_sources = [s for s, dests in ALLOWED.items() if new_state in dests]
    matched = master.filter(predicate)

    if strict:
        bad = matched.filter(~F.col(state_col).isin(legal_sources))
        bad_rows = bad.select(key, state_col).limit(5).collect()
        if bad_rows:
            detail = ", ".join(f"{r[key]}:{r[state_col]}" for r in bad_rows)
            raise InvalidTransition(
                f"illegal transition to {new_state} from [{detail}] "
                f"(allowed sources: {legal_sources})"
            )

    move = predicate & F.col(state_col).isin(legal_sources)
    updated = master.withColumn(
        state_col, F.when(move, F.lit(new_state)).otherwise(F.col(state_col))
    ).withColumn(
        "state_changed_at",
        F.when(move, F.lit(ts).cast("timestamp")).otherwise(
            F.col("state_changed_at")
            if "state_changed_at" in master.columns
            else F.lit(None).cast("timestamp")
        ),
    )
    history = (
        matched.filter(F.col(state_col).isin(legal_sources))
        .select(
            F.col(key),
            F.col(state_col).alias("old_state"),
            F.lit(new_state).alias("new_state"),
            F.lit(actor).alias("changed_by"),
            F.lit(ts).cast("timestamp").alias("changed_at"),
        )
    )
    return TransitionResult(master=updated, history=history)


def lifecycle_tally(master: DataFrame, state_col: str = "lifecycle_state") -> DataFrame:
    """State-population metrics (reference A9:
    lifecycle_management.py:256-268)."""
    return master.groupBy(state_col).agg(F.count(F.lit(1)).alias("record_count"))
