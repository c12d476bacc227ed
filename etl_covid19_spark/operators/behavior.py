"""Behavioral event analytics (§2.8 extension): ordered funnels and
cohort retention — the product-analytics queries every event
warehouse ends up running, shaped for the 100 TB case.

Scale posture: every step is either a map-side-combined aggregate
keyed by user (state = |users|, never |events|) or an equi-join
between user-grained frames. Nothing sorts raw events, nothing holds
more than one user's timeline at a time, and nothing triggers a
driver-side action — the whole funnel is ONE lazy plan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
) -> DataFrame:
    """Strict ordered funnel: a user converts step i only with an
    event of type steps[i] strictly AFTER their step-(i-1)
    conversion time (earliest-qualifying semantics).

    Returns one row per step: (step_idx, step, users,
    conv_from_prev). Each stage is a filtered per-user min-aggregate
    equi-joined to the previous stage — |steps| user-grained
    shuffles, no |events|-grained window sort, no driver actions:
    the per-step counts collapse into ONE single-row aggregate,
    unpivoted with stack() and ratioed with a lag window over
    |steps| rows.
    """
    stages = []  # stages[i]: (user, _t{i}) = step-i conversion time
    stage = (
        events.where(F.col(etype) == steps[0])
        .groupBy(user)
        .agg(F.min(ts).alias("_t0"))
    )
    stages.append(stage)
    for i, step in enumerate(steps[1:], start=1):
        stage = (
            events.where(F.col(etype) == step)
            .join(
                stages[-1].select(user, F.col(f"_t{i-1}").alias("_prev")),
                user,
            )
            .where(F.col(ts) > F.col("_prev"))
            .groupBy(user)
            .agg(F.min(ts).alias(f"_t{i}"))
        )
        stages.append(stage)
    # later stages are user-subsets of earlier ones: left-join chain,
    # then one row of per-step non-null counts
    joined = reduce(lambda a, b: a.join(b, user, "left"), stages)
    one = joined.agg(
        *[F.count(F.col(f"_t{i}")).alias(f"_n{i}") for i in range(len(steps))]
    )
    stack_expr = ", ".join(
        f"{i + 1}, '{s}', _n{i}" for i, s in enumerate(steps)
    )
    tall = one.selectExpr(
        f"stack({len(steps)}, {stack_expr}) AS (step_idx, step, users)"
    )
    w = Window.orderBy("step_idx").rowsBetween(-1, -1)
    return tall.select(
        "step_idx",
        "step",
        "users",
        (
            F.col("users").cast("double") / F.sum("users").over(w)
        ).alias("conv_from_prev"),
    )


def event_sequences(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-user ordered event-initial string — the substrate for
    regex pattern matching over behavior (MATCH_RECOGNIZE-lite):
    `collect_list(struct(ts, tiebreak, chr))` in ONE hash aggregate,
    sorted per group AFTER aggregation (array_sort on the struct
    gives (ts, tiebreak) order without a global sort), then folded
    to a string. The (ts, tiebreak) key is total, so the string is
    deterministic.

    Bound: one user's timeline must fit in a row (~bytes per event).
    That is the same bound sessionization accepts; for pathological
    users cap with slice() after the sort."""
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts).alias("t"),
                        F.col(tiebreak).alias("k"),
                        F.substring(F.col(etype), 1, 1).alias("c"),
                    )
                )
            ),
            lambda x: x["c"],
        ),
        "",
    )
    return events.groupBy(user).agg(seq.alias("seq"))


def transition_matrix(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts/probabilities between
    event types, following each user's (ts, tiebreak)-ordered
    timeline. One window pass keyed by user (lead), one hash
    aggregate keyed by (from, to) — |types|² output rows. The
    probability divides two exact longs, so it is deterministic."""
    w = Window.partitionBy(user).orderBy(ts, tiebreak)
    pairs = (
        events.withColumn("_next", F.lead(F.col(etype)).over(w))
        .where(F.col("_next").isNotNull())
        .select(F.col(etype).alias("from_type"), F.col("_next").alias("to_type"))
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_from)
        ).alias("prob"),
    )


def cohort_retention(
    events: DataFrame,
    max_offset_days: int = 7,
    user: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Classic retention triangle: users grouped by first-seen day
    (their cohort), counted on each subsequent activity day offset.

    Two aggregates and one equi-join, all keyed by user / (cohort,
    offset): cohort assignment is a per-user min, activity days are a
    distinct on (user, day), and the join is user-grained. Output is
    |cohorts| × |offsets| rows.
    """
    first = events.groupBy(user).agg(
        F.to_date(F.min(ts)).alias("cohort_day")
    )
    active = events.select(
        F.col(user), F.to_date(ts).alias("active_day")
    ).distinct()
    return (
        active.join(first, user)
        .withColumn(
            "day_offset", F.datediff("active_day", "cohort_day")
        )
        .where(F.col("day_offset") <= max_offset_days)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct(user).alias("users"))
    )
