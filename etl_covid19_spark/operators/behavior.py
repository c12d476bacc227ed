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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
    max_events_per_step: int | None = 100_000,
) -> DataFrame:
    """Strict ordered funnel: a user converts step i only with an
    event of type steps[i] strictly AFTER their step-(i-1)
    conversion time (earliest-qualifying semantics).

    Returns one row per step: (step_idx, step, users,
    conv_from_prev, truncated_users).

    SINGLE-PASS dataflow: the naive formulation (per-step aggregate,
    equi-join to the previous stage) re-evaluates every earlier
    stage's lineage per stage — quadratic re-scans of the fact table.
    Instead, ONE events scan (filtered to funnel types, pushed to the
    scan) feeds ONE user-keyed aggregate collecting each step's
    sorted timestamp array; the strict-ordering walk (t_i = first
    step-i timestamp AFTER t_{i-1}) is then a per-row chain of
    higher-order `filter(...)[0]` lookups — codegen'd, no joins, no
    further shuffles. The per-step counts collapse into ONE
    single-row aggregate, unpivoted with stack() and ratioed with a
    lag window over |steps| rows.

    Bounded state: each user's per-step array is capped at
    `max_events_per_step` EARLIEST timestamps — the cap is a running
    per-step count inside the same user-partitioned window sort the
    aggregate shuffle reuses (one Exchange total), and it bounds the
    collect buffer itself (`when(rank<=cap)` nulls are never
    collected), not just the output. A 10⁸-event bot key costs
    O(cap) aggregation state instead of OOMing the task. Truncation
    is surfaced per step as `truncated_users` (users whose step-i
    timeline was cut; their conversion is then a lower bound). Pass
    None to disable (exact, unbounded — the pre-round-3 behavior).
    """
    filtered = events.where(F.col(etype).isin(steps))
    if max_events_per_step is None:
        per_user = filtered.groupBy(user).agg(
            *[
                F.array_sort(
                    F.collect_list(
                        F.when(F.col(etype) == step, F.col(ts))
                    )
                ).alias(f"_a{i}")
                for i, step in enumerate(steps)
            ],
            *[
                F.lit(False).alias(f"_o{i}")
                for i in range(len(steps))
            ],
        )
    else:
        # running per-step rank: count of step-i events so far in this
        # user's (ts)-ordered timeline. Same partitioning as the
        # groupBy below → Catalyst plans ONE Exchange + Sort for both.
        wcum = (
            Window.partitionBy(user)
            .orderBy(ts)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ranked = filtered.select(
            F.col(user),
            F.col(ts),
            F.col(etype),
            *[
                F.count(F.when(F.col(etype) == step, F.lit(1)))
                .over(wcum)
                .alias(f"_r{i}")
                for i, step in enumerate(steps)
            ],
        )
        per_user = ranked.groupBy(user).agg(
            *[
                F.array_sort(
                    F.collect_list(
                        F.when(
                            (F.col(etype) == step)
                            & (F.col(f"_r{i}") <= max_events_per_step),
                            F.col(ts),
                        )
                    )
                ).alias(f"_a{i}")
                for i, step in enumerate(steps)
            ],
            *[
                (
                    F.coalesce(
                        F.max(
                            F.when(
                                F.col(etype) == step, F.col(f"_r{i}")
                            )
                        ),
                        F.lit(0),
                    )
                    > max_events_per_step
                ).alias(f"_o{i}")
                for i, step in enumerate(steps)
            ],
        )
    # strict-order walk: t0 = first step-0 ts; t_i = first step-i ts
    # strictly after t_{i-1} (NULL propagates: no prior conversion ->
    # no later one)
    walked = per_user.withColumn("_t0", F.try_element_at("_a0", F.lit(1)))
    for i in range(1, len(steps)):
        after_prev = F.filter(
            F.col(f"_a{i}"),
            lambda x: x > F.col(f"_t{i - 1}"),
        )
        walked = walked.withColumn(
            f"_t{i}", F.try_element_at(after_prev, F.lit(1))
        )
    one = walked.agg(
        *[F.count(F.col(f"_t{i}")).alias(f"_n{i}") for i in range(len(steps))],
        *[
            F.count(F.when(F.col(f"_o{i}"), F.lit(1))).alias(f"_tr{i}")
            for i in range(len(steps))
        ],
    )
    stack_expr = ", ".join(
        f"{i + 1}, '{s}', _n{i}, _tr{i}" for i, s in enumerate(steps)
    )
    tall = one.selectExpr(
        f"stack({len(steps)}, {stack_expr}) "
        "AS (step_idx, step, users, truncated_users)"
    )
    w = Window.orderBy("step_idx").rowsBetween(-1, -1)
    return tall.select(
        "step_idx",
        "step",
        "users",
        (
            F.col("users").cast("double") / F.sum("users").over(w)
        ).alias("conv_from_prev"),
        "truncated_users",
    )


def event_sequences(
    events: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
    tiebreak: str = "event_id",
    max_events_per_key: int | None = 100_000,
) -> DataFrame:
    """Per-user ordered event-initial string — the substrate for
    regex pattern matching over behavior (MATCH_RECOGNIZE-lite):
    `collect_list(struct(ts, tiebreak, chr))` in ONE hash aggregate,
    sorted per group AFTER aggregation (array_sort on the struct
    gives (ts, tiebreak) order without a global sort), then folded
    to a string. The (ts, tiebreak) key is total, so the string is
    deterministic.

    Bounded state: the string covers each user's FIRST
    `max_events_per_key` events (by (ts, tiebreak)); a row_number
    over the same user partitioning the aggregate shuffles on (one
    Exchange total) bounds the collect buffer itself — the
    `when(rn<=cap)` nulls are never collected — and `truncated`
    marks users whose timeline was cut. A bot key with 10⁸ events
    costs O(cap) task state instead of one unboundable row. Pass
    None to disable (exact, unbounded)."""
    if max_events_per_key is None:
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
        return events.groupBy(user).agg(
            seq.alias("seq"), F.lit(False).alias("truncated")
        )
    w = Window.partitionBy(user).orderBy(ts, tiebreak)
    ranked = events.select(
        F.col(user),
        F.col(ts),
        F.col(tiebreak),
        F.col(etype),
        F.row_number().over(w).alias("_rn"),
    )
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_rn") <= max_events_per_key,
                        F.struct(
                            F.col(ts).alias("t"),
                            F.col(tiebreak).alias("k"),
                            F.substring(F.col(etype), 1, 1).alias("c"),
                        ),
                    )
                )
            ),
            lambda x: x["c"],
        ),
        "",
    )
    return ranked.groupBy(user).agg(
        seq.alias("seq"),
        (F.max("_rn") > max_events_per_key).alias("truncated"),
    )


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


def item_cooccurrence(
    user_items: DataFrame,
    min_support: int = 20,
    max_items_per_user: int | None = 10_000,
    user: str = "user_id",
    item: str = "item",
) -> DataFrame:
    """Market-basket co-occurrence with lift + Jaccard over a DISTINCT
    (user, item) incidence — the collaborative-filtering primitive
    behind 'users who touched X also touched Y'.

    Heavy-key discipline (the same `max_events_per_key` pattern as
    `event_sequences`): the pair self-join on ``user`` has join
    degree = items-per-user SQUARED, so one bot user touching 10^5
    distinct items would emit 10^10 pairs from a single key. Each
    user is therefore capped to their first ``max_items_per_user``
    items (row_number over the deterministic item order — one
    Exchange, reused by the join), which bounds any single key's
    pair fan-out to cap^2 regardless of input skew; a
    ``truncated_users`` scalar column marks how many users were cut
    so the consumer sees the approximation. Item supports and the
    user universe are computed from the SAME capped incidence, so
    lift/jaccard stay internally consistent. Pass None to disable
    (exact, unbounded — small curated catalogs only)."""
    # NULL items are dropped BEFORE ranking: they could never survive
    # the a.item < b.item pair join, but if they occupied cap slots
    # the engine and an ANSI oracle would disagree on which real
    # items survive the cap (Spark sorts NULLS FIRST, DuckDB NULLS
    # LAST), silently changing the kept item set for capped users.
    ui = (
        user_items.select(
            F.col(user).alias("user_id"), F.col(item).alias("item")
        )
        .where(F.col("item").isNotNull())
        .distinct()
    )
    if max_items_per_user is None:
        capped = ui
        trunc = ui.agg(F.lit(0).cast("bigint").alias("truncated_users"))
    else:
        w = Window.partitionBy("user_id").orderBy("item")
        ranked = ui.select(
            "user_id", "item", F.row_number().over(w).alias("_rn")
        )
        capped = ranked.where(
            F.col("_rn") <= max_items_per_user
        ).select("user_id", "item")
        trunc = ranked.agg(
            F.count_distinct(
                F.when(F.col("_rn") > max_items_per_user, F.col("user_id"))
            )
            .cast("bigint")
            .alias("truncated_users")
        )
    cnt = capped.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    scalars = capped.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    a = capped.select("user_id", F.col("item").alias("item_a"))
    b = capped.select("user_id", F.col("item").alias("item_b"))
    co = (
        a.join(b, "user_id")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ca = cnt.select(F.col("item").alias("item_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("item").alias("item_b"), F.col("n").alias("nb"))
    from . import aggregates as agg

    scored = agg.attach_scalar(
        agg.attach_scalar(
            co.join(ca, "item_a").join(cb, "item_b"), scalars
        ),
        trunc,
    ).select(
        "item_a",
        "item_b",
        "n_both",
        F.round(
            F.col("n_both").cast("double")
            * F.col("n_users")
            / (F.col("na") * F.col("nb")),
            6,
        ).alias("lift"),
        F.round(
            F.col("n_both").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_both")),
            6,
        ).alias("jaccard"),
        "truncated_users",
    )
    return scored.where(F.col("n_both") >= min_support)
