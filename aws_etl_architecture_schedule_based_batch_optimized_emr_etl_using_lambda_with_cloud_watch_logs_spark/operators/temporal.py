"""Temporal join operators — custom operators Spark lacks natively,
composed from existing DataFrame ops (charter §custom-operators; no
counterpart in the reference, whose only temporal logic is the
partition-column derivation at ``emr_json_parquet_schema_drift_etl.py:327-331``).

The as-of join uses the union + windowed last-non-null composition:
both sides are unioned with a side tag, sorted within each key by
(ts, side), and every left row picks up the most recent right payload
via ``last(..., ignorenulls=True)`` over an unbounded-preceding
window. ONE shuffle on the join key — same cost as a regular
sort-merge join, no range-explosion, no skew beyond the key's own
distribution. This is the standard scalable formulation (a
broadcast-range variant only wins when one side is tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cascading_rollup(
    events: DataFrame,
    ts_col: str,
    group_cols: list[str],
    value_col: str,
    granularities: list[str],
) -> dict[str, DataFrame]:
    """Hypertable-style multi-granularity rollup: the finest bucket
    aggregates from raw data; every coarser bucket aggregates FROM
    the previous rollup, not from raw (sum/count/min/max are
    associative). At 100 TB this is the difference between one raw
    scan per granularity and one raw scan total — the continuous-
    aggregate pattern. ``granularities`` must be ordered finest →
    coarsest, each a Spark interval string evenly dividing the next.

    Returns {granularity: DataFrame(bucket_start, *group_cols,
    n_events, sum_value, min_value, max_value)}.
    """
    if not granularities:
        raise ValueError("cascading_rollup needs at least one granularity")
    out: dict[str, DataFrame] = {}
    current = (
        events.groupBy(
            F.window(ts_col, granularities[0]).alias("w"), *group_cols
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "*")
        .drop("w")
    )
    out[granularities[0]] = current
    for gran in granularities[1:]:
        current = (
            current.groupBy(
                F.window("bucket_start", gran).alias("w"), *group_cols
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
            .select(F.col("w.start").alias("bucket_start"), "*")
            .drop("w")
        )
        out[gran] = current
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: float,
    upper: float,
    bin_width: int | None = None,
) -> DataFrame:
    """Interval join: all (left, right) pairs with equal ``on`` keys
    and ``left_ts + lower <= right_ts <= left_ts + upper`` (bounds in
    seconds, inclusive). ``left_ts`` and ``right_ts`` must be named
    differently (rename one side before calling).

    Naive formulation (equi-join on keys + range filter) degenerates:
    every key's full history joins against itself before filtering.
    This implementation bins time into ``upper - lower``-wide buckets
    and equi-joins on (keys, bin), with each left row probing the two
    bins its window can overlap — the standard bucketed interval
    join. The shuffle key gains time locality, and per-task work is
    bounded by events-per-bin, not events-per-key.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must have distinct names")
    if bin_width is not None and bin_width <= 0:
        # 0 would silently fall through `or` to the default and a
        # negative width garbles the binning arithmetic — fail fast
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    width = bin_width or max(1, int(upper - lower))
    # TIMESTAMP_NTZ (Spark 4 reads tz-less parquet as NTZ) is rejected
    # by unix_micros; the cast is a no-op for plain timestamps.
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    width_us = width * 1_000_000
    lower_us, upper_us = int(lower * 1_000_000), int(upper * 1_000_000)

    # Probe EVERY bin the window can overlap (a sequence, not just
    # the endpoint bins): with the default width = upper - lower the
    # window spans at most 2 bins and this is identical, but a
    # caller-supplied narrower bin_width makes the window span
    # ⌈span/width⌉ + 1 bins — endpoint-only probing would silently
    # drop matches from the middle bins.
    lhs = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                ((l_us + F.lit(lower_us)) / width_us).cast("long"),
                ((l_us + F.lit(upper_us)) / width_us).cast("long"),
            )
        ),
    )
    rhs = right.withColumn("_bin", (r_us / width_us).cast("long"))

    joined = lhs.join(rhs, [*on, "_bin"]).drop("_bin")
    # l_us / r_us are unbound column expressions — reused directly so
    # the range filter can never diverge from the bin assignment
    return joined.filter(
        (r_us >= l_us + F.lit(lower_us)) & (r_us <= l_us + F.lit(upper_us))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the payload of the most recent right
    row with ``right.ts <= left.ts`` and equal ``on`` keys (backward
    as-of, inclusive — DuckDB/pandas ``merge_asof`` semantics).

    Left rows with no prior right row keep null payload columns.
    Ties: at equal timestamps the right row sorts before the left
    row, so an exactly-simultaneous right row matches; among multiple
    right rows at the same (key, ts) the last by payload order wins
    deterministically via the secondary sort on the payload struct.

    The payload travels as ONE struct column so the windowed
    ``last(ignorenulls)`` always takes every field from the same
    right row (per-column fills could mix rows when a payload field
    is genuinely null).
    """
    if right_payload is None:
        right_payload = [
            c for c in right.columns if c not in on and c != right_ts
        ]
    elif not right_payload:
        # an explicit empty list is almost certainly a bug — the old
        # `or` fallback silently expanded it to EVERY right column
        raise ValueError(
            "right_payload must be non-empty; pass None to take every "
            "non-key right column"
        )
    reserved = {"_ats", "_side", "_rp", "_rp_filled"}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(clash)} internally; "
            f"rename them on the left input"
        )

    # SQL ASOF / merge_asof semantics: a NULL join key matches
    # nothing and a NULL right timestamp can never be "the most
    # recent prior row". Unfiltered, Window.partitionBy groups NULL
    # keys together (NULL-keyed left rows would inherit NULL-keyed
    # right payloads) and NULLS-FIRST ordering would hand every
    # pre-first-right left row the NULL-ts row's payload.
    for k in on:
        right = right.filter(F.col(k).isNotNull())
    right = right.filter(F.col(right_ts).isNotNull())

    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    # ONE analysis pass over the right plan for the payload type (it
    # was derived twice — here and again for the sort-orderability
    # check below)
    rp_type = right.select(payload_struct.alias("_rp")).schema["_rp"]
    left_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).cast("timestamp").alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rp_type.dataType).alias("_rp"),
    )
    right_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on
        ],
        *[F.col(c) for c in on],
        F.col(right_ts).cast("timestamp").alias("_ats"),
        F.lit(0).alias("_side"),
        payload_struct.alias("_rp"),
    )
    unioned = left_tagged.unionByName(right_tagged)

    # the payload struct joins the sort only when its type is
    # orderable — a MapType payload field would otherwise throw
    # AnalysisException from the ORDER BY even though the struct is
    # only needed for transport; without it, ties among right rows
    # at the same (key, ts) fall back to arrival order
    def _orderable(dt) -> bool:
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    order_cols = ["_ats", "_side"] + (
        ["_rp"] if _orderable(rp_type.dataType) else []
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        F.last("_rp", ignorenulls=True).over(w).alias("_rp_filled"),
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[
                F.col("_rp_filled").getField(c).alias(f"{prefix}{c}")
                for c in right_payload
            ],
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_s: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: for each step k, the users who
    performed steps[0..k] in strict timestamp order (each step
    strictly after the previous step's FIRST qualifying occurrence —
    the standard first-touch funnel). Returns one row per step with
    the surviving-user count, conversion vs the first step, and
    conversion vs the previous step (NULL on the first row). With
    ``max_gap_s`` each step must also land within that many seconds
    of the previous step's chosen occurrence (exact µs integer
    arithmetic, so both engines agree bit-for-bit).

    Scale shape: step k is a hash aggregate of the type-k slice
    joined to the (user, t) survivors of step k-1 — every shuffle is
    keyed on the user column, so Catalyst/AQE reuses one exchange
    layout down the chain; survivor frames shrink monotonically. The
    k-row summary is unioned and windowed in-plan (no collect)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    # SQL-funnel semantics: an event with no timestamp can neither
    # anchor nor satisfy an ordering constraint — a NULL-ts step-0
    # event would count its user as a survivor who can never convert,
    # deflating every later conversion rate (r12 review find)
    events = events.filter(F.col(ts_col).isNotNull())
    survivors = None
    counts = None
    for idx, step in enumerate(steps):
        s = events.filter(F.col(type_col) == step).select(user_col, ts_col)
        if survivors is None:
            survivors = s.groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        else:
            after_prev = F.col(ts_col) > F.col("_pt")
            if max_gap_s is not None:
                # TIMESTAMP_NTZ (Spark 4 reads tz-less parquet as
                # NTZ) is rejected by unix_micros; the cast is a
                # no-op for plain timestamps (same as range_join).
                after_prev = after_prev & (
                    F.unix_micros(F.col(ts_col).cast("timestamp"))
                    <= F.unix_micros(F.col("_pt").cast("timestamp"))
                    + max_gap_s * 1_000_000
                )
            survivors = (
                s.join(
                    survivors.select(user_col, F.col("_t").alias("_pt")),
                    user_col,
                )
                .filter(after_prev)
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("_t"))
            )
        row = survivors.agg(F.count("*").alias("n_users")).select(
            F.lit(idx).alias("step_idx"),
            F.lit(step).alias("step"),
            "n_users",
        )
        counts = row if counts is None else counts.unionByName(row)
    w = Window.orderBy("step_idx")
    n = F.col("n_users").cast("double")
    # try_divide, not /: a zero-survivor step (no step-0 events at
    # all, or a fully-dropped later step) makes a downstream ratio's
    # denominator 0, which under ANSI mode is a runtime
    # DIVIDE_BY_ZERO crash, not a quiet NULL/NaN (found by the
    # funnel property test). Conversion against an empty step is
    # undefined — NULL is the honest value.
    return counts.select(
        "step_idx",
        "step",
        "n_users",
        F.round(
            F.try_divide(n, F.first("n_users").over(w)), 6
        ).alias("conv_overall"),
        F.round(
            F.try_divide(n, F.lag("n_users").over(w)), 6
        ).alias("conv_prev"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Cohort-retention matrix: users grouped by the week (or day) of
    their first event (cohort), counted once per later period they
    were active; ``retention`` is each cell's distinct-user count
    over the cohort's period-0 count (period 0 is always present —
    every user is active in their own first period).

    Scale shape: first-event frame is one user-keyed hash aggregate;
    the (user, period) activity frame is a distinct on the same key,
    so the join back is co-partitioned; the matrix aggregate is keyed
    on (cohort, offset) — all linear, and the retention window runs
    over the cohort×offset matrix (periods², not rows)."""
    if granularity not in ("week", "day"):
        raise ValueError("granularity must be 'week' or 'day'")
    # a NULL timestamp yields a NULL period_offset row that sorts
    # NULLS FIRST, so F.first over the retention window would return
    # ITS count as every cell's denominator (r12 review find); a NULL
    # user can anchor no cohort
    events = events.filter(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    )
    per_days = 7 if granularity == "week" else 1
    trunc = lambda c: F.to_date(F.date_trunc(granularity, c))  # noqa: E731
    first = events.groupBy(user_col).agg(
        trunc(F.min(ts_col)).alias("_cw")
    )
    active = events.select(
        user_col, trunc(F.col(ts_col)).alias("_wk")
    ).distinct()
    cells = (
        active.join(first, user_col)
        .groupBy(
            F.col("_cw").alias("cohort_start"),
            (F.datediff("_wk", "_cw") / per_days)
            .cast("int")
            .alias("period_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_users"))
    )
    w = (
        Window.partitionBy("cohort_start")
        .orderBy("period_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cells.select(
        "cohort_start",
        "period_offset",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.first("n_users").over(w), 6
        ).alias("retention"),
    )


def rolling_zscore_anomalies(
    events: DataFrame,
    window_days: int = 7,
    z_threshold: float = 2.0,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily-count anomaly detection per event type: each day's count
    is scored against the TRAILING ``window_days`` days (never
    including itself — no target leakage) as
    ``z = (cnt − mean) / stddev_samp``; a day is anomalous when
    |z| > z_threshold. The standard training-pipeline observability
    signal ("did yesterday's crawl volume spike?" — and, since the
    calendar is DENSIFIED, "did it drop to zero?").

    Plan: one linear date-truncate + (key, day) hash aggregate
    (map-side combined); each key's calendar is then densified from
    its first to its last active day (per-key min/max + an exploded
    date sequence left-joined back, zero counts filled in — frames
    stay aggregate-sized), and a bounded ROWS-frame window runs over
    the k·days dense aggregate — never the raw events, so the frame
    entering the sort is tiny relative to the corpus and partitions
    by key (no single-partition global sort). Densification makes
    the trailing window a true trailing-calendar-days baseline
    (before round 9 it was the trailing N OBSERVED days — calendar
    gaps stretched it — and a zero-event day produced no row at all,
    so a volume drop to zero was never scored). Days before a key's
    first or after its last observation are not invented. Days with
    fewer than ``window_days`` prior calendar days in-span
    or zero variance are not scored (baseline undefined). ``z`` is
    rounded to 4 decimals; the anomaly flag tests the rounded value
    so the verdict is engine-reproducible (both engines compute the
    same exact integer mean; stddev differs only in ulps)."""
    daily = events.groupBy(
        F.col(key_col).alias("key"), F.to_date(ts_col).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return zscore_daily_counts(daily, window_days, z_threshold)


def zscore_daily_counts(
    daily: DataFrame,
    window_days: int = 7,
    z_threshold: float = 2.0,
    max_span_days: int = 36_524,
) -> DataFrame:
    """The scoring half of :func:`rolling_zscore_anomalies`, exposed
    separately so a STREAMED daily aggregate (bronze layer: a
    watermarked 1-day tumbling window) can feed the same batch
    scoring window (silver layer) — the stream-then-score shape the
    streaming gate pins against its batch twin. ``daily`` must carry
    (key, day, cnt); zero-count calendar days inside each key's
    observed span are filled in here (see
    :func:`rolling_zscore_anomalies` on why), so both the batch and
    the streamed feed densify identically.

    ``max_span_days`` (default 100 years) is a spine-inflation
    fail-fast: the calendar fill generates one row per day of each
    key's observed [min, max] span, so a single corrupt far-future
    (or pre-epoch) timestamp would silently mint millions of spine
    rows per key — at real scale an executor-OOM, not a result. The
    guard lives INSIDE the sequence bound (assert_true under
    coalesce, not a prunable side column), costs nothing on healthy
    data, and raises with the offending span at execution time."""
    # a NULL day (unparseable/NULL source timestamps) has no calendar
    # position: it cannot join the spine, and a key whose EVERY day is
    # NULL would reach the span guard as (null, null) and crash the
    # whole job via assert_true(NULL) instead of being skipped (r12
    # review find)
    daily = daily.filter(F.col("day").isNotNull())
    spans = daily.groupBy("key").agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    )
    hi_guarded = F.coalesce(
        F.assert_true(
            F.datediff("_hi", "_lo") <= F.lit(max_span_days),
            F.concat(
                F.lit(
                    "zscore_daily_counts: key spans more than "
                    f"{max_span_days} days ("
                ),
                F.col("_lo").cast("string"),
                F.lit(" .. "),
                F.col("_hi").cast("string"),
                F.lit(
                    ") — the calendar fill would explode; clean the "
                    "corrupt timestamps or raise max_span_days"
                ),
            ),
        ).cast("date"),
        F.col("_hi"),
    )
    cal = spans.select(
        "key", F.explode(F.sequence("_lo", hi_guarded)).alias("day")
    )
    daily = cal.join(daily, ["key", "day"], "left").select(
        "key",
        "day",
        F.coalesce("cnt", F.lit(0).cast("long")).alias("cnt"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(-window_days, -1)
    )
    scored = daily.select(
        "key",
        "day",
        "cnt",
        F.count("cnt").over(w).alias("_n_prior"),
        F.avg("cnt").over(w).alias("_mu"),
        F.stddev_samp("cnt").over(w).alias("_sd"),
    ).filter(
        (F.col("_n_prior") == window_days) & (F.col("_sd") > 0)
    )
    z = F.round((F.col("cnt") - F.col("_mu")) / F.col("_sd"), 4)
    return scored.select(
        "key",
        "day",
        "cnt",
        z.alias("z"),
        (F.abs(z) > F.lit(z_threshold)).alias("is_anomaly"),
    )
