"""Property-based invariants for the custom temporal joins
(operators/temporal.py): asof_join and range_join are compared
against brute-force Python references over hypothesis-generated
event frames. The example tests pin specific boundary cases (ties,
NULL keys, NULL timestamps); these pin the full semantics — backward
inclusive as-of with deterministic tie-breaks, and the bucketed
interval join's bin math (including caller-narrowed bin_width, where
the probe sequence must cover every middle bin, and pre-1970
timestamps, where long-cast truncation and floor differ but stay
consistent across both sides of the equi-join)."""

from collections import Counter

from hypothesis import given, settings, strategies as st


def _spark():
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
        get_spark,
    )

    return get_spark(
        app_name="engine-tests", master="local[4]", shuffle_partitions=4
    )


_key = st.one_of(st.none(), st.integers(min_value=0, max_value=2))
_ts = st.integers(min_value=-40, max_value=40)  # seconds around epoch 0

_left_rows = st.lists(
    st.tuples(_key, st.one_of(st.none(), _ts)), min_size=0, max_size=12
)
_right_rows = st.lists(
    st.tuples(_key, st.one_of(st.none(), _ts), st.integers(0, 9)),
    min_size=0,
    max_size=12,
)


def _frames(spark, left_rows, right_rows):
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    lschema = StructType(
        [
            StructField("k", IntegerType(), True),
            StructField("lsec", IntegerType(), True),
            StructField("lid", LongType(), False),
        ]
    )
    rschema = StructType(
        [
            StructField("k", IntegerType(), True),
            StructField("rsec", IntegerType(), True),
            StructField("rid", LongType(), False),
        ]
    )
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], lschema
    ).withColumn("lts", F.timestamp_seconds("lsec"))
    right = spark.createDataFrame(
        [(k, t, v) for (k, t, v) in right_rows], rschema
    ).withColumn("rts", F.timestamp_seconds("rsec"))
    return left, right


@settings(max_examples=12, deadline=None)
@given(left_rows=_left_rows, right_rows=_right_rows)
def test_asof_join_matches_bruteforce(left_rows, right_rows):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        temporal as TP,
    )

    spark = _spark()
    left, right = _frames(spark, left_rows, right_rows)
    out = TP.asof_join(
        left.select("k", "lid", "lts"),
        right.select("k", "rid", "rts"),
        on=["k"],
        left_ts="lts",
        right_ts="rts",
        right_payload=["rid"],
    )
    got = {r.lid: r.asof_rid for r in out.collect()}

    expect = {}
    for lid, (k, lt) in enumerate(left_rows):
        best = None
        if k is not None and lt is not None:
            cands = [
                (t, v)
                for (rk, t, v) in right_rows
                if rk == k and t is not None and t <= lt
            ]
            if cands:
                # backward inclusive; ties at equal ts resolve to the
                # greatest payload (the documented deterministic order)
                best = max(cands)[1]
        expect[lid] = best

    assert got == expect


@settings(max_examples=12, deadline=None)
@given(
    left_rows=_left_rows,
    right_rows=_right_rows,
    lower=st.integers(min_value=-15, max_value=15),
    span=st.integers(min_value=0, max_value=20),
    bin_width=st.sampled_from([None, 1, 3, 7]),
)
def test_range_join_matches_bruteforce(
    left_rows, right_rows, lower, span, bin_width
):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        temporal as TP,
    )

    spark = _spark()
    upper = lower + span
    left, right = _frames(spark, left_rows, right_rows)
    out = TP.range_join(
        left.select("k", "lid", "lts"),
        right.select("k", "rid", "rts"),
        on=["k"],
        left_ts="lts",
        right_ts="rts",
        lower=float(lower),
        upper=float(upper),
        bin_width=bin_width,
    )
    got = Counter((r.lid, r.rid) for r in out.collect())

    expect = Counter()
    for lid, (k, lt) in enumerate(left_rows):
        if k is None or lt is None:
            continue
        for rk, t, v in right_rows:
            if rk == k and t is not None and lt + lower <= t <= lt + upper:
                expect[(lid, v)] += 1

    assert got == expect


_funnel_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.sampled_from(["a", "b", "c", "x"]),  # type ("x" = noise)
        st.integers(min_value=0, max_value=30),  # ts seconds
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(events=_funnel_events, gap=st.sampled_from([None, 1, 5, 10]))
def test_funnel_matches_first_touch_reference(events, gap):
    """First-touch greedy per the docstring: each step's chosen
    occurrence is the MIN ts strictly after the previous step's
    chosen occurrence (and within max_gap_s of it when set); a user
    survives step k iff such an occurrence exists. The reference
    replays exactly that — including the non-optimality of greedy
    (a user may fail the funnel even when a later step-0 event would
    have completed it)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        temporal as TP,
    )

    steps = ["a", "b", "c"]
    spark = _spark()
    schema = StructType(
        [
            StructField("user_id", IntegerType(), False),
            StructField("event_type", StringType(), False),
            StructField("sec", IntegerType(), False),
        ]
    )
    e = spark.createDataFrame(events, schema).withColumn(
        "ts", F.timestamp_seconds("sec")
    )
    out = TP.funnel(e, steps, max_gap_s=gap)
    got = {r.step: r.n_users for r in out.collect()}

    expect = {s: 0 for s in steps}
    for u in {ev[0] for ev in events}:
        mine = [(t, ty) for (uu, ty, t) in events if uu == u]
        prev_t = None
        for k, step in enumerate(steps):
            if k == 0:
                cands = [t for (t, ty) in mine if ty == step]
            else:
                cands = [
                    t
                    for (t, ty) in mine
                    if ty == step
                    and t > prev_t
                    and (gap is None or t <= prev_t + gap)
                ]
            if not cands:
                break
            prev_t = min(cands)
            expect[step] += 1

    assert got == expect


_cohort_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # user
        st.integers(min_value=0, max_value=20),  # day offset
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(events=_cohort_events, granularity=st.sampled_from(["day", "week"]))
def test_cohort_retention_matches_reference(events, granularity):
    """Cohort matrix vs a Python replay: cohort = truncated first
    event, one count per (cohort, offset) cell per distinct active
    user, retention = cell / cell(offset 0)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        temporal as TP,
    )

    base = dt.date(2024, 1, 1)  # a Monday, so week-trunc math is easy
    spark = _spark()
    e = spark.createDataFrame(
        events, "user_id int, d int"
    ).withColumn("ts", F.timestamp_seconds(F.col("d") * 86_400 + 1_704_067_200))
    out = TP.cohort_retention(e, granularity=granularity)
    got = {
        (str(r.cohort_start), r.period_offset): (r.n_users, r.retention)
        for r in out.collect()
    }

    per = 7 if granularity == "week" else 1

    def trunc(day):
        date = base + dt.timedelta(days=day)
        if granularity == "week":
            date = date - dt.timedelta(days=date.weekday())
        return date

    first = {}
    for u, d in events:
        first[u] = min(first.get(u, d), d)
    cells = {}
    for u, d in set(events):
        cw, wk = trunc(first[u]), trunc(d)
        off = (wk - cw).days // per
        cells.setdefault((str(cw), off), set()).add(u)
    expect = {}
    for (cw, off), users in cells.items():
        base_n = len(cells[(cw, 0)])
        expect[(cw, off)] = (
            len(users),
            round(len(users) / base_n, 6),
        )

    assert got == expect


def test_cohort_retention_null_ts_does_not_corrupt_denominator():
    """A single NULL-ts event produced a NULL period_offset row that
    sorted NULLS FIRST, becoming every cell's retention denominator
    (cells could exceed 1.0) — r12 review find."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.temporal import (
        cohort_retention,
    )

    spark = _spark()
    events = spark.createDataFrame(
        [
            (1, None),
            (1, "2024-01-10 10:00:00"),
            (2, "2024-01-10 11:00:00"),
            (1, "2024-01-17 10:00:00"),
        ],
        "user_id bigint, ts string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    rows = {
        (r["cohort_start"].isoformat(), r["period_offset"]): (
            r["n_users"], r["retention"]
        )
        for r in cohort_retention(events).collect()
    }
    assert rows[("2024-01-08", 0)] == (2, 1.0)
    assert rows[("2024-01-08", 1)] == (1, 0.5)
    assert len(rows) == 2  # no NULL-offset row


def test_funnel_null_ts_step0_not_a_survivor():
    """A user whose only step-0 event has a NULL ts can never convert
    and must not count as a step-0 survivor (r12 review find)."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.temporal import (
        funnel,
    )

    spark = _spark()
    events = spark.createDataFrame(
        [
            (1, "view", None),
            (2, "view", "2024-01-01 10:00:00"),
            (2, "click", "2024-01-01 10:05:00"),
        ],
        "user_id bigint, event_type string, ts string",
    ).selectExpr(
        "user_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts"
    )
    rows = {
        r["step"]: (r["n_users"], r["conv_prev"])
        for r in funnel(events, ["view", "click"]).collect()
    }
    assert rows["view"][0] == 1
    assert rows["click"] == (1, 1.0)


def test_zscore_all_null_day_key_skipped_not_crashed():
    """A key whose every day is NULL reached the span guard as
    (null, null) and crashed the whole job via assert_true(NULL)
    instead of being skipped (r12 review find)."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.temporal import (
        zscore_daily_counts,
    )

    spark = _spark()
    daily = spark.createDataFrame(
        [("bad", None, 5)]
        + [("good", f"2024-01-{d:02d}", 10 + d % 3) for d in range(1, 15)],
        "key string, day string, cnt bigint",
    ).selectExpr("key", "CAST(day AS DATE) AS day", "cnt")
    out = zscore_daily_counts(daily).collect()
    keys = {r["key"] for r in out}
    assert keys == {"good"}  # 'bad' skipped, job alive


def test_asof_join_arg_validation():
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.temporal import (
        asof_join,
    )
    import pytest

    spark = _spark()
    l = spark.createDataFrame([(1, "2024-01-01 10:00:00")], "k bigint, ts string")
    r = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 5.0)], "k bigint, ts2 string, v double"
    )
    with pytest.raises(ValueError, match="right_payload"):
        asof_join(l, r, on=["k"], left_ts="ts", right_ts="ts2", right_payload=[])
    bad = l.withColumn("_side", l.k)
    with pytest.raises(ValueError, match="_side"):
        asof_join(bad, r, on=["k"], left_ts="ts", right_ts="ts2")
