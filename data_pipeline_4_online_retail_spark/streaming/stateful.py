"""Custom stateful streaming: per-user session tracking with
``applyInPandasWithState`` — the escape hatch for operators Spark's
built-in windows can't express (custom eviction, per-key state machines,
running ML features).

Demonstrated operator: per-user running event counter with session
semantics — state carries (session_count, last_ts); a new event more than
``gap`` after ``last_ts`` increments the session counter. Emits one row
per user per micro-batch; state is evicted via processing-time timeout
when a user goes quiet.

Scale: state is partitioned by user_id across executors; each key's state
is a few bytes, so the state store holds billions of users. The same
function body runs in batch tests through ``applyInPandas`` (no state) for
logic verification.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP = timedelta(minutes=5)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events_total", T.LongType(), False),
        T.StructField("n_sessions", T.LongType(), False),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events_total", T.LongType(), False),
        T.StructField("n_sessions", T.LongType(), False),
        T.StructField("last_ts_epoch_us", T.LongType(), True),
    ]
)


_GAP_US = int(SESSION_GAP.total_seconds() * 1_000_000)


def _update_user_sessions(key, pdf_iter, state: GroupState):
    """State update function: fold this micro-batch's events for one user
    into (total events, session count, last timestamp).

    Timestamps stay epoch MICROSECONDS end-to-end inside the state: mixing
    pandas ``Timestamp.timestamp()`` (naive→UTC) with
    ``datetime.fromtimestamp`` (epoch→LOCAL tz) shifts ``last`` by the
    host's UTC offset on any non-UTC executor and misclassifies session
    boundaries — integer epoch deltas have no timezone at all."""
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        # idle past the eviction horizon: drop the state entirely. A user
        # returning later restarts from zero — the documented trade-off
        # of bounded state (same contract as watermark-expired windows).
        state.remove()
        return
    if state.exists:
        n_total, n_sessions, last_us = state.get
    else:
        n_total, n_sessions, last_us = 0, 0, None

    ts_us_list: list[int] = []
    for pdf in pdf_iter:
        ts_us = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
        ts_us_list.extend(int(v) for v in ts_us)
        n_total += len(pdf)
    for ts_us in sorted(ts_us_list):
        if last_us is None or (ts_us - last_us) > _GAP_US:
            n_sessions += 1
        last_us = ts_us

    state.update((n_total, n_sessions, last_us))
    try:
        state.setTimeoutDuration(60 * 60 * 1000)  # evict after 1h idle
    except Exception:
        # timeout not enabled (NoTimeout harness) — eviction is a
        # deployment concern, not a semantics one
        pass
    yield pd.DataFrame(
        [
            (
                user_id,
                n_total,
                n_sessions,
                # naive timestamp from epoch-us, no local-tz conversion
                pd.Timestamp(last_us, unit="us") if last_us is not None else None,
            )
        ],
        columns=["user_id", "n_events_total", "n_sessions", "last_ts"],
    )


def user_session_tracker(
    events_stream: DataFrame, *, evict_idle: bool = False
) -> DataFrame:
    """Wire the stateful operator onto a streaming events DataFrame.

    ``evict_idle=True`` enables ProcessingTimeTimeout state eviction for
    long-running continuous deployments. Leave it off under
    ``trigger(availableNow=True)`` harnesses: pending timeouts keep the
    query alive past input exhaustion, so drain-style runs never terminate.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout
    )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_sessions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Streaming funnel: the stateful twin of operators/events_windows.ev_funnel
# ---------------------------------------------------------------------------

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("signup_ts", T.TimestampType(), True),
        T.StructField("view_ts", T.TimestampType(), True),
        T.StructField("click_ts", T.TimestampType(), True),
        T.StructField("purchase_ts", T.TimestampType(), True),
        T.StructField("funnel_stage", T.IntegerType(), False),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("signup_us", T.LongType(), True),
        T.StructField("view_us", T.LongType(), True),
        T.StructField("click_us", T.LongType(), True),
        T.StructField("purchase_us", T.LongType(), True),
    ]
)

# At equal timestamps the earlier funnel stage applies first, matching the
# batch semantics where each stage's MIN uses ts >= previous stage's ts
# (inclusive).
_FUNNEL_STAGE_ORDER = {"signup": 0, "view": 1, "click": 2, "purchase": 3}


def _update_funnel(key, pdf_iter, state: GroupState, idle_ms: int | None = None):
    """One-pass funnel state machine per user: fold this micro-batch's
    events in (ts, stage) order into the first-qualifying-timestamp chain
    signup → view → click → purchase.

    Processing events in event-time order makes the fold compute exactly
    the batch semantics (each stage = MIN qualifying ts at-or-after the
    previous stage). Cross-batch ordering is the event-time-frontier
    assumption: an event older than an already-applied later stage cannot
    retract it — the same contract as watermark-dropped late data in the
    built-in windows. Timestamps stay epoch-µs inside the state (see
    _update_user_sessions for why: no local-tz round trips).

    With ``idle_ms`` set (evict_idle deployments), a user idle past the
    horizon gets ONE tombstone row — the final funnel state with
    ``funnel_stage = -1`` — and the state is removed: the state store
    stays bounded by the active-user set, not the all-time user set. A
    returning user restarts the funnel from scratch (the same contract
    as watermark-expired windows)."""
    import pandas as pd

    def _ts(us):
        return pd.Timestamp(us, unit="us") if us is not None else None

    _COLS = [
        "user_id", "signup_ts", "view_ts", "click_ts", "purchase_ts",
        "funnel_stage",
    ]

    (user_id,) = key
    if state.hasTimedOut:
        s_us, v_us, c_us, p_us = state.get if state.exists else (None,) * 4
        state.remove()
        yield pd.DataFrame(
            [(user_id, _ts(s_us), _ts(v_us), _ts(c_us), _ts(p_us), -1)],
            columns=_COLS,
        )
        return
    if state.exists:
        s_us, v_us, c_us, p_us = state.get
    else:
        s_us, v_us, c_us, p_us = None, None, None, None

    evs: list[tuple[int, int]] = []
    for pdf in pdf_iter:
        ts_us = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
        for t, etype in zip(ts_us, pdf["event_type"]):
            order = _FUNNEL_STAGE_ORDER.get(etype)
            if order is not None:
                evs.append((int(t), order))
    for t, order in sorted(evs):
        if order == 0 and s_us is None:
            s_us = t
        elif order == 1 and s_us is not None and v_us is None and t >= s_us:
            v_us = t
        elif order == 2 and v_us is not None and c_us is None and t >= v_us:
            c_us = t
        elif order == 3 and c_us is not None and p_us is None and t >= c_us:
            p_us = t

    state.update((s_us, v_us, c_us, p_us))
    if idle_ms is not None:
        state.setTimeoutDuration(idle_ms)
    stage = 4 if p_us else 3 if c_us else 2 if v_us else 1 if s_us else 0

    yield pd.DataFrame(
        [(user_id, _ts(s_us), _ts(v_us), _ts(c_us), _ts(p_us), stage)],
        columns=_COLS,
    )


def funnel_tracker(
    events_stream: DataFrame,
    *,
    evict_idle: bool = False,
    idle_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming funnel over (user_id, event_type, ts): emits each user's
    current funnel row every micro-batch; state is 4 longs per user, so
    the state store scales to billions of keys partitioned by user_id.

    ``evict_idle=True`` turns on ProcessingTimeTimeout eviction: users
    idle past ``idle_timeout_ms`` emit one funnel_stage=-1 tombstone and
    their state is dropped, bounding the store by the ACTIVE-user set.
    Leave it off under ``trigger(availableNow=True)`` harnesses — pending
    timeouts keep drain-style queries alive past input exhaustion."""
    if evict_idle:
        import functools

        return events_stream.groupBy("user_id").applyInPandasWithState(
            functools.partial(_update_funnel, idle_ms=idle_timeout_ms),
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming cohort tracking: the stateful twin of ev_cohort_retention
# ---------------------------------------------------------------------------

COHORT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("cohort_day", T.DateType(), False),
        T.StructField("day_offsets", T.ArrayType(T.IntegerType()), False),
    ]
)

COHORT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("days", T.ArrayType(T.IntegerType()), False),
    ]
)

_US_PER_DAY = 86_400_000_000


def _update_cohort(key, pdf_iter, state: GroupState, idle_ms: int | None = None):
    """Per-user activity-day accumulator: state is the distinct set of
    epoch-day numbers the user was active on; the cohort day is its
    minimum, the retention offsets are day - cohort_day. Epoch-day ints
    end-to-end (see _update_user_sessions for the no-local-tz rule);
    under the pinned-UTC session they equal `CAST(ts AS DATE)`. Unlike
    the funnel, day-set union is commutative — late or out-of-order
    events can only grow the set, never retract, so stream == batch
    holds under ANY delivery order."""
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        # bounded-state eviction: the day set is the one per-user state
        # here that actually GROWS over time, so idle eviction matters
        # most. Tombstone = the final cohort day with an EMPTY offsets
        # array; a returning user starts a fresh cohort.
        days_f = sorted(state.get[0]) if state.exists else []
        state.remove()
        cohort_f = days_f[0] if days_f else 0
        yield pd.DataFrame(
            [(user_id, pd.Timestamp(cohort_f * 86_400, unit="s").date(), [])],
            columns=["user_id", "cohort_day", "day_offsets"],
        )
        return
    days: set[int] = set(state.get[0]) if state.exists else set()
    for pdf in pdf_iter:
        ts_us = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
        days.update(int(t) // _US_PER_DAY for t in ts_us)

    ordered = sorted(days)
    state.update((ordered,))
    if idle_ms is not None:
        state.setTimeoutDuration(idle_ms)
    cohort = ordered[0]
    yield pd.DataFrame(
        [
            (
                user_id,
                pd.Timestamp(cohort * 86_400, unit="s").date(),
                [d - cohort for d in ordered],
            )
        ],
        columns=["user_id", "cohort_day", "day_offsets"],
    )


def cohort_tracker(
    events_stream: DataFrame,
    *,
    evict_idle: bool = False,
    idle_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming cohort/retention input over (user_id, ts): each
    micro-batch emits every touched user's (cohort day, retention
    offsets); the retention triangle is one aggregation over the latest
    state per user. State is one int per distinct active day per user —
    bounded by the observation span, partitioned by user_id.

    ``evict_idle=True``: users idle past ``idle_timeout_ms`` emit one
    empty-offsets tombstone and their day set is dropped (the growing
    per-user state is exactly what needs a horizon in a continuous
    deployment). Off under availableNow harnesses — pending timeouts
    keep drain-style queries alive."""
    if evict_idle:
        import functools

        return events_stream.groupBy("user_id").applyInPandasWithState(
            functools.partial(_update_cohort, idle_ms=idle_timeout_ms),
            outputStructType=COHORT_OUTPUT_SCHEMA,
            stateStructType=COHORT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_cohort,
        outputStructType=COHORT_OUTPUT_SCHEMA,
        stateStructType=COHORT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming anomaly detection: online Welford z-scores per user
# ---------------------------------------------------------------------------

ANOMALY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("day", T.DateType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("zscore", T.DoubleType(), True),
        T.StructField("is_anomaly", T.IntegerType(), False),
    ]
)

ANOMALY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_days", T.LongType(), False),
        T.StructField("mean", T.DoubleType(), False),
        T.StructField("m2", T.DoubleType(), False),
    ]
)


def _update_anomaly(key, pdf_iter, state: GroupState):
    """Prequential per-user anomaly detector: each completed day's event
    count is z-scored against the user's history SO FAR (Welford running
    mean/M2 — O(1) state), then folded in. This is the deployable twin
    of the batch ev_anomaly_zscore, with the honest streaming semantic
    shift: the batch op scores against ALL days (including future ones),
    a stream can only score against the past — so the first days emit
    NULL z-scores while the baseline warms up. Contract: micro-batches
    are day-complete per user (daily-file ingestion), same event-time-
    frontier assumption as the funnel."""
    import math

    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)

    day_counts: dict[int, int] = {}
    for pdf in pdf_iter:
        days = (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000) // _US_PER_DAY
        for d in days:
            day_counts[int(d)] = day_counts.get(int(d), 0) + 1

    rows = []
    for d in sorted(day_counts):
        x = float(day_counts[d])
        var = m2 / n if n > 0 else 0.0
        if n >= 2 and var > 0:
            z = (x - mean) / math.sqrt(var)
            flagged = 1 if abs(z) > 2.0 else 0
        else:
            z, flagged = None, 0
        rows.append(
            (user_id, pd.Timestamp(d * 86_400, unit="s").date(),
             int(x), z, flagged)
        )
        n += 1
        delta = x - mean
        mean += delta / n
        m2 += delta * (x - mean)

    state.update((n, mean, m2))
    yield pd.DataFrame(
        rows, columns=["user_id", "day", "n_events", "zscore", "is_anomaly"]
    )


def anomaly_tracker(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user daily-volume anomaly flags over (user_id, ts):
    O(1) Welford state per user (3 numbers), partitioned by user_id —
    billions of users fit the state store."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_anomaly,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming EWMA: the stateful twin of operators/events_windows.ev_ewma_level
# ---------------------------------------------------------------------------

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("level", T.DoubleType(), True),
    ]
)

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("ewma_level", T.DoubleType(), True),
    ]
)


def _update_ewma(key, pdf_iter, state: GroupState):
    """Fold one user's micro-batch into (count, level) with the EXACT
    arithmetic of the batch operator: s_1 = x_1, s_t = (s_{t-1} + x_t)/2
    — two values of state per key, the minimal stateful footprint.

    Ordering contract: within a batch events fold in (ts, event_id)
    order; ACROSS batches the fold order is arrival order, so exact
    batch-equality requires event-time-ordered delivery (the same
    in-order frontier funnel_tracker documents). Out-of-order arrivals
    degrade gracefully — the level remains a halving fold of all seen
    values, just in arrival order."""
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        n, level = state.get
    else:
        n, level = 0, None
    rows: list[tuple] = []
    for pdf in pdf_iter:
        for ts, eid, v in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
            rows.append((ts, int(eid), float(v)))
    rows.sort()
    for _, _, v in rows:
        level = v if n == 0 else (level + v) / 2
        n += 1
    state.update((n, level))
    try:
        state.setTimeoutDuration(60 * 60 * 1000)
    except Exception:
        pass
    yield pd.DataFrame(
        [(user_id, n, level)],
        columns=["user_id", "n_events", "ewma_level"],
    )


def ewma_tracker(
    events_stream: DataFrame, *, evict_idle: bool = False
) -> DataFrame:
    """Continuously maintained per-user exponential level (alpha = 1/2).

    The batch twin (``ev_ewma_level``) carries the DuckDB hash oracle;
    pytest proves stream == batch over an event-time-ordered multi-batch
    feed. State is two scalars per user — bounded regardless of stream
    length — with optional idle eviction."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout
    )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Streaming Holt linear trend: the stateful twin of
# operators/events_windows.ev_holt_linear_trend
# ---------------------------------------------------------------------------

HOLT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("level", T.DoubleType(), True),
        T.StructField("trend", T.DoubleType(), True),
    ]
)

HOLT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("level", T.DoubleType(), True),
        T.StructField("trend", T.DoubleType(), True),
    ]
)


def _update_holt(key, pdf_iter, state: GroupState):
    """Fold one user's micro-batch into (count, level, trend) with the
    EXACT arithmetic of the batch operator (alpha = beta = 1/2):
    l_1 = x_1, b_1 = 0; l_t = (x_t + l + b)/2, b_t = ((l_t - l) + b)/2
    — three values of state per key. Same ordering contract as
    _update_ewma: (ts, event_id) within a batch, arrival order across
    batches, so exact batch-equality requires event-time-ordered
    delivery."""
    import pandas as pd

    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        n, level, trend = state.get
    else:
        n, level, trend = 0, None, 0.0
    rows: list[tuple] = []
    for pdf in pdf_iter:
        for ts, eid, v in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
            rows.append((ts, int(eid), float(v)))
    rows.sort()
    for _, _, v in rows:
        if n == 0:
            level, trend = v, 0.0
        else:
            new_level = (v + level + trend) / 2
            trend = ((v + level + trend) / 2 - level + trend) / 2
            level = new_level
        n += 1
    state.update((n, level, trend))
    try:
        state.setTimeoutDuration(60 * 60 * 1000)
    except Exception:
        pass
    yield pd.DataFrame(
        [(user_id, n, level, trend)],
        columns=["user_id", "n_events", "level", "trend"],
    )


def holt_tracker(
    events_stream: DataFrame, *, evict_idle: bool = False
) -> DataFrame:
    """Continuously maintained per-user Holt level + trend
    (alpha = beta = 1/2). The batch twin (``ev_holt_linear_trend``)
    carries the DuckDB hash oracle (recursive-CTE form); pytest proves
    stream == batch bit-for-bit over an event-time-ordered multi-batch
    feed. State is three scalars per user."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout
    )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_holt,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
