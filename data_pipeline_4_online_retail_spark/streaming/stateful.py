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
