"""Round-5 operators: semantic assertions beyond the DuckDB hash oracle."""

from __future__ import annotations

import datetime as dt

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


def test_holt_winters_matches_python_replica(spark, catalog, qs):
    """Exact Python replica of the triple fold: per-type daily counts,
    then l/b/s stepped with the IDENTICAL left-to-right IEEE operations
    (alpha = beta = gamma = 1/2). Agreement is required bit-for-bit —
    the same exactness contract the DuckDB oracle checks, proven here a
    third way."""
    from data_pipeline_4_online_retail_spark.operators.events_windows import (
        HW_ANCHOR_MONDAY,
    )

    anchor = dt.date.fromisoformat(HW_ANCHOR_MONDAY)
    daily: dict[tuple, int] = {}
    for r in catalog.table("events").select("event_type", "ts").collect():
        key = (r.event_type, r.ts.date())
        daily[key] = daily.get(key, 0) + 1
    series: dict[str, list] = {}
    for (etype, day), cnt in sorted(daily.items()):
        series.setdefault(etype, []).append((day, cnt))

    expect: dict[str, tuple] = {}
    for etype, obs in series.items():
        if len(obs) < 8:
            continue
        lvl = float(obs[0][1])
        b = 0.0
        s = [0.0] * 7
        for day, cnt in obs[1:]:
            x = float(cnt)
            slot = (day - anchor).days % 7
            s_old = s[slot]
            lnew = ((x - s_old) + lvl + b) / 2
            bnew = ((lnew - lvl) + b) / 2
            snew = ((x - lnew) + s_old) / 2
            lvl, b = lnew, bnew
            s[slot] = snew
        expect[etype] = (len(obs), lvl, b, s)

    got = {
        r.event_type: r
        for r in qs["ev_holt_winters"](spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for etype, (n, lvl, b, s) in expect.items():
        r = got[etype]
        assert r.n_days == n
        assert r.level == lvl  # bit-exact, no tolerance
        assert r.trend == b
        for k in range(7):
            assert getattr(r, f"s{k}") == s[k]
        # every weekday slot's seasonal state was actually visited
        assert all(getattr(r, f"s{k}") != 0.0 for k in range(7))


def test_holt_winters_literal_recursion_replay(spark):
    """Hand-stepped tiny series (one type, 10 days incl. a calendar GAP):
    the gap must not rotate the seasonal slots — day 9 lands on slot
    (9 % 7) = 2 even though it is the 9th OBSERVATION. Values asserted
    against a literal replay of the recursions."""
    import pandas as pd

    from data_pipeline_4_online_retail_spark.operators import (
        events_windows as ew,
    )

    anchor = dt.date.fromisoformat(ew.HW_ANCHOR_MONDAY)
    days = [0, 1, 2, 3, 4, 5, 6, 7, 9, 10]  # gap: day 8 missing
    counts = [5, 7, 6, 9, 4, 8, 10, 6, 7, 12]
    rows = [
        (
            1000 + i,
            1,
            "visit",
            dt.datetime.combine(
                anchor + dt.timedelta(days=d), dt.time(12, 0)
            ),
            1.0,
        )
        for i, (d, c) in enumerate(zip(days, counts))
        for _ in range(c)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
        )
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        out = entry.queries()["ev_holt_winters"](spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    # literal replay
    lvl, b, s = float(counts[0]), 0.0, [0.0] * 7
    for d, c in zip(days[1:], counts[1:]):
        x = float(c)
        slot = d % 7
        s_old = s[slot]
        lnew = ((x - s_old) + lvl + b) / 2
        bnew = ((lnew - lvl) + b) / 2
        s[slot] = ((x - lnew) + s_old) / 2
        lvl, b = lnew, bnew
    assert r.n_days == 10
    assert r.level == lvl and r.trend == b
    assert [getattr(r, f"s{k}") for k in range(7)] == s
    # the gap day (slot 1, i.e. day 8) kept its PRE-GAP value: updated by
    # day-1 and day-7 observations only
    s_check = [0.0] * 7
    lvl2, b2 = float(counts[0]), 0.0
    for d, c in zip(days[1:], counts[1:]):
        x = float(c)
        sl = d % 7
        lnew = ((x - s_check[sl]) + lvl2 + b2) / 2
        s_check[sl] = ((x - lnew) + s_check[sl]) / 2
        b2 = ((lnew - lvl2) + b2) / 2
        lvl2 = lnew
    assert r.s1 == s_check[1]
