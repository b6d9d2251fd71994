"""asof_attach edge cases: equal timestamps (inclusive as-of), no
prior right event, tolerance cut, multiple rights at one microsecond,
and key isolation."""
from __future__ import annotations

import datetime as dt

from jsonld_js_spark.operators.asof import asof_attach

UTC = dt.timezone.utc


def _ev(eid, us, user, typ):
    return (eid, dt.datetime.fromtimestamp(us / 1e6, tz=UTC)
            .replace(tzinfo=None), user, typ)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string")


def _res(df):
    return {r["event_id"]: (r["asof_event_id"], r["lag_us"])
            for r in df.collect()}


def test_asof_basic_and_no_prior(spark):
    ev = _frame(spark, [
        _ev(1, 1_000_000, 7, "view"),
        _ev(2, 5_000_000, 7, "purchase"),   # matches view 1, lag 4s
        _ev(3, 500_000, 8, "purchase"),     # user 8 has no prior view
        _ev(4, 9_000_000, 8, "view"),       # later view must not match
    ])
    out = _res(asof_attach(ev, tolerance_us=None))
    assert out[2] == (1, 4_000_000)
    assert out[3] == (None, None)


def test_asof_equal_ts_inclusive_and_latest_right_wins(spark):
    ev = _frame(spark, [
        _ev(10, 2_000_000, 1, "view"),
        _ev(11, 2_000_000, 1, "view"),      # same us: larger id wins
        _ev(12, 2_000_000, 1, "purchase"),  # right at SAME us is visible
        _ev(13, 1_000_000, 1, "view"),
    ])
    out = _res(asof_attach(ev, tolerance_us=None))
    assert out[12] == (11, 0)


def test_asof_tolerance_nulls_out_stale_match(spark):
    ev = _frame(spark, [
        _ev(1, 0, 5, "view"),
        _ev(2, 10_000_000, 5, "purchase"),
        _ev(3, 30_000_000, 5, "purchase"),
    ])
    out = _res(asof_attach(ev, tolerance_us=15_000_000))
    assert out[2] == (1, 10_000_000)
    assert out[3] == (None, None)  # lag 30s > 15s tolerance


def test_asof_keys_isolated_and_other_types_ignored(spark):
    ev = _frame(spark, [
        _ev(1, 1_000_000, 1, "view"),
        _ev(2, 2_000_000, 2, "purchase"),   # user 2: no view of its own
        _ev(3, 1_500_000, 2, "click"),      # non-right type is ignored
        _ev(4, 3_000_000, 1, "purchase"),
    ])
    out = _res(asof_attach(ev, tolerance_us=None))
    assert out[2] == (None, None)
    assert out[4] == (1, 2_000_000)


def _brute_asof(rows, left_type, right_type, tolerance_us):
    """Independent O(n^2) reference: latest right with (us, id) <=
    semantics per user."""
    out = {}
    for eid, ts, user, typ in rows:
        if typ != left_type:
            continue
        us = int(ts.timestamp() * 1_000_000)
        best = None
        for eid2, ts2, user2, typ2 in rows:
            if user2 != user or typ2 != right_type:
                continue
            us2 = int(ts2.timestamp() * 1_000_000)
            if us2 > us:
                continue
            if best is None or (us2, eid2) > best:
                best = (us2, eid2)
        if best is not None and (tolerance_us is None or
                                 us - best[0] <= tolerance_us):
            out[eid] = (best[1], us - best[0])
        else:
            out[eid] = (None, None)
    return out


def test_asof_randomized_vs_brute_force(spark):
    """20 random event sets (clustered timestamps force equal-us
    collisions) must match the O(n^2) reference exactly."""
    import datetime as dt
    import random

    rng = random.Random(4242)
    UTC = dt.timezone.utc
    base = dt.datetime(2026, 1, 1, tzinfo=UTC)
    for trial in range(20):
        n = rng.randrange(5, 40)
        rows = []
        for i in range(n):
            ts = (base + dt.timedelta(
                microseconds=rng.choice([0, 1, 5, 10]) * 1_000_000 +
                rng.randrange(4) )).replace(tzinfo=None)
            rows.append((i, ts, rng.randrange(3),
                         rng.choice(["view", "purchase", "click"])))
        tol = rng.choice([None, 2_000_000, 7_000_000])
        got = _res(asof_attach(_frame(spark, rows), tolerance_us=tol))
        tz_rows = [(e, t.replace(tzinfo=UTC), u, y)
                   for e, t, u, y in rows]
        want = _brute_asof(tz_rows, "purchase", "view", tol)
        assert got == want, (trial, tol, rows)


def test_asof_salted_equals_unsalted_with_hot_key(spark):
    """Time-bucket salting + boundary carry must be output-invisible:
    a planted bot user (events spanning many buckets, including rights
    exactly ON bucket boundaries, left-only buckets, right-only
    buckets, and same-us ties) compared row-for-row against the
    unsalted plan at three bucket widths."""
    import random
    rng = random.Random(2026)
    rows, eid = [], 0
    # bot user 99: 400 events over ~40 s; bucket width 1 s -> ~40
    # boundaries crossed
    for _ in range(400):
        us = rng.randint(0, 40_000_000)
        if rng.random() < 0.3:
            us = (us // 1_000_000) * 1_000_000  # exactly on a boundary
        typ = rng.choice(["view", "purchase"])
        rows.append(_ev(eid, us, 99, typ)); eid += 1
    # background users, incl. same-us bursts
    for _ in range(150):
        us = rng.choice([7_000_000, rng.randint(0, 40_000_000)])
        rows.append(_ev(eid, us, rng.randint(0, 5),
                        rng.choice(["view", "purchase", "error"])))
        eid += 1
    ev = _frame(spark, rows)
    for tol in (None, 3_000_000):
        base = sorted(tuple(r) for r in asof_attach(
            ev, tolerance_us=tol).collect())
        for bucket_us in (1_000_000, 7_777_777, 60_000_000):
            salted = sorted(tuple(r) for r in asof_attach(
                ev, tolerance_us=tol,
                salt_bucket_us=bucket_us).collect())
            assert salted == base, (tol, bucket_us)
