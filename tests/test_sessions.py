"""Batch sessionization (operators/sessions.py) hand truths."""
from datetime import datetime

from pyspark.sql import functions as F  # noqa: F401


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string")


def test_sessionize_gap_boundary_exact(spark):
    """Gap == 1800s exactly stays in-session (strict >); one
    microsecond over breaks. Second user's sessions are independent."""
    from jsonld_js_spark.operators.sessions import sessionize
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 7, "click"),
        (2, datetime(2024, 1, 1, 0, 30, 0), 7, "view"),      # +1800s: same
        (3, datetime(2024, 1, 1, 1, 0, 0, 1), 7, "click"),   # +1800.000001s: NEW
        (4, datetime(2024, 1, 1, 0, 10, 0), 9, "buy"),
    ]
    got = {(r["user_id"], r["session_idx"]):
           (r["n_events"], r["n_event_types"], r["duration_us"])
           for r in sessionize(_ev(spark, rows)).collect()}
    assert got == {(7, 1): (2, 2, 1_800_000_000),
                   (7, 2): (1, 1, 0),
                   (9, 1): (1, 1, 0)}


def test_sessionize_equal_ts_tiebreak(spark):
    """Two events at the SAME timestamp sort by event_id — one session,
    deterministic regardless of input order."""
    from jsonld_js_spark.operators.sessions import sessionize
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [(11, t0, 3, "b"), (10, t0, 3, "a")]
    out = sessionize(_ev(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 2 and out[0]["duration_us"] == 0


def _ev_frame(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string")


def test_funnel_order_constraint_hand_truth(spark):
    """Steps only count at-or-after the previous step: a click BEFORE
    the first view is ignored; a purchase with no prior click is
    ignored; equal timestamps count (>=)."""
    import datetime as dt
    t = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)
    rows = [
        # user 1: full funnel in order
        (1, t(0), 1, "view"), (2, t(10), 1, "click"),
        (3, t(20), 1, "purchase"),
        # user 2: click precedes the only view -> stage stops at view
        (4, t(5), 2, "click"), (5, t(10), 2, "view"),
        (6, t(20), 2, "purchase"),  # no valid click -> not counted
        # user 3: no view at all -> stage 0 despite later events
        (7, t(0), 3, "click"), (8, t(5), 3, "purchase"),
        # user 4: view+click at the SAME microsecond counts (>=)
        (9, t(0), 4, "view"), (10, t(0), 4, "click"),
    ]
    from jsonld_js_spark.operators.sessions import funnel_stages
    out = {r["user_id"]: r for r in _ev_frame(spark, rows)
           .select("*").transform(funnel_stages).collect()}
    assert out[1]["stage"] == 3 and out[1]["t3_us"] > out[1]["t2_us"]
    assert out[2]["stage"] == 1 and out[2]["t2_us"] is None
    assert out[3]["stage"] == 0
    assert out[4]["stage"] == 2 and out[4]["t1_us"] == out[4]["t2_us"]


def test_retention_cohorts_hand_truth(spark):
    """Pre-signup events are excluded, offsets bucket by exact int64
    division, cohorts by absolute signup period, users counted
    distinct per cell."""
    import datetime as dt
    day = 86400
    t = lambda d, s=0: dt.datetime(2026, 1, 5) + dt.timedelta(days=d,
                                                              seconds=s)
    rows = [
        (1, t(-3), 1, "view"),       # pre-signup: excluded
        (2, t(0), 1, "signup"),
        (3, t(2), 1, "click"),       # offset 0
        (4, t(8), 1, "view"),        # offset 1
        (5, t(0, 30), 2, "signup"),  # same cohort week as user 1
        (6, t(1), 2, "view"),        # offset 0
        (7, t(40), 3, "signup"),     # later cohort
        (8, t(40, 60), 3, "purchase"),
    ]
    from jsonld_js_spark.operators.sessions import retention_cohorts
    got = {(r["cohort"], r["period_offset"]): r["n_users"]
           for r in retention_cohorts(_ev_frame(spark, rows)).collect()}
    cohorts = sorted({c for c, _ in got})
    assert len(cohorts) == 2
    c0, c1 = cohorts
    # offset 0 of cohort 0: both users (their signup event itself
    # counts as activity, plus in-week events)
    assert got[(c0, 0)] == 2
    assert got[(c0, 1)] == 1          # only user 1 active in week 1
    assert got[(c1, 0)] == 1
    assert (c0, 2) not in got         # no week-2 activity


def test_funnel_randomized_vs_brute_force(spark):
    """15 random event sets must match an independent O(n*K) python
    reference of the ordered-funnel rule exactly."""
    import datetime as dt
    import random

    from jsonld_js_spark.operators.sessions import funnel_stages

    rng = random.Random(777)
    base = dt.datetime(2026, 1, 1)
    steps = ("view", "click", "purchase")
    for trial in range(15):
        n = rng.randrange(4, 30)
        rows = [(i,
                 base + dt.timedelta(seconds=rng.randrange(6)),
                 rng.randrange(3),
                 rng.choice(steps + ("error",)))
                for i in range(n)]
        got = {r["user_id"]: (r["t1_us"], r["t2_us"], r["t3_us"],
                              r["stage"])
               for r in funnel_stages(_ev_frame(spark, rows)).collect()}
        want = {}
        for u in {r[2] for r in rows}:
            evs = [(int(t.replace(tzinfo=dt.timezone.utc).timestamp()
                        * 1_000_000), y)
                   for (_, t, uu, y) in rows if uu == u]
            ts, prev = [], None
            for s in steps:
                cand = [us for us, y in evs if y == s and
                        (prev is None or us >= prev)]
                cur = min(cand) if cand else None
                ts.append(cur)
                if cur is None:
                    break
                prev = cur
            ts += [None] * (3 - len(ts))
            want[u] = (ts[0], ts[1], ts[2],
                       sum(1 for x in ts if x is not None))
        assert got == want, (trial, rows)


def test_retention_randomized_vs_brute_force(spark):
    """12 random event sets vs an independent python reference of the
    cohort/offset/distinct-count rule (weekly periods)."""
    import datetime as dt
    import random

    from jsonld_js_spark.operators.sessions import retention_cohorts

    rng = random.Random(991)
    base = dt.datetime(2026, 1, 5)
    week_us = 7 * 86400 * 1_000_000
    for trial in range(12):
        n = rng.randrange(6, 40)
        rows = [(i,
                 base + dt.timedelta(days=rng.randrange(-3, 40),
                                     seconds=rng.randrange(60)),
                 rng.randrange(4),
                 rng.choice(["signup", "view", "click"]))
                for i in range(n)]
        got = {(r["cohort"], r["period_offset"]): r["n_users"]
               for r in retention_cohorts(_ev_frame(spark, rows))
               .collect()}
        us = lambda t: int(t.replace(tzinfo=dt.timezone.utc)
                           .timestamp() * 1_000_000)
        signup = {}
        for _, t, u, y in rows:
            if y == "signup":
                signup[u] = min(signup.get(u, us(t)), us(t))
        want = {}
        for _, t, u, _y in rows:
            if u not in signup or us(t) < signup[u]:
                continue
            cell = (signup[u] // week_us,
                    (us(t) - signup[u]) // week_us)
            want.setdefault(cell, set()).add(u)
        assert got == {k: len(v) for k, v in want.items()}, (trial, rows)


def test_anomaly_days_hand_truth(spark):
    """Exact integer spike test: a user with counts [2,2,2,2,2,12]
    flags only the 12-day (a lone outlier is z = sqrt(m-1), so m >= 6
    is needed to clear 2 sigma — m=5 sits EXACTLY on the boundary and
    the strict > excludes it); a perfectly flat user flags nothing
    (variance 0); a 2-day user never flags (z = 1 identically)."""
    import datetime as dt

    from jsonld_js_spark.operators.sessions import anomaly_days
    rows = []
    eid = 0
    day = lambda d: dt.datetime(2026, 1, 1) + dt.timedelta(days=d)

    def add(user, d, n):
        nonlocal eid
        for _ in range(n):
            rows.append((eid, day(d), user, "view"))
            eid += 1
    for d, n in enumerate([2, 2, 2, 2, 2, 12]):
        add(1, d, n)
    for d in range(4):
        add(2, d, 3)          # flat: no anomaly
    add(3, 0, 1); add(3, 1, 9)  # m=2: z=1 identically, no flag
    got = {(r["user_id"], r["day"]): r["n_events"]
           for r in anomaly_days(_ev_frame(spark, rows)).collect()}
    assert [k[0] for k in got] == [1]
    assert list(got.values()) == [12]


def test_event_ops_empty_input(spark):
    """Every event operator returns an empty frame (not an error) on
    an empty events table."""
    from jsonld_js_spark.operators.asof import asof_attach
    from jsonld_js_spark.operators.sessions import (
        anomaly_days, funnel_stages, retention_cohorts, sessionize)
    empty = _ev_frame(spark, [])
    assert asof_attach(empty).count() == 0
    assert funnel_stages(empty).count() == 0
    assert retention_cohorts(empty).count() == 0
    assert anomaly_days(empty).count() == 0
    assert sessionize(empty).count() == 0
