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
