"""Boundary-semantics pins for the session-window family.

Pins the ADVICE_r9 medium item: Spark's ``session_window`` MERGES an
event landing exactly at the running session end (touching intervals
coalesce), so the islands oracle's break condition must be a STRICT
``ts > MAX(ts + gap)``.  The fixtures here contain exact-boundary
same-user events — the case the sf* fixtures happen not to carry — and
assert Spark-vs-islands agreement, plus that the old ``>=`` formulation
genuinely disagrees (the test would be vacuous otherwise).
"""

import os

import duckdb
import pandas as pd
import pytest

from mini_pandas_spark.queries import REGISTRY
from mini_pandas_spark.streaming.windows import dynamic_gap_sessions


def _boundary_events_dir(tmp_path):
    """events.parquet with exact-boundary and past-boundary pairs."""
    rows = [
        # user 1: click 00:00 + click exactly at 00:30 (30-min gap) -> MERGE
        (1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 00:30:00", 1, "click", 1.0, "{}"),
        # user 2: click 00:00 + click 00:30:01 (1s past boundary) -> SPLIT
        (3, "2024-01-01 00:00:00", 2, "click", 1.0, "{}"),
        (4, "2024-01-01 00:30:01", 2, "click", 1.0, "{}"),
        # user 3: purchase 00:00 (2h gap) + click exactly at 02:00 -> MERGE
        (5, "2024-01-01 00:00:00", 3, "purchase", 9.0, "{}"),
        (6, "2024-01-01 02:00:00", 3, "click", 1.0, "{}"),
        # user 4: purchase 00:00 + click 02:00:01 -> SPLIT
        (7, "2024-01-01 00:00:00", 4, "purchase", 9.0, "{}"),
        (8, "2024-01-01 02:00:01", 4, "click", 1.0, "{}"),
        # user 5: chained exact boundaries 00:00 / 00:30 / 01:00 -> ONE session
        (9, "2024-01-01 00:00:00", 5, "click", 1.0, "{}"),
        (10, "2024-01-01 00:30:00", 5, "click", 1.0, "{}"),
        (11, "2024-01-01 01:00:00", 5, "click", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    path = os.path.join(str(tmp_path), "events.parquet")
    pdf.to_parquet(path)
    return str(tmp_path), path


def _islands_sql(strict: bool) -> str:
    op = ">" if strict else ">="
    return f"""
    WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
               CASE WHEN event_type = 'purchase' THEN INTERVAL 2 HOUR
                    ELSE INTERVAL 30 MINUTE END AS gap
        FROM events
    ), b AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN ROW_NUMBER() OVER w = 1 THEN 1
                    WHEN ts {op} MAX(ts + gap) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts, event_type,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM b
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """


def test_session_boundary_event_merges_and_islands_agree(spark, tmp_path):
    sf_dir, parquet_path = _boundary_events_dir(tmp_path)
    got = dynamic_gap_sessions(spark, sf_dir).toPandas()

    # Spark semantics: exact-boundary events MERGE.
    by_user = got.groupby("user_id").size().to_dict()
    assert by_user == {1: 1, 2: 2, 3: 1, 4: 2, 5: 1}
    # The chained-boundary user collapses to one 3-event session.
    u5 = got[got.user_id == 5]
    assert int(u5.n_events.iloc[0]) == 3

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{parquet_path}')"
    )
    strict = con.execute(_islands_sql(strict=True)).df()
    loose = con.execute(_islands_sql(strict=False)).df()
    con.close()

    # Strict islands == Spark, row for row.
    assert strict.values.tolist() == got.values.tolist()
    # The >= formulation genuinely splits boundary sessions (non-vacuous):
    # users 1 and 3 each gain one extra session, chained user 5 gains two.
    assert len(loose) == len(got) + 4


def test_registered_oracle_uses_strict_boundary():
    oracle = REGISTRY["dynamic_gap_sessions"][1]
    assert "ts > MAX(ts + gap)" in oracle
    assert ">=" not in oracle
