"""Event-stream operators (functions/events.py) — tumbling windows,
gap sessionization, as-of join — verified against independent pandas
brute-force oracles on a deterministic synthetic event log."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.functions.events import (asof_join,
                                                         sessionize,
                                                         windowed_aggregate)

US = 1_000_000


@pytest.fixture(scope="module")
def events_df():
    rng = np.random.default_rng(11)
    n = 500
    ts = np.cumsum(rng.integers(1, 40 * 60, size=n)) * US  # sec-scale gaps
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us"),
        "user_id": rng.integers(0, 7, size=n).astype(np.int64),
        "event_type": rng.choice(["view", "click", "purchase"], size=n),
        "value": np.round(rng.uniform(0, 10, size=n), 2),
    })


def test_windowed_aggregate(events_df):
    ds = rd.from_pandas(events_df).repartition(5)
    got = windowed_aggregate(ds, window_s=3600).to_pandas() \
        .sort_values(["window_start_s", "event_type"]).reset_index(drop=True)
    t = events_df["ts"].astype("datetime64[us]").astype(np.int64)
    want = events_df.assign(window_start_s=(t // (3600 * US)) * 3600) \
        .groupby(["window_start_s", "event_type"]) \
        .agg(n_events=("value", "size"), sum_value=("value", "sum")) \
        .reset_index().sort_values(["window_start_s", "event_type"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sessionize(events_df):
    gap = 1800
    ds = rd.from_pandas(events_df).repartition(5)
    got = sessionize(ds, gap_s=gap).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    def brute(g):
        g = g.sort_values(["ts", "event_id"])
        t = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        new = np.ones(len(g), bool)
        new[1:] = (t[1:] - t[:-1]) > gap * US
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                             "session_seq": np.cumsum(new)})

    want = events_df.groupby("user_id", group_keys=False)[
        ["ts", "event_id"]].apply(brute) \
        .sort_values("event_id").reset_index(drop=True)
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (got["session_seq"].to_numpy()
            == want["session_seq"].to_numpy()).all()
    assert got["session_seq"].min() == 1


def test_asof_join_strict_vs_inclusive(events_df):
    ds = rd.from_pandas(events_df).repartition(4)
    left = ds.select_columns(["event_id", "user_id", "ts"])
    right = ds.filter(expr="event_type == 'purchase'") \
        .select_columns(["user_id", "ts", "event_id"])
    got = asof_join(left, right, on="user_id", left_time="ts",
                    right_cols=["event_id"], strict=True,
                    fill_value=-1).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert got["event_id_r"].dtype == np.int64

    pp = events_df[events_df.event_type == "purchase"]

    def brute(row, strict):
        c = pp[(pp.user_id == row.user_id)
               & ((pp.ts < row.ts) if strict else (pp.ts <= row.ts))]
        return int(c.sort_values("ts").iloc[-1].event_id) if len(c) else -1

    want = events_df.apply(lambda r: brute(r, True), axis=1).to_numpy()
    order = events_df["event_id"].argsort()
    assert (got["event_id_r"].to_numpy() == want[order]).all()

    # inclusive: a purchase event matches itself
    inc = asof_join(left, right, on="user_id", left_time="ts",
                    right_cols=["event_id"], strict=False,
                    fill_value=-1).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want_inc = events_df.apply(lambda r: brute(r, False), axis=1).to_numpy()
    assert (inc["event_id_r"].to_numpy() == want_inc[order]).all()
    purchase_ids = set(pp["event_id"])
    self_rows = inc[inc["event_id"].isin(purchase_ids)]
    assert (self_rows["event_id_r"] == self_rows["event_id"]).all()


def test_asof_join_no_match_null(events_df):
    """Without fill_value unmatched rows carry nulls (NaN) and matched
    values survive; suffix applies on column collision."""
    ds = rd.from_pandas(events_df).repartition(3)
    left = ds.select_columns(["event_id", "user_id", "ts"])
    right = ds.filter(expr="event_type == 'purchase'") \
        .select_columns(["user_id", "ts", "event_id", "value"])
    out = asof_join(left, right, on="user_id", left_time="ts",
                    right_cols=["event_id", "value"]).to_pandas()
    assert "event_id_r" in out.columns and "value" in out.columns
    assert out["event_id_r"].isna().any()
    assert out["event_id_r"].notna().any()


def test_session_stats(events_df):
    """session_stats must agree with grouping the sessionize output and
    aggregating per (user, session)."""
    from neo4j_graph_algorithms_ray.functions.events import session_stats
    gap = 1800
    ds = rd.from_pandas(events_df).repartition(5)
    got = session_stats(ds, gap_s=gap).to_pandas() \
        .sort_values(["user_id", "session_seq"]).reset_index(drop=True)
    sess = sessionize(ds, gap_s=gap).to_pandas()
    t_us = events_df.set_index("event_id")["ts"] \
        .astype("datetime64[us]").astype(np.int64)
    sess["t"] = sess["event_id"].map(t_us)
    want = sess.groupby(["user_id", "session_seq"]).agg(
        n_events=("event_id", "size"), start_us=("t", "min"),
        end_us=("t", "max")).reset_index()
    want["duration_us"] = want["end_us"] - want["start_us"]
    want = want.drop(columns="end_us") \
        .sort_values(["user_id", "session_seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["user_id", "session_seq", "n_events", "start_us", "duration_us"]],
        want, check_dtype=False)


def test_events_ops_empty_and_degenerate_inputs():
    """Empty / schema-less-empty inputs (a filter over an empty dataset
    loses its schema in Ray 2.49) must not crash: empty right → typed
    fill column on every left row; empty left → empty result."""
    import pyarrow as pa
    from neo4j_graph_algorithms_ray.functions.events import session_stats
    schema = pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                        ("user_id", pa.int64()), ("event_type", pa.string()),
                        ("value", pa.float64())])
    empty = rd.from_arrow(pa.table({f.name: pa.array([], f.type)
                                    for f in schema}))
    one = rd.from_arrow(pa.table({"event_id": pa.array([7], pa.int64()),
                                  "ts": pa.array([1_000_000],
                                                 pa.timestamp("us")),
                                  "user_id": pa.array([3], pa.int64()),
                                  "event_type": pa.array(["view"]),
                                  "value": pa.array([1.0])}))
    assert windowed_aggregate(empty).count() == 0
    assert sessionize(empty).count() == 0
    assert session_stats(empty).count() == 0
    # schema-less empty right: the filter erases the schema
    er = empty.filter(expr="event_type == 'purchase'") \
        .select_columns(["user_id", "ts", "event_id"])
    out = asof_join(one.select_columns(["event_id", "user_id", "ts"]), er,
                    on="user_id", left_time="ts", right_cols=["event_id"],
                    fill_value=-1).take_all()
    assert len(out) == 1 and out[0]["event_id_r"] == -1
    out2 = asof_join(empty.select_columns(["event_id", "user_id", "ts"]),
                     one.select_columns(["user_id", "ts", "event_id"]),
                     on="user_id", left_time="ts", right_cols=["event_id"],
                     fill_value=-1)
    assert out2.count() == 0


def test_funnel_chain_and_windows():
    from neo4j_graph_algorithms_ray.functions.events import funnel
    import pandas as pd
    import ray.data as rd

    def ev(u, t, ty):
        return {"user_id": u, "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=t),
                "event_type": ty}

    rows = [
        # user 1: full funnel within windows
        ev(1, 0, "view"), ev(1, 10, "click"), ev(1, 20, "purchase"),
        # user 2: click BEFORE view -> stops at 1 (view only)
        ev(2, 50, "click"), ev(2, 100, "view"),
        # user 3: click too late (> within) -> 1
        ev(3, 0, "view"), ev(3, 5000, "click"),
        # user 4: no step-1 event at all -> 0
        ev(4, 0, "error"),
        # user 5: equal timestamp does NOT count (strictly after) -> 1
        ev(5, 0, "view"), ev(5, 0, "click"),
        # user 6: second view earlier than first click window edge;
        # purchase within window of the EARLIEST qualifying click -> 3
        ev(6, 0, "view"), ev(6, 1, "click"), ev(6, 30, "purchase"),
    ]
    got = {r["user_id"]: r["steps_completed"]
           for r in funnel(rd.from_items(rows), ["view", "click", "purchase"],
                           within_s=60).take_all()}
    assert got == {1: 3, 2: 1, 3: 1, 4: 0, 5: 1, 6: 3}


def test_retention_cohorts():
    from neo4j_graph_algorithms_ray.functions.events import retention_cohorts
    import pandas as pd
    import ray.data as rd

    W = 604800
    def ev(u, week):
        return {"user_id": u,
                "ts": pd.Timestamp(week * W, unit="s"), "event_type": "x"}
    rows = [ev(1, 100), ev(1, 100), ev(1, 101),  # dup events same week
            ev(2, 100), ev(2, 102),
            ev(3, 101)]
    got = {(r["cohort"], r["age"]): r["n_users"]
           for r in retention_cohorts(rd.from_items(rows)).take_all()}
    assert got == {(100, 0): 2, (100, 1): 1, (100, 2): 1, (101, 0): 1}


def test_hopping_aggregate_brute():
    """Hopping windows vs brute-force replication: every event must
    appear in exactly window_s/hop_s windows and sums must match."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from neo4j_graph_algorithms_ray.functions.events import hopping_aggregate

    rng = np.random.default_rng(3)
    n = 400
    ts = pd.to_datetime(rng.integers(0, 50_000, n), unit="s")
    et = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    val = rng.integers(0, 10, n).astype(float)
    ds = rd.from_arrow(pa.table({"ts": pa.array(ts), "event_type": et,
                                 "value": val})).repartition(8)
    W, H = 3600, 900
    got = {(r["window_start_s"], r["event_type"]):
           (r["n_events"], round(r["sum_value"], 6))
           for r in hopping_aggregate(ds, W, H).take_all()}
    want = {}
    for t, e, v in zip(ts.astype("int64") // 10**9, et, val):
        base = (int(t) // H) * H
        for j in range(W // H):
            k = (base - j * H, e)
            c, s = want.get(k, (0, 0.0))
            want[k] = (c + 1, s + v)
    want = {k: (c, round(s, 6)) for k, (c, s) in want.items()}
    assert got == want
