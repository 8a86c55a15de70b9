"""broadcast_join (util) vs a pandas merge replay: M:N expansion,
collision suffixes, shuffle-join fallback parity, empty right side."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from neo4j_graph_algorithms_ray.util import broadcast_join


def _frames(seed=11, nl=400, nr=60, nkeys=25):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, nkeys, nl).astype(np.int64),
        "lv": np.arange(nl, dtype=np.int64),
    })
    right = pd.DataFrame({
        "rk": rng.integers(0, nkeys + 5, nr).astype(np.int64),  # some keys miss
        "rv": np.arange(nr, dtype=np.int64) * 10,
    })
    return left, right


def _want(left, right):
    m = left.merge(right, how="inner", left_on="k", right_on="rk")
    return m[["k", "lv", "rv"]].sort_values(["k", "lv", "rv"]) \
        .reset_index(drop=True)


def _norm(df):
    return df[["k", "lv", "rv"]].sort_values(["k", "lv", "rv"]) \
        .reset_index(drop=True)


def test_broadcast_join_mn_matches_pandas_merge():
    left, right = _frames()
    out = broadcast_join(rd.from_pandas(left).repartition(4),
                         rd.from_pandas(right).repartition(3),
                         on="k", right_on="rk")
    got = _norm(out.to_pandas())
    pd.testing.assert_frame_equal(got, _want(left, right))


def test_broadcast_join_fallback_regime_parity():
    left, right = _frames(seed=7)
    bcast = broadcast_join(rd.from_pandas(left), rd.from_pandas(right),
                           on="k", right_on="rk")
    shuffled = broadcast_join(rd.from_pandas(left), rd.from_pandas(right),
                              on="k", right_on="rk", limit=1)  # force fallback
    pd.testing.assert_frame_equal(_norm(bcast.to_pandas()),
                                  _norm(shuffled.to_pandas()))


def test_broadcast_join_self_join_suffixes():
    df = pd.DataFrame({"k": [1, 1, 2], "v": [10, 20, 30]})
    ds = rd.from_pandas(df)
    out = broadcast_join(ds, ds, on="k", left_suffix="_a", right_suffix="_b") \
        .to_pandas()
    assert set(out.columns) == {"k", "v_a", "v_b"}
    pairs = sorted(map(tuple, out[["v_a", "v_b"]].to_numpy().tolist()))
    assert pairs == [(10, 10), (10, 20), (20, 10), (20, 20), (30, 30)]


def test_broadcast_join_empty_right():
    left = rd.from_pandas(pd.DataFrame({"k": [1, 2], "lv": [3, 4]}))
    right = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64()),
                                    "rv": pa.array([], pa.int64())}))
    out = broadcast_join(left, right, on="k", right_on="rk")
    assert out.count() == 0


def test_broadcast_join_null_keys_never_match():
    """Inner-join semantics: NULL keys must not match each other (the
    naive NaN->INT64_MIN cast would pair them up), and the broadcast
    regime must agree with the hash-join fallback."""
    left = rd.from_arrow(pa.table({"k": pa.array([1, None], pa.int64()),
                                   "lv": pa.array([10, 20], pa.int64())}))
    right = rd.from_arrow(pa.table({"rk": pa.array([None, 1], pa.int64()),
                                    "rv": pa.array([7, 8], pa.int64())}))
    got = broadcast_join(left, right, on="k", right_on="rk").to_pandas()
    assert got.to_dict("records") == [{"k": 1, "lv": 10, "rv": 8}]
    fb = broadcast_join(left, right, on="k", right_on="rk",
                        limit=1).to_pandas()
    assert fb.to_dict("records") == got.to_dict("records")


def test_broadcast_join_empty_right_keeps_payload_schema():
    """An empty right side must still produce the full output schema
    (left columns + right payload), same as the non-empty regimes."""
    left = rd.from_pandas(pd.DataFrame({"k": [1, 2], "lv": [3, 4]}))
    right = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64()),
                                    "rv": pa.array([], pa.int64())}))
    out = broadcast_join(left, right, on="k", right_on="rk")
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "lv", "rv"}


def test_broadcast_join_float_left_key_falls_back():
    """A float left key must not be silently truncated by the broadcast
    probe; it routes to the hash join (which rejects the type mismatch
    exactly as Dataset.join would)."""
    import pytest

    left = rd.from_pandas(pd.DataFrame({"k": np.array([2.5, 2.0]),
                                        "lv": np.array([1, 2], np.int64)}))
    right = rd.from_pandas(pd.DataFrame({"rk": np.array([2], np.int64),
                                         "rv": np.array([7], np.int64)}))
    with pytest.raises(Exception):
        broadcast_join(left, right, on="k", right_on="rk").materialize()


def test_broadcast_join_missing_keys_dropped():
    left = rd.from_pandas(pd.DataFrame({"k": np.array([1, 2, 3], np.int64)}))
    right = rd.from_pandas(pd.DataFrame({"k2": np.array([2], np.int64),
                                         "rv": np.array([7], np.int64)}))
    out = broadcast_join(left, right, on="k", right_on="k2").to_pandas()
    assert out["k"].tolist() == [2] and out["rv"].tolist() == [7]
