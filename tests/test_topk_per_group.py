"""Grouped top-k (util.topk_per_group) vs a pandas window replay, in
both the driver-finalize and groupby-shuffle regimes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

import neo4j_graph_algorithms_ray.util as u
from neo4j_graph_algorithms_ray.util import topk_per_group


def _data(seed=17, n=500):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "g": rng.integers(0, 12, n),
        "v": rng.integers(0, 9, n),
        "id": np.arange(n),
    })


def _want(df, k):
    s = df.sort_values(["g", "v", "id"], ascending=[True, False, True])
    return s.groupby("g", sort=False).head(k) \
            .sort_values(["g", "id"]).reset_index(drop=True)


def _got(ds, k):
    out = topk_per_group(ds, ["g"], "v", k, tie_cols=["id"])
    return out.to_pandas().sort_values(["g", "id"]).reset_index(drop=True)


def test_topk_per_group_small_regime():
    df = _data()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    pd.testing.assert_frame_equal(_got(ds, 3), _want(df, 3))


def test_topk_per_group_shuffle_regime(monkeypatch):
    monkeypatch.setattr(u, "SMALL_AGG_DRIVER_LIMIT", 0)
    df = _data(seed=23)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    pd.testing.assert_frame_equal(_got(ds, 2), _want(df, 2))
