"""MetaPath suite oracles — the reference's
ComputeAllMetaPathsTest.java:51-121 fixture: exactly 33 metapaths with
exact walk counts at metaPathLength=3 over the undirected typed graph."""

import ray.data as rd

from neo4j_graph_algorithms_ray import fixtures as fx
from neo4j_graph_algorithms_ray.algorithms import compute_all_metapaths, get_schema
from neo4j_graph_algorithms_ray.algorithms.metapath import (
    compute_metapaths_for_instances, filter_metapaths, graph_reducer)

LABEL_ID = {"A": "0", "B": "1", "C": "2"}
TYPE_ID = {"TYPE1": "0"}


def _typed_ds():
    return rd.from_arrow(fx.typed_edge_table(fx.F7_EDGES, fx.F7_LABELS))


def _to_ref_tokens(path: str) -> str:
    toks = path.split(" | ")
    out = []
    for i, t in enumerate(toks):
        out.append(LABEL_ID[t] if i % 2 == 0 else TYPE_ID[t])
    return " | ".join(out)


def test_compute_all_metapaths_golden():
    res = compute_all_metapaths(_typed_ds(), length=3)
    got = {_to_ref_tokens(r["path"]): r["count"] for r in res.take_all()}
    assert got == fx.F7_EXPECTED
    assert len(got) == 33


def test_between_types_filter():
    res = compute_all_metapaths(_typed_ds(), length=3,
                                start_labels=["A"], end_labels=["C"])
    rows = {r["path"]: r["count"] for r in res.take_all()}
    assert all(p.split(" | ")[0] == "A" and p.split(" | ")[-1] == "C" for p in rows)
    assert rows["A | TYPE1 | C"] == 5  # a-t, a-s, c-s, i-t, o-t


def test_filter_metapaths_standalone():
    res = compute_all_metapaths(_typed_ds(), length=2)
    filt = filter_metapaths(res, start_labels=["B"])
    assert all(r["path"].startswith("B") for r in filt.take_all())


def test_metapaths_for_instances():
    res = compute_metapaths_for_instances(
        _typed_ds(), start_nodes=["a"], end_nodes=["s"], length=2)
    rows = {r["path"]: r["count"] for r in res.take_all()}
    # walks of one edge from a to s: a-s only
    assert rows == {"A | TYPE1 | C": 1}


def test_get_schema():
    rows = {(r["src_label"], r["edge_type"], r["dst_label"])
            for r in get_schema(_typed_ds()).take_all()}
    assert ("A", "TYPE1", "C") in rows
    assert ("A", "TYPE1", "B") in rows
    assert all(t == "TYPE1" for _, t, _ in rows)


def test_graph_reducer():
    red = graph_reducer(_typed_ds(), keep_labels=["A", "B"])
    rows = red.take_all()
    assert all(r["src_label"] in ("A", "B") and r["dst_label"] in ("A", "B")
               for r in rows)
    assert len(rows) == 3  # a-c, a-b, c-b


def test_schema_full_and_weights():
    from neo4j_graph_algorithms_ray.algorithms import (
        compute_all_metapaths_schema_full)
    df = compute_all_metapaths_schema_full(_typed_ds(), length=3)
    paths = set(df["path"])
    # schema (undirected) has A-A, A-B, A-C, B-C edges (from F7), so
    # every 2-label path must be schema-realizable
    assert "A" in paths and "B" in paths and "C" in paths
    assert "A | TYPE1 | B" in paths
    assert "B | TYPE1 | A | TYPE1 | C" in paths
    # weights = product of per-hop instance-edge counts
    dfw = compute_all_metapaths_schema_full(_typed_ds(), length=2,
                                            with_weights=True)
    w = dict(zip(dfw["path"], dfw["weight"]))
    # undirected A-B instance edges: (a,b),(c,b) → 2 each direction
    assert w["A | TYPE1 | B"] == 2
    assert w["B | TYPE1 | A"] == 2


def test_metapath_tsv_roundtrip(tmp_path):
    from neo4j_graph_algorithms_ray.algorithms import (
        read_precomputed_metapaths, write_metapaths_tsv)
    res = compute_all_metapaths(_typed_ds(), length=2)
    p = write_metapaths_tsv(res, str(tmp_path / "Precomputed_MetaPaths.txt"))
    back = read_precomputed_metapaths(p)
    a = {r["path"]: r["count"] for r in res.take_all()}
    b = {r["path"]: r["count"] for r in back.take_all()}
    assert a == b


def test_label_id_mapping():
    from neo4j_graph_algorithms_ray.algorithms import label_id_mapping
    rows = label_id_mapping(_typed_ds()).take_all()
    assert {(r["label_id"], r["label"]) for r in rows} == {(0, "A"), (1, "B"), (2, "C")}
