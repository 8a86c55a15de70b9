"""CLI surface: `python -m neo4j_graph_algorithms_ray` — procedure-name
resolution (registry.PROCEDURES, the reference's dbms.procedures()
inventory, ListProc.java:42-46), edge-table load, kwarg binding,
parquet output."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from neo4j_graph_algorithms_ray.__main__ import main


@pytest.fixture(scope="module")
def edges_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "edges.parquet"
    rng = np.random.default_rng(11)
    e = rng.integers(0, 50, size=(200, 2))
    pq.write_table(pa.table({"src": e[:, 0], "dst": e[:, 1]}), str(p))
    return str(p)


def test_cli_list(capsys):
    main(["list", "pageRank"])
    out = capsys.readouterr().out
    assert "algo.pageRank" in out
    assert "algorithms.pagerank.pagerank" in out


def test_cli_run_pagerank_writes_parquet(edges_path, tmp_path, capsys):
    out_dir = str(tmp_path / "pr")
    main(["run", "algo.pageRank", "--edges", edges_path, "--out", out_dir,
          "--param", "damping=0.85", "--param", "max_iterations=20"])
    tbl = pq.read_table(out_dir)
    assert tbl.num_rows == 50
    assert set(tbl.column_names) == {"node", "score"}
    assert capsys.readouterr().out.startswith("wrote 50 rows")


def test_cli_run_wcc_prints_head(edges_path, capsys):
    main(["run", "algo.unionFind", "--edges", edges_path, "--undirected"])
    out = capsys.readouterr().out
    assert "'component'" in out


def test_cli_rejects_unknown_procedure(edges_path):
    with pytest.raises(SystemExit, match="close matches"):
        main(["run", "algo.deltaStepping", "--edges", edges_path])


def test_cli_rejects_unknown_param(edges_path):
    with pytest.raises(SystemExit, match="does not accept"):
        main(["run", "algo.pageRank", "--edges", edges_path,
              "--param", "bogus=1"])
