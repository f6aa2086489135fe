"""PageRank operator vs a NumPy power-method oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bm25_pagerank_rpi_spark.operators import pagerank
from bm25_pagerank_rpi_spark.sources.transcripts import with_doc_identity


def _np_pagerank(n, edges, d=0.85, iters=10, redistribute=False):
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.full(n, (1 - d) / n)
        for s, t in edges:
            nr[t] += d * r[s] / outdeg[s]
        if redistribute:
            dangling = sum(r[v] for v in range(n) if v not in outdeg)
            nr += d * dangling / n
        r = nr
    return r


EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (4, 0)]  # node 5 dangling
N = 6


def _dfs(spark):
    nodes = spark.createDataFrame([(i,) for i in range(N)], "node long")
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    return nodes, edges


@pytest.mark.parametrize("redistribute", [False, True])
def test_pagerank_matches_numpy(spark, redistribute):
    nodes, edges = _dfs(spark)
    got = {
        r.node: r.pagerank
        for r in pagerank.pagerank(
            nodes, edges, iterations=10, redistribute_dangling=redistribute
        ).collect()
    }
    expect = _np_pagerank(N, EDGES, iters=10, redistribute=redistribute)
    for v in range(N):
        assert got[v] == pytest.approx(expect[v], abs=1e-12), v
    if redistribute:
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_link_info_counts(spark):
    nodes, edges = _dfs(spark)
    got = {r.node: (r.inlinks, r.outlinks) for r in pagerank.link_info(nodes, edges).collect()}
    assert got[0] == (3, 1)
    assert got[2] == (1, 2)
    assert got[5] == (0, 0)


def test_transcript_edges_shape(spark):
    rows = [
        ("c1", 0, "user", "t", "none", None),
        ("c1", 1, "assistant", "t", "none", None),
        ("c1", 2, "user", "t", "none", None),
        ("c2", 0, "user", "t", "none", None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    edges = {
        (r.src, r.dst)
        for r in pagerank.transcript_edges(with_doc_identity(t)).collect()
    }
    assert edges == {
        ("c1:0", "c1:1"),
        ("c1:1", "c1:2"),
        ("c1:1", "c1:0"),
        ("c1:2", "c1:0"),
    }
    # every non-root node has out-degree >= 1; single-turn conv c2 has none
    srcs = {s for s, _ in edges}
    assert "c2:0" not in srcs


def test_pagerank_empty_graph(spark):
    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    edges = spark.createDataFrame([], "src long, dst long")
    got = {r.node: r.pagerank for r in pagerank.pagerank(nodes, edges, iterations=3).collect()}
    # no edges: every iteration resets to (1-d)/N
    assert got[0] == pytest.approx(0.15 / 2, abs=1e-12)


def test_personalized_pagerank_matches_numpy(spark):
    import numpy as np

    # ring of 6 with a chord; sources = {0, 3}
    edges = [(i, (i + 1) % 6) for i in range(6)] + [(1, 4)]
    nodes_df = spark.createDataFrame([(i,) for i in range(6)], "node long")
    edges_df = spark.createDataFrame(edges, "src long, dst long")
    src_df = spark.createDataFrame([(0,), (3,)], "node long")
    got = {
        r.node: r.pagerank
        for r in pagerank.personalized_pagerank(
            nodes_df, edges_df, src_df, damping=0.85, iterations=12
        ).collect()
    }

    d, iters = 0.85, 12
    out_deg = {i: 0 for i in range(6)}
    for s, _t in edges:
        out_deg[s] += 1
    base = np.zeros(6)
    base[[0, 3]] = (1 - d) / 2
    rank = np.zeros(6)
    rank[[0, 3]] = 1 / 2
    for _ in range(iters):
        new = base.copy()
        for s, t in edges:
            new[t] += d * rank[s] / out_deg[s]
        rank = new
    for i in range(6):
        assert got[i] == pytest.approx(rank[i], abs=1e-12), i
    # mass localizes: a source outranks the node furthest from both sources
    assert got[0] > got[5] or got[3] > got[5]


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


def _np_hits(n_nodes, edge_list, iters):
    import numpy as np

    A = np.zeros((n_nodes, n_nodes))
    for s, d in edge_list:
        A[s, d] += 1.0
    h = np.ones(n_nodes)
    a = np.zeros(n_nodes)
    for _ in range(iters):
        a = A.T @ h
        a = a / a.sum() if a.sum() > 0 else a
        h = A @ a
        h = h / h.sum() if h.sum() > 0 else h
    return a, h


def test_hits_numpy_parity(spark):
    from bm25_pagerank_rpi_spark.operators.pagerank import hits

    # a hub node (0) pointing at two authorities (1, 2), plus a chain and
    # an isolated node (5): zero on both scores
    edge_list = [(0, 1), (0, 2), (3, 1), (1, 4), (2, 4), (4, 0)]
    n_nodes = 6
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "node long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.node: (r.authority, r.hub) for r in hits(nodes, edges, iterations=4).collect()}
    a, h = _np_hits(n_nodes, edge_list, 4)
    for i in range(n_nodes):
        assert got[i][0] == pytest.approx(a[i], abs=1e-12)
        assert got[i][1] == pytest.approx(h[i], abs=1e-12)
    assert got[5] == (0.0, 0.0)
    # node 1 (pointed at by 0 and 3) should out-rank node 2 on authority
    assert got[1][0] > got[2][0]


def test_hits_empty_graph(spark):
    from bm25_pagerank_rpi_spark.operators.pagerank import hits

    nodes = spark.createDataFrame([(1,), (2,)], "node long")
    edges = spark.createDataFrame([], "src long, dst long")
    got = {r.node: (r.authority, r.hub) for r in hits(nodes, edges, iterations=2).collect()}
    assert got == {1: (0.0, 0.0), 2: (0.0, 0.0)}


def test_weighted_pagerank_numpy_parity(spark):
    import numpy as np

    from bm25_pagerank_rpi_spark.operators.pagerank import pagerank

    # 4-node weighted graph, every node out-degree >= 1
    edges_w = [
        ("a", "b", 1.0), ("a", "c", 3.0),
        ("b", "c", 2.0), ("c", "a", 1.0), ("d", "a", 5.0),
    ]
    names = ["a", "b", "c", "d"]
    nodes = spark.createDataFrame([(n,) for n in names], "node string")
    edges = spark.createDataFrame(edges_w, "src string, dst string, weight double")
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank(nodes, edges, damping=0.85, iterations=12).collect()
    }
    idx = {n: i for i, n in enumerate(names)}
    M = np.zeros((4, 4))
    outw = {}
    for s, d, w in edges_w:
        outw[s] = outw.get(s, 0.0) + w
    for s, d, w in edges_w:
        M[idx[d], idx[s]] += w / outw[s]
    r = np.full(4, 0.25)
    for _ in range(12):
        r = 0.15 / 4 + 0.85 * (M @ r)
    for n in names:
        assert got[n] == pytest.approx(r[idx[n]], abs=1e-12)


def test_weight_one_equals_unweighted(spark):
    from bm25_pagerank_rpi_spark.operators.pagerank import pagerank

    edges_l = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    e_unw = spark.createDataFrame(edges_l, "src string, dst string")
    e_w1 = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges_l], "src string, dst string, weight double"
    )
    unw = {r["node"]: r["pagerank"] for r in pagerank(nodes, e_unw, iterations=8).collect()}
    w1 = {r["node"]: r["pagerank"] for r in pagerank(nodes, e_w1, iterations=8).collect()}
    assert unw == w1


def _np_salsa(n_nodes, edge_list, iters):
    import numpy as np

    A = np.zeros((n_nodes, n_nodes))
    for s, d in edge_list:
        A[s, d] += 1.0
    od = A.sum(axis=1)
    ind = A.sum(axis=0)
    Wa = np.divide(A, od[:, None], out=np.zeros_like(A), where=od[:, None] > 0)
    Wh = np.divide(A, ind[None, :], out=np.zeros_like(A), where=ind[None, :] > 0)
    h = np.ones(n_nodes)
    a = np.zeros(n_nodes)
    for _ in range(iters):
        a = Wa.T @ h
        a = a / a.sum() if a.sum() > 0 else a
        h = Wh @ a
        h = h / h.sum() if h.sum() > 0 else h
    return a, h


def test_salsa_numpy_parity(spark):
    from bm25_pagerank_rpi_spark.operators.pagerank import hits, salsa

    edge_list = [(0, 1), (0, 2), (3, 1), (1, 4), (2, 4), (4, 0)]
    n_nodes = 6
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "node long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r.node: (r.authority, r.hub)
        for r in salsa(nodes, edges, iterations=4).collect()
    }
    a, h = _np_salsa(n_nodes, edge_list, 4)
    for i in range(n_nodes):
        assert got[i][0] == pytest.approx(a[i], abs=1e-12)
        assert got[i][1] == pytest.approx(h[i], abs=1e-12)
    assert got[5] == (0.0, 0.0)  # isolated node
    # degree normalization: node 0's two out-edges each carry 1/2, so its
    # targets' SALSA authorities differ from HITS's raw mutual counts —
    # but node 1 (in-links from 0 and 3) still out-ranks node 2 (only 0)
    assert got[1][0] > got[2][0]
    hits_got = {
        r.node: (r.authority, r.hub)
        for r in hits(nodes, edges, iterations=4).collect()
    }
    assert any(
        abs(got[i][0] - hits_got[i][0]) > 1e-9 for i in range(n_nodes)
    )  # salsa is NOT hits on this graph
