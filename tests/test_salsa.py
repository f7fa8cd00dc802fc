"""SALSA vs an independent numpy reimplementation of the same update;
the indegree-proportional stationary property; co-citation /
bibliographic coupling vs brute force."""

import numpy as np
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.hits import salsa
from linkgraph.operators.links import bibliographic_coupling, cocitation
from linkgraph.plans.loop import PowerIterationFailedConvergence


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


EDGES = [(1, 3), (1, 5), (2, 1), (3, 5), (5, 4), (5, 3), (6, 5), (2, 5)]


def _numpy_salsa(edges, nodes, iters):
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for u, v in edges:
        A[idx[u], idx[v]] += 1.0
    outs = A.sum(axis=1)
    ins = A.sum(axis=0)
    W_out = np.divide(A, outs[:, None], out=np.zeros_like(A), where=outs[:, None] > 0)
    W_in = np.divide(A, ins[None, :], out=np.zeros_like(A), where=ins[None, :] > 0)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(iters):
        a = h @ W_out
        a = a / a.sum()
        h = W_in @ a
        h = h / h.sum()
    return {str(m): (h[idx[m]], a[idx[m]]) for m in nodes}


def test_salsa_fixed_iter_vs_numpy(spark):
    g = graph_from_edge_names(spark, EDGES, directed=True)
    nm = names(g)
    got = {
        nm[r["id"]]: (r["hub"], r["authority"])
        for r in salsa(g, fixed_iter=6).collect()
    }
    want = _numpy_salsa(EDGES, sorted({x for e in EDGES for x in e}), 6)
    for k, (wh, wa) in want.items():
        assert got[k][0] == pytest.approx(wh, abs=1e-9)
        assert got[k][1] == pytest.approx(wa, abs=1e-9)


def test_salsa_authority_propto_indegree(spark):
    # connected authority support: stationary authority ∝ indegree
    edges = [(0, 2), (0, 3), (1, 2), (1, 3), (1, 4), (0, 4), (2, 3)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = names(g)
    got = {nm[r["id"]]: r["authority"] for r in salsa(g, tol=1e-12).collect()}
    indeg = {}
    for _, v in edges:
        indeg[str(v)] = indeg.get(str(v), 0) + 1
    tot = sum(indeg.values())
    for k, d in indeg.items():
        assert got[k] == pytest.approx(d / tot, abs=1e-6)


def test_salsa_nonconvergence_raises(spark):
    g = graph_from_edge_names(spark, EDGES, directed=True)
    with pytest.raises(PowerIterationFailedConvergence):
        salsa(g, max_iter=1, tol=1e-30)


def test_cocitation_and_coupling(spark):
    g = graph_from_edge_names(spark, EDGES, directed=True)
    nm = names(g)
    cc = {
        (nm[r["a"]], nm[r["b"]]): r["n_citers"]
        for r in cocitation(g).collect()
    }
    # brute force
    from collections import defaultdict

    want = defaultdict(int)
    by_src = defaultdict(set)
    for u, v in EDGES:
        by_src[u].add(v)
    for _, dsts in by_src.items():
        s = sorted(dsts)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                want[(str(s[i]), str(s[j]))] += 1
    assert cc == dict(want)

    bc = {
        (nm[r["a"]], nm[r["b"]]): r["n_shared_refs"]
        for r in bibliographic_coupling(g).collect()
    }
    want2 = defaultdict(int)
    by_dst = defaultdict(set)
    for u, v in EDGES:
        by_dst[v].add(u)
    for _, srcs in by_dst.items():
        s = sorted(srcs)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                want2[(str(s[i]), str(s[j]))] += 1
    assert bc == dict(want2)
