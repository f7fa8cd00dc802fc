"""HyperBall (approximate neighbourhood function) tests: exact
register parity vs a pure-python replica of the same deterministic
sketch, estimate accuracy vs exact BFS ball sizes, and the derived
distance summary on graphs where nx gives the exact answer."""

import hashlib

import networkx as nx
import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.operators.hyperball import (
    ball_size_estimate,
    distance_summary_hyperball,
    hll_alpha,
    hyperball_registers,
    neighborhood_function,
)


def _lg(spark, n, edges, directed=True):
    return LinkGraph(
        vertices=spark.range(n).select("id"),
        edges=spark.createDataFrame(
            pd.DataFrame(edges, columns=["src", "dst"])
        ).select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.lit(1.0).alias("weight"),
        ),
        directed=directed,
    )


# ---- pure-python replica of the deterministic sketch ----------------
def _hash60(v: int) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _init(v: int, b: int) -> list[int]:
    m = 1 << b
    hv = _hash60(v)
    j, w = hv % m, hv >> b
    if w == 0:
        rho = 61 - b
    else:
        rho = ((w & -w) - 1).bit_count() + 1
    regs = [0] * m
    regs[j] = rho
    return regs


def _py_hyperball(g: nx.DiGraph, b: int, t: int) -> dict[int, list[int]]:
    regs = {v: _init(v, b) for v in g.nodes()}
    for _ in range(t):
        new = {}
        for v in g.nodes():
            acc = list(regs[v])
            for w in g.successors(v):
                acc = [max(a, c) for a, c in zip(acc, regs[w])]
            new[v] = acc
        regs = new
    return regs


def _est(regs: list[int], b: int) -> float:
    import math

    m = 1 << b
    denom = 0.0
    for r in regs:
        denom += 1.0 / (1 << r)
    raw = hll_alpha(m) * m * m / denom
    zeros = sum(1 for r in regs if r == 0)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / float(zeros))
    return raw


def test_registers_match_python_replica(spark):
    g_nx = nx.gnp_random_graph(60, 0.06, seed=7, directed=True)
    g = _lg(spark, 60, list(g_nx.edges()))
    for t in (0, 1, 3):
        got = {
            r["id"]: [r[f"r{i}"] for i in range(16)]
            for r in hyperball_registers(g, b=4, t=t).collect()
        }
        want = _py_hyperball(g_nx, 4, t)
        assert got == want


def test_reverse_gives_in_balls(spark):
    g_nx = nx.gnp_random_graph(40, 0.08, seed=3, directed=True)
    g = _lg(spark, 40, list(g_nx.edges()))
    got = {
        r["id"]: [r[f"r{i}"] for i in range(16)]
        for r in hyperball_registers(g, b=4, t=2, reverse=True).collect()
    }
    want = _py_hyperball(g_nx.reverse(), 4, 2)
    assert got == want


def test_estimate_accuracy_vs_exact_bfs(spark):
    # b=6 -> standard error ~13%; assert the aggregate N(t) is within
    # 20% of the exact pair count at every t on a 300-node digraph
    g_nx = nx.gnp_random_graph(300, 0.02, seed=11, directed=True)
    g = _lg(spark, 300, list(g_nx.edges()))
    exact = []  # exact N(t) = #ordered pairs within distance t (incl self)
    dists = dict(nx.all_pairs_shortest_path_length(g_nx))
    for t in range(5):
        exact.append(
            sum(1 for s in dists for d in dists[s].values() if d <= t)
        )
    nf = {r["t"]: r["nf"] for r in neighborhood_function(g, b=6, max_t=4).collect()}
    for t in range(5):
        if t in nf:
            assert nf[t] == pytest.approx(exact[t], rel=0.20)


def test_estimate_column_matches_python_formula(spark):
    g_nx = nx.path_graph(12, create_using=nx.DiGraph)
    g = _lg(spark, 12, list(g_nx.edges()))
    regs = hyperball_registers(g, b=4, t=2)
    rows = ball_size_estimate(regs, b=4).collect()
    want = _py_hyperball(g_nx, 4, 2)
    for r in rows:
        assert r["est"] == pytest.approx(_est(want[r["id"]], 4), rel=1e-12)
        assert r["reg_sum"] == sum(want[r["id"]])


def test_monotone_saturation_and_summary_on_path(spark):
    # directed 6-path: N(t) must be nondecreasing and saturate at t=5;
    # the neighbourhood function stops by itself once saturated
    n = 6
    g = _lg(spark, n, [(i, i + 1) for i in range(n - 1)])
    nf = sorted(
        (r["t"], r["nf"]) for r in neighborhood_function(g, b=6, max_t=12).collect()
    )
    vals = [v for _, v in nf]
    assert all(b2 >= a2 for a2, b2 in zip(vals, vals[1:]))
    assert len(vals) <= 8  # early-stop fired, not max_t=12 rounds
    summary = distance_summary_hyperball(g, b=6, max_t=12).first()
    # exact: pairs = 15 reachable ordered pairs, avg distance 35/15
    assert summary["avg_distance"] == pytest.approx(35.0 / 15.0, rel=0.25)
    assert 0 < summary["effective_diameter"] <= 5.5


def test_undirected_symmetrizes(spark):
    g_nx = nx.cycle_graph(8)
    g = _lg(spark, 8, list(g_nx.edges()), directed=False)
    got = {
        r["id"]: [r[f"r{i}"] for i in range(16)]
        for r in hyperball_registers(g, b=4, t=2).collect()
    }
    want = _py_hyperball(g_nx.to_directed(), 4, 2)
    assert got == want


def test_harmonic_centrality_hyperball_accuracy(spark):
    """Per-node approximate harmonic centrality tracks nx's exact
    values: mean absolute relative error bounded by the b=6 sketch
    error, and the estimate is exact-ish on tiny in-shells (linear
    counting regime)."""
    from linkgraph.operators.hyperball import harmonic_centrality_hyperball

    g_nx = nx.gnp_random_graph(250, 0.025, seed=13, directed=True)
    g = _lg(spark, 250, list(g_nx.edges()))
    got = {
        r["id"]: r["harmonic_est"]
        for r in harmonic_centrality_hyperball(g, b=6, max_t=12).collect()
    }
    want = nx.harmonic_centrality(g_nx)
    assert set(got) == set(want)
    errs = []
    for v, w in want.items():
        if w > 0:
            errs.append(abs(got[v] - w) / w)
        else:
            assert got[v] == pytest.approx(0.0, abs=1e-9)
    assert sum(errs) / len(errs) < 0.15, sum(errs) / len(errs)
    # aggregate mass within the sketch error too
    assert sum(got.values()) == pytest.approx(sum(want.values()), rel=0.15)


def test_closeness_hyperball_accuracy(spark):
    """closeness_est tracks nx.closeness_centrality (Wasserman–Faust,
    in-distances) on the same digraph as the harmonic test."""
    from linkgraph.operators.hyperball import harmonic_centrality_hyperball

    g_nx = nx.gnp_random_graph(250, 0.025, seed=13, directed=True)
    g = _lg(spark, 250, list(g_nx.edges()))
    rows = {
        r["id"]: r for r in harmonic_centrality_hyperball(g, b=6, max_t=12).collect()
    }
    want = nx.closeness_centrality(g_nx)
    errs = []
    for v, w in want.items():
        if w > 0:
            errs.append(abs(rows[v]["closeness_est"] - w) / w)
        else:
            assert rows[v]["closeness_est"] == pytest.approx(0.0, abs=1e-9)
    assert sum(errs) / len(errs) < 0.20, sum(errs) / len(errs)
    # reachable-set sizes track the exact in-ball sizes
    dists = dict(nx.all_pairs_shortest_path_length(g_nx))
    n_in = {v: 0 for v in g_nx}
    for s in dists:
        for t_ in dists[s]:
            n_in[t_] += 1
    for v, r in rows.items():
        assert r["n_in_est"] == pytest.approx(n_in[v], rel=0.30, abs=2.0)


def test_registers_equal_exact_ball_closure(spark):
    """Semantic definition check, independent of the superstep
    implementation: M_v(t) must equal the element-wise max of INIT
    sketches over the exact BFS out-ball B(v,t) computed by nx."""
    g_nx = nx.gnp_random_graph(80, 0.05, seed=23, directed=True)
    g = _lg(spark, 80, list(g_nx.edges()))
    for t in (1, 2, 4):
        got = {
            r["id"]: [r[f"r{i}"] for i in range(16)]
            for r in hyperball_registers(g, b=4, t=t).collect()
        }
        for v in g_nx.nodes():
            ball = {v} | {
                u
                for u, d in nx.single_source_shortest_path_length(
                    g_nx, v, cutoff=t
                ).items()
            }
            want = [0] * 16
            for u in ball:
                want = [max(a, c) for a, c in zip(want, _init(u, 4))]
            assert got[v] == want, (t, v)
