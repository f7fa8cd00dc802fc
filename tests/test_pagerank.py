"""Ported pagerank suite (networkx/algorithms/link_analysis/tests/
test_pagerank.py) — fixtures P1-P4 of FIXTURES.md, run through the FULL
engine path: fixture graph -> HTML pages -> extraction UDF -> edge
table -> pagerank supersteps.
"""

import pytest

from linkgraph.graph import graph_from_edge_names, graph_from_pages
from linkgraph.operators.pagerank import pagerank
from linkgraph.plans.loop import PowerIterationFailedConvergence
from linkgraph.sources import corpus

from nx_oracle import nx_graph, oracle_pagerank, ranks_by_name

# P1: Langville–Meyer 6-node web graph (test_pagerank.py:24-39)
P1_EDGES = [(1, 2), (1, 3), (3, 1), (3, 2), (3, 5), (4, 5), (4, 6), (5, 4), (5, 6), (6, 4)]
P1_GOLDEN = {
    "1": 0.03721197,
    "2": 0.05395735,
    "3": 0.04150565,
    "4": 0.37508082,
    "5": 0.20599833,
    "6": 0.28624589,
}


def p1_graph(spark):
    pages = corpus.pages_df(spark, "p1", P1_EDGES)
    return graph_from_pages(pages, directed=True)


def test_p1_golden_full_ingest_path(spark):
    g = p1_graph(spark)
    ranks = pagerank(g, alpha=0.9, tol=1e-8)
    got = ranks_by_name(g, ranks)
    assert got.keys() == P1_GOLDEN.keys()
    for k, v in P1_GOLDEN.items():
        assert got[k] == pytest.approx(v, abs=1e-4)


def test_p1_vs_live_oracle(spark):
    g = p1_graph(spark)
    got = ranks_by_name(g, pagerank(g, alpha=0.9, tol=1e-8))
    ref = oracle_pagerank(nx_graph(P1_EDGES, directed=True), alpha=0.9, tol=1e-8)
    for k, v in ref.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-6)


def test_p1_dangling_variant(spark):
    # test_pagerank.py:54-60,160-164
    g = p1_graph(spark)
    name_to_id = {r["url"].rsplit("/", 1)[-1]: r["id"] for r in g.vertices.collect()}
    dangling = {name_to_id["1"]: 2.0, name_to_id["2"]: 3.0, name_to_id["3"]: 0.0,
                name_to_id["4"]: 0.0, name_to_id["5"]: 0.0, name_to_id["6"]: 0.0}
    got = ranks_by_name(g, pagerank(g, dangling=dangling))
    golden = {
        "1": 0.10844518, "2": 0.18618601, "3": 0.0710892,
        "4": 0.2683668, "5": 0.15919783, "6": 0.20671497,
    }
    for k, v in golden.items():
        assert got[k] == pytest.approx(v, abs=1e-4)


def test_max_iter_zero_raises(spark):
    g = p1_graph(spark)
    with pytest.raises(PowerIterationFailedConvergence):
        pagerank(g, max_iter=0)


def test_k4_personalization(spark):
    # P2: complete_graph(4) goldens (test_pagerank.py:93-105)
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = graph_from_edge_names(spark, edges, directed=False)
    name_to_id = {r["url"]: r["id"] for r in g.vertices.collect()}
    pers = {name_to_id["0"]: 1.0, name_to_id["1"]: 1.0, name_to_id["2"]: 4.0, name_to_id["3"]: 4.0}
    got = ranks_by_name(g, pagerank(g, alpha=0.85, personalization=pers))
    golden = {"0": 0.23246732, "1": 0.23246732, "2": 0.26753267, "3": 0.26753267}
    for k, v in golden.items():
        assert got[k] == pytest.approx(v, abs=1e-4)


def test_k4_incomplete_personalization(spark):
    # test_pagerank.py:113-139
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = graph_from_edge_names(spark, edges, directed=False)
    name_to_id = {r["url"]: r["id"] for r in g.vertices.collect()}
    got = ranks_by_name(g, pagerank(g, personalization={name_to_id["3"]: 1.0}))
    golden = {"0": 0.22077931, "1": 0.22077931, "2": 0.22077931, "3": 0.33766205}
    for k, v in golden.items():
        assert got[k] == pytest.approx(v, abs=1e-4)


def test_zero_personalization_raises(spark):
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = graph_from_edge_names(spark, edges, directed=False)
    with pytest.raises(ZeroDivisionError):
        pagerank(g, personalization={0: 0.0, 1: 0.0, 2: 0.0, 3: 0.0})


def test_multigraph_parallel_edges(spark):
    # P3 (test_pagerank.py:173-185): nodes 1,2,3,'3' -> urls m/1 m/2 m/3 m/3s
    edges = [("1", "2")] * 3 + [("2", "3")] * 2 + [("3s", "3")] * 2
    pages = corpus.pages_df(spark, "m", edges)
    g = graph_from_pages(pages, directed=False)
    got = ranks_by_name(g, pagerank(g))
    golden = {"1": 0.21066048, "2": 0.33953086, "3": 0.28933952, "3s": 0.16046914}
    for k, v in golden.items():
        assert got[k] == pytest.approx(v, abs=1e-4)


def test_weighted_karate_vs_oracle(spark):
    import networkx as nx

    kg = nx.karate_club_graph()
    edges = [(u, v, d["weight"]) for u, v, d in kg.edges(data=True)]
    g = graph_from_edge_names(spark, edges, directed=False)
    got = ranks_by_name(g, pagerank(g))
    ref = oracle_pagerank(kg)
    for k, v in ref.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-6)


def test_nstart_and_checkpoint_ledger(spark, tmp_ckpt):
    import json
    import os

    g = p1_graph(spark)
    name_to_id = {r["url"].rsplit("/", 1)[-1]: r["id"] for r in g.vertices.collect()}
    nstart = {i: 1.0 + (i % 2) for i in name_to_id.values()}
    got = ranks_by_name(
        g,
        pagerank(g, alpha=0.9, tol=1e-8, nstart=nstart,
                 checkpoint_dir=tmp_ckpt, checkpoint_every=3, lineage=True),
    )
    for k, v in P1_GOLDEN.items():
        assert got[k] == pytest.approx(v, abs=1e-4)
    ledger = os.path.join(tmp_ckpt, "pagerank.ledger.jsonl")
    recs = [json.loads(l) for l in open(ledger)]
    assert recs and all("l1_error" in r for r in recs)
    assert any(r["checkpointed"] and "partitions" in r for r in recs)


def test_resume_mid_algorithm(spark, tmp_ckpt):
    """Kill a checkpointed run mid-flight, resume, get identical final
    ranks + a continuous ledger (north rule: resumable from checkpoint
    with per-partition lineage; SuperstepLoop.resume read-side)."""
    import json
    import os
    g = p1_graph(spark)
    # interrupted run: budget exhausts after 4 of the ~30 needed iters
    with pytest.raises(PowerIterationFailedConvergence):
        pagerank(g, alpha=0.9, tol=1e-8, max_iter=4,
                 checkpoint_dir=tmp_ckpt, checkpoint_every=2, lineage=True)
    ledger = os.path.join(tmp_ckpt, "pagerank.ledger.jsonl")
    first_seg = [json.loads(l) for l in open(ledger)]
    assert max(r["iteration"] for r in first_seg) == 4
    snaps = [d for d in os.listdir(tmp_ckpt) if d.startswith("pagerank.superstep=")]
    assert snaps, "interrupted run must leave snapshots"

    resumed = pagerank(g, alpha=0.9, tol=1e-8, max_iter=100,
                       checkpoint_dir=tmp_ckpt, checkpoint_every=2,
                       lineage=True, resume=True)
    got = ranks_by_name(g, resumed)
    for k, v in P1_GOLDEN.items():
        assert got[k] == pytest.approx(v, abs=1e-4)
    # uninterrupted reference run — identical trajectory
    clean = ranks_by_name(g, pagerank(g, alpha=0.9, tol=1e-8))
    for k, v in clean.items():
        assert got[k] == pytest.approx(v, abs=1e-12)
    # ledger continuity: second segment picks up after iteration 4
    recs = [json.loads(l) for l in open(ledger)]
    second_seg = recs[len(first_seg):]
    assert second_seg and min(r["iteration"] for r in second_seg) == 5
    assert all("l1_error" in r for r in second_seg)


def test_trustrank_vs_nx_personalized(spark):
    """TrustRank == nx pagerank with seed-restricted personalization
    AND dangling vectors (the VLDB'04 semantics)."""
    from linkgraph.operators.pagerank import trustrank
    from nx_oracle import nx_graph, oracle_pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 3)]  # 5 dangles
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    rev = {v: k for k, v in nm.items()}
    seeds = [rev["1"], rev["6"]]
    got = {nm[r["id"]]: r["rank"] for r in trustrank(g, seeds, tol=1e-10).collect()}
    pv = {1: 1.0, 6: 1.0}
    want = oracle_pagerank(
        nx_graph(edges, directed=True),
        personalization=pv, dangling=pv, tol=1e-10,
    )
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-7)
    # trust decays with distance from the seeds: non-seed mass smaller
    assert got["5"] < got["3"]


def test_local_kernel_vs_distributed_parity(spark):
    """The size-gated single-task numpy kernel (pagerank.py
    ``_local_pagerank``) and the salted CSR-block superstep plan
    (``local_max_edges=0``) are the same algorithm in two physical
    shapes — ranks must agree to 1e-12 on a graph that exercises
    every semantic branch at once: dangling nodes, non-uniform
    personalization, custom dangling weights, weighted parallel
    edges, convergence mode."""
    import networkx as nx

    kg = nx.karate_club_graph()
    edges = [(u, v, d["weight"]) for u, v, d in kg.edges(data=True)]
    g = graph_from_edge_names(spark, edges, directed=False)
    ids = [r["id"] for r in g.vertices.collect()]
    pers = {i: 1.0 + (i % 3) for i in ids}
    dang = {i: 2.0 if i % 2 else 1.0 for i in ids}
    kw = dict(alpha=0.9, tol=1e-10, personalization=pers, dangling=dang)
    local = {r["id"]: r["rank"] for r in pagerank(g, **kw).collect()}
    dist = {r["id"]: r["rank"] for r in
            pagerank(g, local_max_edges=0, **kw).collect()}
    assert local.keys() == dist.keys()
    for k in local:
        assert local[k] == pytest.approx(dist[k], abs=1e-12)


def test_local_kernel_fixed_iter_parity(spark):
    """fixed_iter mode through both physical paths on the directed P1
    graph (has dangling nodes) — exact same trajectory."""
    g = p1_graph(spark)
    local = {r["id"]: r["rank"]
             for r in pagerank(g, fixed_iter=7).collect()}
    dist = {r["id"]: r["rank"]
            for r in pagerank(g, fixed_iter=7, local_max_edges=0).collect()}
    for k in local:
        assert local[k] == pytest.approx(dist[k], abs=1e-12)


def test_spam_mass_vs_nx(spark):
    """spam_mass == (PR - TrustRank)/PR with both vectors matching nx;
    a node fed only by untrusted pages scores higher relative mass
    than the trusted seeds themselves."""
    from linkgraph.operators.pagerank import spam_mass
    from nx_oracle import nx_graph, oracle_pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 3), (7, 5), (7, 4)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}
    rev = {v: k for k, v in nm.items()}
    seeds = [rev["1"], rev["6"]]
    rows = {nm[r["id"]]: r for r in spam_mass(g, seeds, tol=1e-10).collect()}
    gnx = nx_graph(edges, directed=True)
    pr = oracle_pagerank(gnx, tol=1e-10)
    pv = {1: 1.0, 6: 1.0}
    tr = oracle_pagerank(gnx, personalization=pv, dangling=pv, tol=1e-10)
    for k in pr:
        r = rows[str(k)]
        assert r["rank"] == pytest.approx(pr[k], abs=1e-7)
        assert r["trust_rank"] == pytest.approx(tr[k], abs=1e-7)
        assert r["spam_mass"] == pytest.approx((pr[k] - tr[k]) / pr[k], abs=1e-5)
    # node 7 is a dangling-free source no trust reaches except via
    # teleport: its rank is all untrusted -> highest relative mass
    assert rows["7"]["spam_mass"] == max(r["spam_mass"] for r in rows.values())
