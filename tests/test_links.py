"""Link-prediction / common-neighbors / assortativity vs nx oracles."""

import math

import networkx as nx
import pytest

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators import links
from linkgraph.operators.assortativity import degree_assortativity_coefficient

from nx_oracle import nx_graph

KARATE = list(nx.karate_club_graph().edges())


def _g(spark, edges, directed=False, nodes=()):
    return graph_from_edge_names(spark, edges, nodes=nodes, directed=directed)


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


def test_common_neighbors_vs_nx(spark):
    g = _g(spark, KARATE)
    nm = names(g)
    rev = {v: k for k, v in nm.items()}
    ref = sorted(nx.common_neighbors(nx_graph(KARATE), 0, 1))
    got = sorted(
        nm[r["id"]] for r in links.common_neighbors(g, rev["0"], rev["1"]).collect()
    )
    assert got == [str(n) for n in sorted(ref, key=str)]


def test_common_neighbors_directed_raises(spark):
    g = _g(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        links.common_neighbors(g, 0, 1)


def test_jaccard_adamic_ra_pa_vs_nx(spark):
    g = _g(spark, KARATE)
    nm = names(g)
    G = nx_graph(KARATE)
    # engine emits all wedge pairs; nx ebunch=None means non-edges only,
    # so feed nx exactly the engine's pair set for value comparison
    jc = {
        (nm[r["u"]], nm[r["v"]]): r["jaccard"]
        for r in links.jaccard_coefficient(g).collect()
    }
    pairs = [(int(a), int(b)) for a, b in jc]
    ref = {(str(u), str(v)): p for u, v, p in nx.jaccard_coefficient(G, pairs)}
    assert jc.keys() == ref.keys()
    for k, v in ref.items():
        assert jc[k] == pytest.approx(v, abs=1e-9)

    aa = {
        (nm[r["u"]], nm[r["v"]]): r["aa"]
        for r in links.adamic_adar_index(g).collect()
    }
    ref_aa = {(str(u), str(v)): p for u, v, p in nx.adamic_adar_index(G, pairs)}
    for k, v in ref_aa.items():
        assert aa[k] == pytest.approx(v, abs=1e-9)

    ra = {
        (nm[r["u"]], nm[r["v"]]): r["ra"]
        for r in links.resource_allocation_index(g).collect()
    }
    ref_ra = {
        (str(u), str(v)): p for u, v, p in nx.resource_allocation_index(G, pairs)
    }
    for k, v in ref_ra.items():
        assert ra[k] == pytest.approx(v, abs=1e-9)

    pa = {
        (nm[r["u"]], nm[r["v"]]): r["pa"]
        for r in links.preferential_attachment(g).collect()
    }
    ref_pa = {
        (str(u), str(v)): p for u, v, p in nx.preferential_attachment(G, pairs)
    }
    for k, v in ref_pa.items():
        assert pa[k] == v


def test_common_neighbor_counts_adjacent(spark):
    g = _g(spark, KARATE)
    nm = names(g)
    G = nx_graph(KARATE)
    got = {
        (nm[r["u"]], nm[r["v"]]): r["cn"]
        for r in links.common_neighbor_counts(g, adjacent_only=True).collect()
    }
    for (u, v), cn in got.items():
        assert G.has_edge(int(u), int(v))
        assert cn == len(list(nx.common_neighbors(G, int(u), int(v))))


def test_degree_assortativity_vs_nx(spark):
    g = _g(spark, KARATE)
    ref = nx.degree_assortativity_coefficient(nx_graph(KARATE))
    assert degree_assortativity_coefficient(g) == pytest.approx(ref, abs=1e-9)


def test_degree_assortativity_directed_vs_nx(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 1), (0, 3)]
    g = _g(spark, edges, directed=True)
    ref = nx.degree_assortativity_coefficient(nx_graph(edges, directed=True))
    assert degree_assortativity_coefficient(g) == pytest.approx(ref, abs=1e-9)


def test_community_aware_indices(spark):
    import networkx as nx
    import pyspark.sql.functions as F

    from linkgraph.graph import LinkGraph
    from linkgraph.operators.links import (
        cn_soundarajan_hopcroft,
        ra_index_soundarajan_hopcroft,
        within_inter_cluster,
    )

    G = nx.karate_club_graph()
    comm = {v: (0 if G.nodes[v]["club"] == "Mr. Hi" else 1) for v in G}
    nx.set_node_attributes(G, comm, "community")
    e = spark.createDataFrame(
        [(a, b, None) for a, b in G.edges()], "src long, dst long, weight double"
    )
    v = spark.createDataFrame([(i,) for i in range(34)], "id long")
    g = LinkGraph(vertices=v, edges=e, directed=False)
    cdf = spark.createDataFrame(list(comm.items()), "id long, community long")

    pairs = [
        (u, w) for u in G for w in G if u < w and set(G[u]) & set(G[w])
    ]  # wedge candidates (the engine's documented candidate set)

    got = {(r["u"], r["v"]): r["score"]
           for r in cn_soundarajan_hopcroft(g, cdf).collect()}
    want = {(u, w): s for u, w, s in nx.cn_soundarajan_hopcroft(G, pairs)}
    assert got == want

    got = {(r["u"], r["v"]): r["score"]
           for r in ra_index_soundarajan_hopcroft(g, cdf).collect()}
    want = {(u, w): s for u, w, s in nx.ra_index_soundarajan_hopcroft(G, pairs)}
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want)

    got = {(r["u"], r["v"]): r["score"]
           for r in within_inter_cluster(g, cdf).collect()}
    want = {(u, w): s for u, w, s in nx.within_inter_cluster(G, pairs)}
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        within_inter_cluster(g, cdf, delta=0)


def test_dispersion_vs_nx(spark):
    g = _g(spark, KARATE)
    nm = names(g)
    G = nx_graph(KARATE)
    ref = nx.dispersion(G)
    got = {
        (nm[r["u"]], nm[r["v"]]): (r["embeddedness"], r["dispersion"])
        for r in links.dispersion(g).collect()
    }
    # both orientations emitted (the measure is asymmetric — the
    # third-tie witness must lie inside N(u)), like the reference's
    # full-graph dict-of-dicts
    assert len(got) == 2 * G.number_of_edges()
    for (u, v), (emb, d) in got.items():
        iu, iv = int(u), int(v)
        assert d == pytest.approx(ref[iu][iv], abs=1e-9)
        assert emb == len(list(nx.common_neighbors(G, iu, iv)))


def test_dispersion_unnormalized_and_params_vs_nx(spark):
    g = _g(spark, KARATE)
    nm = names(g)
    G = nx_graph(KARATE)
    raw = {
        (nm[r["u"]], nm[r["v"]]): r["dispersion"]
        for r in links.dispersion(g, normalized=False).collect()
    }
    refraw = nx.dispersion(G, normalized=False)
    for (u, v), d in raw.items():
        assert d == pytest.approx(refraw[int(u)][int(v)], abs=1e-9)
    tuned = {
        (nm[r["u"]], nm[r["v"]]): r["dispersion"]
        for r in links.dispersion(g, alpha=0.6, b=0.2, c=1.0).collect()
    }
    reftuned = nx.dispersion(G, alpha=0.6, b=0.2, c=1.0)
    for (u, v), d in tuned.items():
        assert d == pytest.approx(reftuned[int(u)][int(v)], abs=1e-9)


def test_dispersion_directed_raises(spark):
    g = _g(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        links.dispersion(g)
