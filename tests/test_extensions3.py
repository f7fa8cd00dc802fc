"""Round-2 tranche 3: k-core family variants (k_shell/k_crust/
k_corona/onion_layers), boundaries, degree connectivity, attribute
assortativity, structural holes, degree centrality, weighted
clustering, bipartite 2-coloring — each vs the live networkx oracle."""

import math

import networkx as nx
import pytest
from pyspark.sql import functions as F

from linkgraph.graph import graph_from_edge_names
from linkgraph.operators.assortativity import (
    attribute_assortativity_coefficient,
    average_degree_connectivity,
)
from linkgraph.operators.bipartite import (
    bipartite_color,
    bipartite_sets,
    is_bipartite,
)
from linkgraph.operators.boundary import edge_boundary, node_boundary
from linkgraph.operators.core import (
    core_number,
    k_corona,
    k_crust,
    k_shell,
    onion_layers,
)
from linkgraph.operators.structural import (
    degree_centrality,
    effective_size,
    in_degree_centrality,
    out_degree_centrality,
)
from linkgraph.operators.triangles import weighted_clustering

from nx_oracle import nx_graph


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


def ids_by_name(g):
    return {v: k for k, v in names(g).items()}


# a graph with a non-trivial core structure: a K5, a C4 hanging off it,
# a path tail, and an isolated node
CORE_EDGES = (
    [(a, b) for a in range(5) for b in range(a + 1, 5)]  # K5 -> core 4
    + [(4, 5), (5, 6), (6, 7), (7, 4)]  # C4 attached -> core 2
    + [(7, 8), (8, 9)]  # tail -> core 1
)
CORE_NODES = list(range(10)) + [99]  # 99 isolated


def _core_fixture(spark):
    return graph_from_edge_names(spark, CORE_EDGES, nodes=CORE_NODES, directed=False)


def _nx_core_fixture():
    return nx_graph(CORE_EDGES, nodes=CORE_NODES, directed=False)


def test_k_shell_vs_nx(spark):
    g = _core_fixture(spark)
    G = _nx_core_fixture()
    nm = names(g)
    c = core_number(g).persist()
    for k in [0, 1, 2, 4]:
        sub = k_shell(g, k, core=c)
        got_nodes = {nm[r["id"]] for r in sub.vertices.collect()}
        want = nx.k_shell(G, k)
        assert got_nodes == {str(n) for n in want.nodes}
        got_edges = {
            tuple(sorted((nm[r["src"]], nm[r["dst"]])))
            for r in sub.edges.collect()
        }
        want_edges = {tuple(sorted((str(u), str(v)))) for u, v in want.edges}
        assert got_edges == want_edges
    c.unpersist()


def test_k_shell_default_k_is_max_core(spark):
    g = _core_fixture(spark)
    G = _nx_core_fixture()
    nm = names(g)
    got = {nm[r["id"]] for r in k_shell(g).vertices.collect()}
    assert got == {str(n) for n in nx.k_shell(G).nodes}


def test_k_crust_vs_nx(spark):
    g = _core_fixture(spark)
    G = _nx_core_fixture()
    nm = names(g)
    c = core_number(g).persist()
    for k in [0, 1, 2]:
        got = {nm[r["id"]] for r in k_crust(g, k, core=c).vertices.collect()}
        assert got == {str(n) for n in nx.k_crust(G, k).nodes}, f"k={k}"
    # default k = max core - 1
    got = {nm[r["id"]] for r in k_crust(g, core=c).vertices.collect()}
    assert got == {str(n) for n in nx.k_crust(G).nodes}
    c.unpersist()


def test_k_corona_vs_nx(spark):
    g = _core_fixture(spark)
    G = _nx_core_fixture()
    nm = names(g)
    c = core_number(g).persist()
    for k in [1, 2, 4]:
        got = {nm[r["id"]] for r in k_corona(g, k, core=c).vertices.collect()}
        assert got == {str(n) for n in nx.k_corona(G, k).nodes}, f"k={k}"
    c.unpersist()


def test_onion_layers_vs_nx(spark):
    g = _core_fixture(spark)
    G = _nx_core_fixture()
    nm = names(g)
    got = {nm[r["id"]]: r["layer"] for r in onion_layers(g).collect()}
    want = nx.onion_layers(G)
    assert got == {str(k): v for k, v in want.items()}


def test_onion_layers_random_gnp_vs_nx(spark):
    G = nx.gnp_random_graph(60, 0.08, seed=7)
    edges = list(G.edges())
    g = graph_from_edge_names(spark, edges, nodes=list(G.nodes), directed=False)
    nm = names(g)
    got = {nm[r["id"]]: r["layer"] for r in onion_layers(g).collect()}
    want = {str(k): v for k, v in nx.onion_layers(G).items()}
    assert got == want


def test_onion_layers_rejects_self_loops(spark):
    g = graph_from_edge_names(spark, [(1, 1), (1, 2)], directed=False)
    with pytest.raises(ValueError):
        onion_layers(g)


# ------------------------------------------------------------- boundaries
B_EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (2, 6)]


def _nbunch_df(spark, g, names_set):
    inv = ids_by_name(g)
    return spark.createDataFrame(
        [(inv[str(n)],) for n in names_set], "id long"
    )


def test_edge_boundary_undirected_vs_nx(spark):
    g = graph_from_edge_names(spark, B_EDGES, directed=False)
    G = nx_graph(B_EDGES, directed=False)
    nm = names(g)
    s = {0, 1, 2}
    got = {
        tuple(sorted((nm[r["src"]], nm[r["dst"]])))
        for r in edge_boundary(g, _nbunch_df(spark, g, s)).collect()
    }
    want = {
        tuple(sorted((str(u), str(v)))) for u, v in nx.edge_boundary(G, s)
    }
    assert got == want


def test_edge_boundary_directed_with_t(spark):
    g = graph_from_edge_names(spark, B_EDGES, directed=True)
    G = nx_graph(B_EDGES, directed=True)
    nm = names(g)
    s, t = {0, 1, 2}, {3, 6}
    got = {
        (nm[r["src"]], nm[r["dst"]])
        for r in edge_boundary(
            g, _nbunch_df(spark, g, s), _nbunch_df(spark, g, t)
        ).collect()
    }
    want = {(str(u), str(v)) for u, v in nx.edge_boundary(G, s, t)}
    assert got == want


def test_node_boundary_vs_nx(spark):
    g = graph_from_edge_names(spark, B_EDGES, directed=False)
    G = nx_graph(B_EDGES, directed=False)
    nm = names(g)
    s = {0, 1}
    got = {nm[r["id"]] for r in node_boundary(g, _nbunch_df(spark, g, s)).collect()}
    assert got == {str(n) for n in nx.node_boundary(G, s)}
    t = {2, 3}
    got = {
        nm[r["id"]]
        for r in node_boundary(
            g, _nbunch_df(spark, g, s), _nbunch_df(spark, g, t)
        ).collect()
    }
    assert got == {str(n) for n in nx.node_boundary(G, s, t)}


# ------------------------------------------- average degree connectivity
def test_average_degree_connectivity_vs_nx(spark):
    G = nx.gnp_random_graph(40, 0.12, seed=11)
    edges = list(G.edges())
    g = graph_from_edge_names(spark, edges, nodes=list(G.nodes), directed=False)
    got = {
        r["degree"]: r["avg_connectivity"]
        for r in average_degree_connectivity(g).collect()
    }
    want = nx.average_degree_connectivity(G)
    want = {k: v for k, v in want.items() if k > 0}
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


# --------------------------------------------- attribute assortativity
def test_attribute_assortativity_vs_nx(spark):
    G = nx.gnp_random_graph(30, 0.15, seed=3)
    attr = {n: ["red", "green", "blue"][n % 3] for n in G.nodes}
    nx.set_node_attributes(G, attr, "color")
    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes),
                              directed=False)
    inv = ids_by_name(g)
    adf = spark.createDataFrame(
        [(inv[str(n)], c) for n, c in attr.items()], "id long, color string"
    )
    g = type(g)(
        vertices=g.vertices.join(adf, "id"), edges=g.edges, directed=False
    )
    got = attribute_assortativity_coefficient(g, "color")
    want = nx.attribute_assortativity_coefficient(G, "color")
    assert got == pytest.approx(want, abs=1e-9)


def test_attribute_assortativity_directed(spark):
    G = nx.gnp_random_graph(25, 0.15, seed=5, directed=True)
    attr = {n: "ab"[n % 2] for n in G.nodes}
    nx.set_node_attributes(G, attr, "grp")
    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes),
                              directed=True)
    inv = ids_by_name(g)
    adf = spark.createDataFrame(
        [(inv[str(n)], c) for n, c in attr.items()], "id long, grp string"
    )
    g = type(g)(vertices=g.vertices.join(adf, "id"), edges=g.edges, directed=True)
    got = attribute_assortativity_coefficient(g, "grp")
    want = nx.attribute_assortativity_coefficient(G, "grp")
    assert got == pytest.approx(want, abs=1e-9)


# ------------------------------------------------------ structural holes
def test_effective_size_vs_nx(spark):
    G = nx.gnp_random_graph(30, 0.2, seed=9)
    G.add_node(999)  # isolated -> nan
    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes),
                              directed=False)
    nm = names(g)
    got = {nm[r["id"]]: r["effective_size"] for r in effective_size(g).collect()}
    want = nx.effective_size(G)
    for k, v in want.items():
        if math.isnan(v):
            assert got[str(k)] is None
        else:
            assert got[str(k)] == pytest.approx(v, abs=1e-9), k


# ------------------------------------------------------ degree centrality
def test_degree_centrality_vs_nx(spark):
    G = nx.gnp_random_graph(25, 0.15, seed=13)
    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes),
                              directed=False)
    nm = names(g)
    got = {nm[r["id"]]: r["centrality"] for r in degree_centrality(g).collect()}
    want = nx.degree_centrality(G)
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-12)


def test_in_out_degree_centrality_vs_nx(spark):
    G = nx.gnp_random_graph(25, 0.15, seed=17, directed=True)
    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes),
                              directed=True)
    nm = names(g)
    got_in = {nm[r["id"]]: r["centrality"] for r in in_degree_centrality(g).collect()}
    got_out = {nm[r["id"]]: r["centrality"] for r in out_degree_centrality(g).collect()}
    for k, v in nx.in_degree_centrality(G).items():
        assert got_in[str(k)] == pytest.approx(v, abs=1e-12)
    for k, v in nx.out_degree_centrality(G).items():
        assert got_out[str(k)] == pytest.approx(v, abs=1e-12)


def test_degree_centrality_undirected_rejects_directed_views(spark):
    g = graph_from_edge_names(spark, [(1, 2)], directed=False)
    with pytest.raises(ValueError):
        in_degree_centrality(g)


# ----------------------------------------------------- weighted clustering
def test_weighted_clustering_vs_nx(spark):
    G = nx.Graph()
    import random

    rng = random.Random(21)
    base = nx.gnp_random_graph(25, 0.25, seed=19)
    wedges = [(u, v, round(rng.uniform(0.1, 5.0), 3)) for u, v in base.edges()]
    G.add_weighted_edges_from(wedges)
    G.add_nodes_from(base.nodes)
    g = graph_from_edge_names(spark, wedges, nodes=list(base.nodes),
                              directed=False)
    nm = names(g)
    got = {nm[r["id"]]: r["clustering"] for r in weighted_clustering(g).collect()}
    want = nx.clustering(G, weight="weight")
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-9), k


def test_weighted_clustering_uniform_weights_match_unweighted(spark):
    edges = [(0, 1, 2.0), (1, 2, 2.0), (0, 2, 2.0), (2, 3, 2.0)]
    g = graph_from_edge_names(spark, edges, directed=False)
    nm = names(g)
    got = {nm[r["id"]]: r["clustering"] for r in weighted_clustering(g).collect()}
    G = nx_graph(edges, directed=False)
    want = nx.clustering(G)  # all-equal weights normalize to 1
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-9)


# ------------------------------------------------------------- bipartite
def test_is_bipartite_even_cycle(spark):
    edges = [(i, (i + 1) % 6) for i in range(6)]
    g = graph_from_edge_names(spark, edges, directed=False)
    assert is_bipartite(g) is True


def test_is_bipartite_odd_cycle(spark):
    edges = [(i, (i + 1) % 5) for i in range(5)]
    g = graph_from_edge_names(spark, edges, directed=False)
    assert is_bipartite(g) is False


def test_is_bipartite_matches_nx_on_random(spark):
    for seed in [1, 2, 3]:
        G = nx.gnp_random_graph(20, 0.1, seed=seed)
        g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes),
                                  directed=False)
        assert is_bipartite(g) == nx.is_bipartite(G), seed


def test_bipartite_color_is_proper_2_coloring(spark):
    G = nx.complete_bipartite_graph(4, 5)
    g = graph_from_edge_names(spark, list(G.edges()), directed=False)
    color = {r["id"]: r["color"] for r in bipartite_color(g).collect()}
    for r in g.edges.select("src", "dst").collect():
        assert color[r["src"]] != color[r["dst"]]


def test_bipartite_sets_requires_connected(spark):
    g = graph_from_edge_names(spark, [(0, 1), (2, 3)], directed=False)
    with pytest.raises(ValueError):
        bipartite_sets(g)


def test_bipartite_sets_partition(spark):
    G = nx.complete_bipartite_graph(3, 4)
    g = graph_from_edge_names(spark, list(G.edges()), directed=False)
    nm = names(g)
    got = bipartite_sets(g)
    side = {nm[r["id"]]: r["color"] for r in got.collect()}
    s0 = {k for k, v in side.items() if v == 0}
    s1 = {k for k, v in side.items() if v == 1}
    w0, w1 = nx.bipartite.sets(G)
    w0, w1 = {str(n) for n in w0}, {str(n) for n in w1}
    assert {frozenset(s0), frozenset(s1)} == {frozenset(w0), frozenset(w1)}


# ----------------------------------------------------- Burt constraint
def test_constraint_vs_nx(spark):
    from linkgraph.operators.structural import constraint

    G = nx.gnp_random_graph(25, 0.2, seed=4)
    G.add_node(99)  # isolated -> nan
    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes),
                              directed=False)
    nm = names(g)
    got = {nm[r["id"]]: r["constraint"] for r in constraint(g).collect()}
    want = nx.constraint(G)
    for k, v in want.items():
        if math.isnan(v):
            assert got[str(k)] is None
        else:
            assert got[str(k)] == pytest.approx(v, abs=1e-9), k


# --------------------------------------------------- square clustering
def test_square_clustering_vs_nx(spark):
    from linkgraph.operators.triangles import square_clustering

    for seed, p in [(6, 0.15), (7, 0.3)]:
        G = nx.gnp_random_graph(22, p, seed=seed)
        g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes),
                                  directed=False)
        nm = names(g)
        got = {nm[r["id"]]: r["sq_clustering"]
               for r in square_clustering(g).collect()}
        want = nx.square_clustering(G)
        for k, v in want.items():
            assert got[str(k)] == pytest.approx(v, abs=1e-9), (seed, k)


def test_square_clustering_c4(spark):
    from linkgraph.operators.triangles import square_clustering

    G = nx.cycle_graph(4)
    g = graph_from_edge_names(spark, list(G.edges()), directed=False)
    got = {r["id"]: r["sq_clustering"] for r in square_clustering(g).collect()}
    assert all(v == pytest.approx(1.0) for v in got.values())


# ------------------------------------------------------------ cut family
def test_cuts_vs_nx(spark):
    from linkgraph.operators.cuts import (
        boundary_expansion,
        conductance,
        cut_size,
        edge_expansion,
        mixing_expansion,
        node_expansion,
        normalized_cut_size,
        volume,
    )

    G = nx.gnp_random_graph(20, 0.25, seed=8)
    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes),
                              directed=False)
    inv = ids_by_name(g)
    s_names = {0, 1, 2, 3, 4, 5, 6}
    s = spark.createDataFrame([(inv[str(n)],) for n in s_names], "id long")
    S = s_names
    assert cut_size(g, s) == pytest.approx(nx.cut_size(G, S))
    assert volume(g, s) == pytest.approx(nx.volume(G, S))
    assert normalized_cut_size(g, s) == pytest.approx(
        nx.normalized_cut_size(G, S))
    assert conductance(g, s) == pytest.approx(nx.conductance(G, S))
    assert edge_expansion(g, s) == pytest.approx(nx.edge_expansion(G, S))
    assert mixing_expansion(g, s) == pytest.approx(nx.mixing_expansion(G, S))
    assert node_expansion(g, s) == pytest.approx(nx.node_expansion(G, S))
    assert boundary_expansion(g, s) == pytest.approx(
        nx.boundary_expansion(G, S))


def test_cut_size_directed_and_t(spark):
    from linkgraph.operators.cuts import cut_size

    G = nx.gnp_random_graph(15, 0.3, seed=9, directed=True)
    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes),
                              directed=True)
    inv = ids_by_name(g)
    S, T = {0, 1, 2, 3}, {5, 6, 7}
    s = spark.createDataFrame([(inv[str(n)],) for n in S], "id long")
    t = spark.createDataFrame([(inv[str(n)],) for n in T], "id long")
    assert cut_size(g, s, t) == pytest.approx(nx.cut_size(G, S, T))
    # T=None on a DIRECTED graph crashes this networkx version
    # (edge_boundary(G, None, S) inside cut_size) — compare against the
    # definition instead: both boundary directions vs the complement
    comp = set(G.nodes) - S
    want = sum(1 for u, v in G.edges if u in S and v in comp) + sum(
        1 for u, v in G.edges if u in comp and v in S
    )
    assert cut_size(g, s) == pytest.approx(want)


def test_cut_size_weighted(spark):
    from linkgraph.operators.cuts import cut_size, volume

    import random
    rng = random.Random(3)
    base = nx.gnp_random_graph(15, 0.3, seed=11)
    wedges = [(u, v, round(rng.uniform(0.5, 3.0), 2)) for u, v in base.edges()]
    G = nx.Graph()
    G.add_weighted_edges_from(wedges)
    G.add_nodes_from(base.nodes)
    g = graph_from_edge_names(spark, wedges, nodes=list(base.nodes),
                              directed=False)
    inv = ids_by_name(g)
    S = {0, 1, 2, 3, 4}
    s = spark.createDataFrame([(inv[str(n)],) for n in S], "id long")
    assert cut_size(g, s, weighted=True) == pytest.approx(
        nx.cut_size(G, S, weight="weight"))
    assert volume(g, s, weighted=True) == pytest.approx(
        nx.volume(G, S, weight="weight"))


# -------------------------------------------------- edge betweenness
def test_edge_betweenness_undirected_vs_nx(spark):
    from linkgraph.operators.centrality import edge_betweenness_centrality

    G = nx.gnp_random_graph(18, 0.2, seed=12)
    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes),
                              directed=False)
    nm = names(g)
    got = {
        tuple(sorted((nm[r["src"]], nm[r["dst"]]))): r["betweenness"]
        for r in edge_betweenness_centrality(g).collect()
    }
    want = {
        tuple(sorted((str(u), str(v)))): c
        for (u, v), c in nx.edge_betweenness_centrality(G).items()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_edge_betweenness_directed_vs_nx(spark):
    from linkgraph.operators.centrality import edge_betweenness_centrality

    G = nx.gnp_random_graph(15, 0.25, seed=14, directed=True)
    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes),
                              directed=True)
    nm = names(g)
    got = {
        (nm[r["src"]], nm[r["dst"]]): r["betweenness"]
        for r in edge_betweenness_centrality(g).collect()
    }
    want = {
        (str(u), str(v)): c
        for (u, v), c in nx.edge_betweenness_centrality(G).items()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_edge_betweenness_unnormalized_path(spark):
    from linkgraph.operators.centrality import edge_betweenness_centrality

    G = nx.path_graph(5)
    g = graph_from_edge_names(spark, list(G.edges()), directed=False)
    nm = names(g)
    got = {
        tuple(sorted((nm[r["src"]], nm[r["dst"]]))): r["betweenness"]
        for r in edge_betweenness_centrality(g, normalized=False).collect()
    }
    want = {
        tuple(sorted((str(u), str(v)))): c
        for (u, v), c in nx.edge_betweenness_centrality(
            G, normalized=False
        ).items()
    }
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


# ----------------------------------------------- numeric assortativity
@pytest.mark.parametrize("directed", [False, True])
def test_numeric_assortativity_vs_nx(spark, directed):
    from linkgraph.operators.assortativity import (
        numeric_assortativity_coefficient,
    )

    G = nx.gnp_random_graph(30, 0.15, seed=7, directed=directed)
    attr = {n: float((n * 13) % 7 + 1) for n in G.nodes}
    nx.set_node_attributes(G, attr, "size")
    g = graph_from_edge_names(spark, list(G.edges()), nodes=list(G.nodes),
                              directed=directed)
    inv = ids_by_name(g)
    adf = spark.createDataFrame(
        [(inv[str(n)], x) for n, x in attr.items()], "id long, size double"
    )
    g = type(g)(
        vertices=g.vertices.join(adf, "id"), edges=g.edges, directed=directed
    )
    got = numeric_assortativity_coefficient(g, "size")
    want = nx.numeric_assortativity_coefficient(G, "size")
    assert got == pytest.approx(want, abs=1e-9)
