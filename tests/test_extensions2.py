"""Round-2 extension operators: eigenvector centrality, reciprocity,
weighted SSSP (Bellman–Ford), topological generations, IVF ANN,
rolling-hash fingerprint / BPE pre-token counts — each checked against
the live networkx oracle or hand-computed values."""

import networkx as nx
import pytest

from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph, graph_from_edge_names
from linkgraph.operators.centrality import eigenvector_centrality
from linkgraph.operators.dag import (
    GraphContainsCycle,
    is_directed_acyclic_graph,
    topological_generations,
    topological_sort,
)
from linkgraph.operators.reciprocity import overall_reciprocity, reciprocity
from linkgraph.operators.shortest_paths import (
    NegativeCycleError,
    single_source_bellman_ford_path_length,
)

from nx_oracle import nx_graph


def names(g):
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


# ------------------------------------------------- eigenvector centrality
EV_EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (2, 5)]


def test_eigenvector_directed_vs_nx(spark):
    g = graph_from_edge_names(spark, EV_EDGES, directed=True)
    got = eigenvector_centrality(g, tol=1e-8, max_iter=500)
    nm = names(g)
    vals = {nm[r["id"]]: r["centrality"] for r in got.collect()}
    want = nx.eigenvector_centrality(
        nx_graph(EV_EDGES, directed=True), tol=1e-8, max_iter=500
    )
    for k, v in want.items():
        assert vals[str(k)] == pytest.approx(v, abs=1e-5)


def test_eigenvector_undirected_karate_style(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 0)]
    g = graph_from_edge_names(spark, edges, directed=False)
    got = eigenvector_centrality(g, tol=1e-9, max_iter=500)
    nm = names(g)
    vals = {nm[r["id"]]: r["centrality"] for r in got.collect()}
    want = nx.eigenvector_centrality(
        nx_graph(edges, directed=False), tol=1e-9, max_iter=500
    )
    for k, v in want.items():
        assert vals[str(k)] == pytest.approx(v, abs=1e-5)


def test_eigenvector_weighted(spark):
    edges = [(1, 2, 2.0), (2, 3, 1.0), (3, 1, 0.5), (1, 3, 3.0)]
    g = graph_from_edge_names(spark, edges, directed=True)
    got = eigenvector_centrality(g, tol=1e-9, max_iter=500)
    nm = names(g)
    vals = {nm[r["id"]]: r["centrality"] for r in got.collect()}
    want = nx.eigenvector_centrality(
        nx_graph(edges, directed=True), tol=1e-9, max_iter=500, weight="weight"
    )
    for k, v in want.items():
        assert vals[str(k)] == pytest.approx(v, abs=1e-5)


# ------------------------------------------------------------ reciprocity
R_EDGES = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (4, 5), (5, 5)]


def test_overall_reciprocity_vs_nx(spark):
    g = graph_from_edge_names(spark, R_EDGES, directed=True)
    want = nx.overall_reciprocity(nx_graph(R_EDGES, directed=True))
    assert overall_reciprocity(g) == pytest.approx(want)


def test_per_node_reciprocity_vs_nx(spark):
    g = graph_from_edge_names(spark, R_EDGES, directed=True)
    nm = names(g)
    got = {nm[r["id"]]: r["reciprocity"] for r in reciprocity(g).collect()}
    want = nx.reciprocity(nx_graph(R_EDGES, directed=True), nodes=[1, 2, 3, 4, 5])
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v), k


# -------------------------------------------------------- weighted SSSP
W_EDGES = [
    (1, 2, 7.0),
    (1, 3, 9.0),
    (1, 6, 14.0),
    (2, 3, 10.0),
    (2, 4, 15.0),
    (3, 4, 11.0),
    (3, 6, 2.0),
    (4, 5, 6.0),
    (5, 6, 9.0),
]


def _dist_by_name(g, df):
    nm = names(g)
    return {nm[r["id"]]: r["dist"] for r in df.collect()}


def test_sssp_undirected_dijkstra_graph(spark):
    g = graph_from_edge_names(spark, W_EDGES, directed=False)
    src = next(i for i, n in names(g).items() if n == "1")
    got = _dist_by_name(g, single_source_bellman_ford_path_length(g, src))
    want = nx.single_source_dijkstra_path_length(
        nx_graph(W_EDGES, directed=False), 1
    )
    assert got == {str(k): pytest.approx(v) for k, v in want.items()}


def test_sssp_directed_unreachable_absent(spark):
    edges = [(1, 2, 3.0), (2, 3, 4.0), (4, 1, 1.0)]
    g = graph_from_edge_names(spark, edges, directed=True)
    src = next(i for i, n in names(g).items() if n == "1")
    got = _dist_by_name(g, single_source_bellman_ford_path_length(g, src))
    assert got == {"1": 0.0, "2": 3.0, "3": 7.0}  # node 4 absent


def test_sssp_negative_edge_ok_negative_cycle_raises(spark):
    edges = [(1, 2, 5.0), (2, 3, -2.0), (1, 3, 4.0)]
    g = graph_from_edge_names(spark, edges, directed=True)
    src = next(i for i, n in names(g).items() if n == "1")
    got = _dist_by_name(g, single_source_bellman_ford_path_length(g, src))
    assert got["3"] == pytest.approx(3.0)

    cyc = [(1, 2, 1.0), (2, 3, -5.0), (3, 2, 1.0)]
    gc = graph_from_edge_names(spark, cyc, directed=True)
    src = next(i for i, n in names(gc).items() if n == "1")
    with pytest.raises(NegativeCycleError):
        single_source_bellman_ford_path_length(gc, src)


# ------------------------------------------------- topological generations
DAG_EDGES = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (6, 5)]


def test_topo_generations_vs_nx(spark):
    g = graph_from_edge_names(spark, DAG_EDGES, directed=True)
    nm = names(g)
    got = {
        nm[r["id"]]: r["generation"]
        for r in topological_generations(g).collect()
    }
    want = {}
    for gen, layer in enumerate(
        nx.topological_generations(nx_graph(DAG_EDGES, directed=True))
    ):
        for v in layer:
            want[str(v)] = gen
    assert got == want


def test_topo_sort_is_valid_order(spark):
    g = graph_from_edge_names(spark, DAG_EDGES, directed=True)
    order = {r["id"]: r["topo_rank"] for r in topological_sort(g).collect()}
    for r in g.edges.collect():
        assert order[r["src"]] < order[r["dst"]]


def test_cycle_detection(spark):
    g = graph_from_edge_names(spark, [(1, 2), (2, 3), (3, 1)], directed=True)
    assert not is_directed_acyclic_graph(g)
    with pytest.raises(GraphContainsCycle):
        topological_generations(g)
    h = graph_from_edge_names(spark, [(1, 1)], directed=True)
    assert not is_directed_acyclic_graph(h)
    d = graph_from_edge_names(spark, DAG_EDGES, directed=True)
    assert is_directed_acyclic_graph(d)


# ------------------------------------------------------------------ IVF ANN
def test_ivf_topk_matches_bruteforce_on_probed_cells(spark):
    from linkgraph.functions import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 4)
    got = sim.ivf_topk(
        emb, queries, k=5, n_centroids=4, kmeans_iters=2, nprobe=4
    )
    # nprobe == n_centroids → IVF degenerates to exact brute force
    want = sim.cosine_topk(emb, queries, k=5)
    g = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in got.collect()}
    w = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in want.collect()}
    assert g == w


def test_kmeans_fit_deterministic(spark):
    from linkgraph.functions.similarity import kmeans_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = kmeans_fit(emb, n_centroids=4, iters=2)
    b = kmeans_fit(emb, n_centroids=4, iters=2)
    assert a == b


# --------------------------------------------- text fingerprints / tokens
def test_rolling_fingerprint_order_sensitive(spark):
    from linkgraph.functions.textops import rolling_fingerprint

    df = spark.createDataFrame(
        [("a b c",), ("c b a",), ("a b c",), ("",)], "text string"
    ).select(rolling_fingerprint(F.col("text")).alias("fp"))
    fps = [r["fp"] for r in df.collect()]
    assert fps[0] == fps[2]
    assert fps[0] != fps[1]  # order matters
    assert fps[3] == 0


def test_bpe_token_count_shapes(spark):
    from linkgraph.functions.textops import bpe_token_count

    df = spark.createDataFrame(
        [("Hello, world! 42",), ("",), ("a.b",)], "text string"
    ).select(bpe_token_count(F.col("text")).alias("n"))
    # Hello , world ! 4 2 -> 6 ; "" -> 0 ; a . b -> 3
    assert [r["n"] for r in df.collect()] == [6, 0, 3]


# ------------------------------------------------- betweenness centrality
BC_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5)]


def test_betweenness_undirected_vs_nx(spark):
    from linkgraph.operators.centrality import betweenness_centrality

    g = graph_from_edge_names(spark, BC_EDGES, directed=False)
    nm = names(g)
    got = {
        nm[r["id"]]: r["betweenness"]
        for r in betweenness_centrality(g).collect()
    }
    want = nx.betweenness_centrality(nx_graph(BC_EDGES, directed=False))
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-9), k


def test_betweenness_directed_unnormalized_vs_nx(spark):
    from linkgraph.operators.centrality import betweenness_centrality

    edges = [(0, 1), (1, 2), (2, 0), (1, 3), (3, 4), (0, 4)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = names(g)
    got = {
        nm[r["id"]]: r["betweenness"]
        for r in betweenness_centrality(g, normalized=False).collect()
    }
    want = nx.betweenness_centrality(
        nx_graph(edges, directed=True), normalized=False
    )
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-9), k


def test_betweenness_sampled_sources_exactness(spark):
    """sources=[all] must equal the default full run."""
    from linkgraph.operators.centrality import betweenness_centrality

    g = graph_from_edge_names(spark, BC_EDGES, directed=False)
    all_ids = [r["id"] for r in g.vertices.collect()]
    a = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(g, sources=all_ids).collect()
    }
    b = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(g).collect()
    }
    assert a == pytest.approx(b)


# ------------------------------------------------ descendants / ancestors
def test_descendants_ancestors_vs_nx(spark):
    from linkgraph.operators.traversal import ancestors, descendants

    edges = [(1, 2), (2, 3), (4, 2), (3, 5)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = names(g)
    rev = {v: k for k, v in nm.items()}
    got_d = {nm[r["id"]] for r in descendants(g, rev["2"]).collect()}
    got_a = {nm[r["id"]] for r in ancestors(g, rev["2"]).collect()}
    G = nx_graph(edges, directed=True)
    assert got_d == {str(x) for x in nx.descendants(G, 2)}
    assert got_a == {str(x) for x in nx.ancestors(G, 2)}


# --------------------------------------------- closeness / harmonic point
def test_closeness_harmonic_vs_nx(spark):
    from linkgraph.operators.centrality import (
        closeness_centrality,
        harmonic_centrality,
    )

    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (5, 1)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = names(g)
    rev = {v: k for k, v in nm.items()}
    G = nx_graph(edges, directed=True)
    for node in ["1", "4"]:
        assert closeness_centrality(g, rev[node]) == pytest.approx(
            nx.closeness_centrality(G, int(node))
        ), node
        assert harmonic_centrality(g, rev[node]) == pytest.approx(
            nx.harmonic_centrality(G, nbunch=[int(node)])[int(node)]
        ), node


# ------------------------------------------------------------- k-truss
def test_ktruss_vs_nx(spark):
    from linkgraph.operators.core import k_truss

    # two 4-cliques sharing a vertex, plus a pendant path
    edges = []
    for block in ([0, 1, 2, 3], [3, 4, 5, 6]):
        for i, a in enumerate(block):
            for b in block[i + 1:]:
                edges.append((a, b))
    edges += [(6, 7), (7, 8)]
    g = graph_from_edge_names(spark, edges, directed=False)
    nm = names(g)
    got = {
        frozenset((nm[r["src"]], nm[r["dst"]]))
        for r in k_truss(g, k=4).edges.collect()
    }
    H = nx.k_truss(nx_graph(edges, directed=False), 4)
    want = {frozenset((str(u), str(v))) for u, v in H.edges()}
    assert got == want
    # k high enough to erase everything
    assert k_truss(g, k=5).edges.count() == 0
    with pytest.raises(ValueError):
        k_truss(g, k=1)


# ------------------------------------------------------ quotient graph
def test_quotient_graph_vs_nx(spark):
    from linkgraph.operators.minors import quotient_graph

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (4, 0)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = names(g)
    blocks = {"0": 0, "1": 0, "2": 1, "3": 1, "4": 2}
    part = spark.createDataFrame(
        [(i, blocks[n]) for i, n in nm.items()], "id long, block long"
    )
    q = quotient_graph(g, part)
    got = {(r["src"], r["dst"]): r["weight"] for r in q.edges.collect()}
    G = nx_graph(edges, directed=True)
    Q = nx.quotient_graph(
        G, [{0, 1}, {2, 3}, {4}]
    )
    # nx block nodes are frozensets; map to our block ids
    bid = {frozenset({0, 1}): 0, frozenset({2, 3}): 1, frozenset({4}): 2}
    want_edges = {(bid[u], bid[v]) for u, v in Q.edges()}
    assert set(got) == want_edges
    # weights are cross-edge counts: 1->2 and 3->0 and 1->3? (1,3) is
    # intra-block? no: 1 in block0, 3 in block1 -> crossing
    assert got[(0, 1)] == 2.0  # edges (1,2) and (1,3)
    assert got[(1, 0)] == 1.0  # edge (3,0)
    assert got[(2, 0)] == 1.0  # edge (4,0)


# ------------------------------------------------- bipartite projection
def test_weighted_projection_vs_nx(spark):
    from networkx.algorithms import bipartite as nxb

    from linkgraph.operators.bipartite import weighted_projected_graph

    membership = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "b"), (3, "c")]
    df = spark.createDataFrame(membership, "u long, v string")
    got = {
        (r["u1"], r["u2"]): r["weight"]
        for r in weighted_projected_graph(df, "u", "v").collect()
    }
    B = nx.Graph()
    B.add_nodes_from([1, 2, 3], bipartite=0)
    B.add_nodes_from(["a", "b", "c"], bipartite=1)
    B.add_edges_from(membership)
    P = nxb.weighted_projected_graph(B, [1, 2, 3])
    want = {
        (min(u, v), max(u, v)): d["weight"] for u, v, d in P.edges(data=True)
    }
    assert got == want


# ------------------------------------------------ average neighbor degree
def test_average_neighbor_degree_vs_nx(spark):
    from linkgraph.operators.assortativity import average_neighbor_degree

    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)]
    g = graph_from_edge_names(spark, edges, directed=False)
    nm = names(g)
    got = {
        nm[r["id"]]: r["avg_nbr_degree"]
        for r in average_neighbor_degree(g).collect()
    }
    want = nx.average_neighbor_degree(nx_graph(edges, directed=False))
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v), k

    gd = graph_from_edge_names(spark, [(0, 1), (1, 2), (0, 2), (2, 0)], directed=True)
    nmd = names(gd)
    gotd = {
        nmd[r["id"]]: r["avg_nbr_degree"]
        for r in average_neighbor_degree(gd).collect()
    }
    wantd = nx.average_neighbor_degree(
        nx_graph([(0, 1), (1, 2), (0, 2), (2, 0)], directed=True),
        source="out", target="out",
    )
    for k, v in wantd.items():
        assert gotd[str(k)] == pytest.approx(v), k


# -------------------------------- batched multi-source BFS / sampled centrality
def test_multi_source_bfs_vs_nx(spark):
    from linkgraph.operators.traversal import multi_source_bfs_layers

    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (5, 1), (4, 6)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = names(g)
    rev = {v: k for k, v in nm.items()}
    srcs = [rev["1"], rev["5"], rev["3"]]
    got = {
        (nm[r["source"]], nm[r["id"]]): r["layer"]
        for r in multi_source_bfs_layers(g, srcs).collect()
    }
    G = nx_graph(edges, directed=True)
    want = {}
    for s in [1, 5, 3]:
        for v, d in nx.single_source_shortest_path_length(G, s).items():
            want[(str(s), str(v))] = d
    assert got == want


def test_sampled_closeness_harmonic_exact_when_all_sources(spark):
    from linkgraph.operators.centrality import sampled_closeness_harmonic

    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (5, 1), (4, 6)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = names(g)
    all_ids = [r["id"] for r in g.vertices.collect()]
    rows = {nm[r["id"]]: r for r in sampled_closeness_harmonic(g, all_ids).collect()}
    G = nx_graph(edges, directed=True)
    want_h = nx.harmonic_centrality(G)
    for k, v in want_h.items():
        assert rows[str(k)]["harmonic_sum"] == pytest.approx(v), k
    # dist_sum/n_reached reproduce exact closeness when S = V
    n = len(all_ids)
    for k in want_h:
        r = rows[str(k)]
        want_c = nx.closeness_centrality(G, int(k))
        got_c = (
            0.0
            if r["n_reached"] == 0 or r["dist_sum"] == 0
            else (r["n_reached"] / r["dist_sum"]) * (r["n_reached"] / (n - 1))
        )
        assert got_c == pytest.approx(want_c), k


def test_katz_centrality_vs_nx(spark):
    from linkgraph.operators.centrality import katz_centrality

    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (5, 1), (4, 6), (6, 2)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = names(g)
    got = {
        nm[r["id"]]: r["centrality"]
        for r in katz_centrality(g, alpha=0.1, tol=1e-10).collect()
    }
    G = nx_graph(edges, directed=True)
    want = nx.katz_centrality(G, alpha=0.1, tol=1e-10)
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-6), k


def test_katz_centrality_undirected_vs_nx(spark):
    from linkgraph.operators.centrality import katz_centrality

    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (4, 5)]
    g = graph_from_edge_names(spark, edges, directed=False)
    nm = names(g)
    got = {
        nm[r["id"]]: r["centrality"]
        for r in katz_centrality(g, alpha=0.05, beta=0.3, tol=1e-10).collect()
    }
    G = nx_graph(edges, directed=False)
    want = nx.katz_centrality(G, alpha=0.05, beta=0.3, tol=1e-10)
    for k, v in want.items():
        assert got[str(k)] == pytest.approx(v, abs=1e-6), k


# ------------------------------------------------------ deterministic walks
def test_random_walks_match_python_replay(spark):
    from linkgraph.operators.walks import random_walks, _A, _B, _C, _MIX_MOD

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (4, 1), (4, 2), (5, 1)]
    g = graph_from_edge_names(spark, edges, directed=True)
    nm = names(g)
    rev = {v: int(k) for k, v in nm.items()}
    adj = {}
    for a, b in edges:
        adj.setdefault(rev[str(a)], set()).add(rev[str(b)])

    L, seed = 6, 7
    got = {}
    for r in random_walks(g, walk_length=L, seed=seed).collect():
        got.setdefault(r["walk"], {})[r["step"]] = r["node"]

    for start in [rev[str(i)] for i in range(1, 6)]:
        cur, path = start, [start]
        for step in range(1, L + 1):
            nbrs = sorted(adj.get(cur, ()))
            if not nbrs:
                break
            mix = _A * (cur % _MIX_MOD) + _B * (start % _MIX_MOD) + _C * step + seed
            cur = nbrs[mix % len(nbrs)]
            path.append(cur)
        assert got[start] == dict(enumerate(path)), nm[start]


def test_random_walks_replicas_and_starts(spark):
    from linkgraph.operators.walks import random_walks

    edges = [(1, 2), (2, 1), (2, 3), (3, 2)]
    g = graph_from_edge_names(spark, edges, directed=True)
    some = g.vertices.limit(2).select("id")
    w = random_walks(g, walk_length=3, walks_per_node=2, starts=some)
    walks = {r["walk"] for r in w.collect()}
    ids = [r["id"] for r in some.collect()]
    assert walks == {i * 2 for i in ids} | {i * 2 + 1 for i in ids}
    # every walk visits step 0..3 (no dead ends in this cycle graph)
    steps = w.groupBy("walk").count().collect()
    assert all(r["count"] == 4 for r in steps)


# ------------------------------------------------------ distance measures
def test_eccentricity_and_summary_vs_nx(spark):
    from linkgraph.operators.distance_measures import (
        distance_summary_sampled,
        eccentricity_sampled,
    )

    # connected undirected graph -> exact parity with nx when S = V
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 5), (5, 6)]
    g = graph_from_edge_names(spark, edges, directed=False)
    nm = names(g)
    all_ids = [r["id"] for r in g.vertices.collect()]
    got = {
        nm[r["source"]]: r["ecc"]
        for r in eccentricity_sampled(g, all_ids).collect()
    }
    G = nx_graph(edges, directed=False)
    want = nx.eccentricity(G)
    assert got == {str(k): v for k, v in want.items()}

    row = distance_summary_sampled(g, all_ids).collect()[0]
    assert row["diameter_lb"] == nx.diameter(G)
    assert row["radius_ub"] == nx.radius(G)
    assert row["global_efficiency"] == pytest.approx(nx.global_efficiency(G))


# ------------------------------------------------------ maximal independent set
def test_maximal_independent_set_invariants(spark):
    from linkgraph.operators.independent_set import maximal_independent_set

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (2, 5), (3, 6), (6, 7)]
    g = graph_from_edge_names(spark, edges, directed=False)
    nm = names(g)
    rows = {nm[r["id"]]: r["in_mis"] for r in maximal_independent_set(g).collect()}
    assert len(rows) == 7
    mis = {k for k, v in rows.items() if v}
    assert mis  # non-empty
    adj = {}
    for a, b in edges:
        adj.setdefault(str(a), set()).add(str(b))
        adj.setdefault(str(b), set()).add(str(a))
    # independence: no two MIS members adjacent
    for v in mis:
        assert not (adj[v] & mis), v
    # maximality: every excluded vertex has a MIS neighbor
    for v in set(rows) - mis:
        assert adj[v] & mis, v


def test_maximal_independent_set_seed_changes_set(spark):
    from linkgraph.operators.independent_set import maximal_independent_set

    edges = [(i, i + 1) for i in range(1, 12)]
    g = graph_from_edge_names(spark, edges, directed=False)
    a = {(r["id"], r["in_mis"]) for r in maximal_independent_set(g, seed=0).collect()}
    b = {(r["id"], r["in_mis"]) for r in maximal_independent_set(g, seed=0).collect()}
    assert a == b  # deterministic for a fixed seed
