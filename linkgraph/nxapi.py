"""NetworkX-compatible facade: reference signatures over the engine.

The reference exposes a backend seam (``@nx._dispatchable``,
networkx/utils/backends.py:215) through which third-party engines
serve the same function signatures; this module is that surface for
the linkgraph engine — nx-shaped inputs (edge iterables / node names)
and nx-shaped outputs (dicts, sets, ints) with all computation in
Spark. It exists for API parity and ported-test readability; heavy
pipelines should use the DataFrame operators directly (these helpers
collect results to the driver, which is a test-scale boundary by
design — SURVEY.md §1.4 "per-node score dicts").
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .graph import LinkGraph, graph_from_edge_names
from .operators import triangles as tri
from .operators.components import connected_components as _cc
from .operators.hits import hits as _hits
from .operators.label_propagation import label_propagation_communities as _lpa
from .operators.pagerank import pagerank as _pagerank


def _as_graph(spark: SparkSession, edges, nodes=(), directed=False) -> LinkGraph:
    return graph_from_edge_names(spark, list(edges), list(nodes), directed=directed)


def _name_map(g: LinkGraph) -> dict[int, str]:
    return {r["id"]: r["url"].rsplit("/", 1)[-1] for r in g.vertices.collect()}


def pagerank(
    spark: SparkSession,
    edges: Iterable,
    nodes: Iterable = (),
    directed: bool = True,
    alpha: float = 0.85,
    personalization: dict | None = None,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    nstart: dict | None = None,
    weight: str | None = "weight",
    dangling: dict | None = None,
) -> dict:
    """``nx.pagerank`` signature (pagerank_alg.py:12-110) -> {name: rank}.
    Name-keyed dict vectors are translated to id-keyed internally."""
    g = _as_graph(spark, edges, nodes, directed)
    nm = _name_map(g)
    rev = {v: k for k, v in nm.items()}

    def to_ids(d):
        return None if d is None else {rev[str(k)]: v for k, v in d.items()}

    ranks = _pagerank(
        g,
        alpha=alpha,
        personalization=to_ids(personalization),
        max_iter=max_iter,
        tol=tol,
        nstart=to_ids(nstart),
        # nx takes an attr name ("weight") or None; the engine keeps
        # weight a typed column, so this reduces to use-it-or-not
        weight=weight is not None,
        dangling=to_ids(dangling),
    )
    return {nm[r["id"]]: r["rank"] for r in ranks.collect()}


def connected_components(
    spark: SparkSession, edges: Iterable, nodes: Iterable = ()
) -> list[set]:
    """``nx.connected_components`` (connected.py:17-90) -> list of
    name-sets, largest first (the reference's common sorted idiom)."""
    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    comps: dict[int, set] = {}
    for r in _cc(g).collect():
        comps.setdefault(r["component"], set()).add(nm[r["id"]])
    return sorted(comps.values(), key=len, reverse=True)


def number_connected_components(spark, edges, nodes=()) -> int:
    return len(connected_components(spark, edges, nodes))


def label_propagation_communities(spark, edges, nodes=()) -> list[set]:
    """``nx.community.label_propagation_communities``
    (label_propagation.py:238-279) -> communities as name-sets."""
    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    comms: dict[int, set] = {}
    for r in _lpa(g).collect():
        comms.setdefault(r["label"], set()).add(nm[r["id"]])
    return list(comms.values())


def louvain_communities(spark, edges, nodes=()) -> list[set]:
    """``nx.community.louvain_communities``
    (networkx/algorithms/community/louvain.py:21) -> communities as
    name-sets (any greedy-modularity local optimum is valid output;
    this engine's schedule is deterministic, the reference's is
    seeded-random)."""
    from .operators.louvain import louvain_communities as _louvain

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    comms: dict[int, set] = {}
    for r in _louvain(g).collect():
        comms.setdefault(r["community"], set()).add(nm[r["id"]])
    return list(comms.values())


def greedy_modularity_communities(
    spark, edges, nodes=(), resolution=1.0, cutoff=1, best_n=None
) -> list:
    """``nx.community.greedy_modularity_communities``
    (networkx/algorithms/community/modularity_max.py) -> list of
    name-sets, sorted largest-first (reference output order). Exact
    CNM semantics including the smallest-(u, v) tie-break, so the
    karate partition matches the reference verbatim
    (tests/test_louvain.py); at engine scale the documented redirect
    is ``louvain_communities`` (same objective, parallel schedule)."""
    from .operators.louvain import greedy_modularity_communities as _gmc

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    comms: dict[int, set] = {}
    for r in _gmc(g, resolution=resolution, cutoff=cutoff, best_n=best_n).collect():
        comms.setdefault(r["community"], set()).add(nm[r["id"]])
    return sorted(comms.values(), key=len, reverse=True)


def triangles(spark, edges, nodes=(), nbunch=None) -> dict | int:
    """``nx.triangles`` (cluster.py:25-97): full dict, or a single
    count when ``nbunch`` is one node name."""
    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    out = {nm[r["id"]]: r["triangles"] for r in tri.triangles(g).collect()}
    if nbunch is not None and not isinstance(nbunch, (list, set, tuple)):
        return out[str(nbunch)]
    if nbunch is not None:
        return {str(n): out[str(n)] for n in nbunch}
    return out


def transitivity(spark, edges, nodes=()) -> float:
    g = _as_graph(spark, edges, nodes, directed=False)
    return tri.transitivity(g)


def clustering(spark, edges, nodes=()) -> dict:
    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {nm[r["id"]]: r["clustering"] for r in tri.clustering(g).collect()}


def degree_assortativity_coefficient(
    spark, edges, nodes=(), directed: bool = False
) -> float:
    """``nx.degree_assortativity_coefficient`` (assortativity/
    correlation.py:15)."""
    from .operators.assortativity import degree_assortativity_coefficient as _dac

    return _dac(_as_graph(spark, edges, nodes, directed))


def common_neighbors(spark, edges, u, v, nodes=()) -> set:
    """``nx.common_neighbors`` (function.py:1064) -> set of names."""
    from .operators.links import common_neighbors as _cn

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    rev = {n: i for i, n in nm.items()}
    return {nm[r["id"]] for r in _cn(g, rev[str(u)], rev[str(v)]).collect()}


def jaccard_coefficient(spark, edges, nodes=()) -> list[tuple]:
    """``nx.jaccard_coefficient`` over all wedge pairs ->
    [(u, v, p), ...] (link_prediction.py:217)."""
    from .operators.links import jaccard_coefficient as _jc

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return [
        (nm[r["u"]], nm[r["v"]], r["jaccard"]) for r in _jc(g).collect()
    ]


def hits(
    spark, edges, nodes=(), directed: bool = True,
    max_iter: int = 100, tol: float = 1.0e-8, normalized: bool = True,
) -> tuple[dict, dict]:
    """``nx.hits`` signature -> ({name: hub}, {name: authority})."""
    g = _as_graph(spark, edges, nodes, directed)
    nm = _name_map(g)
    rows = _hits(g, max_iter=max_iter, tol=tol, normalized=normalized).collect()
    return (
        {nm[r["id"]]: r["hub"] for r in rows},
        {nm[r["id"]]: r["authority"] for r in rows},
    )


def eigenvector_centrality(
    spark, edges, nodes=(), directed: bool = True,
    max_iter: int = 100, tol: float = 1.0e-6,
) -> dict:
    """``nx.eigenvector_centrality`` signature -> {name: centrality}
    (centrality/eigenvector.py:18)."""
    from .operators.centrality import eigenvector_centrality as _ev

    g = _as_graph(spark, edges, nodes, directed)
    nm = _name_map(g)
    return {
        nm[r["id"]]: r["centrality"]
        for r in _ev(g, max_iter=max_iter, tol=tol).collect()
    }


def overall_reciprocity(spark, edges, nodes=()) -> float:
    """``nx.overall_reciprocity`` (reciprocity.py:121)."""
    from .operators.reciprocity import overall_reciprocity as _orec

    return _orec(_as_graph(spark, edges, nodes, directed=True))


def reciprocity(spark, edges, nodes=()) -> dict:
    """``nx.reciprocity`` per node -> {name: r} (reciprocity.py:13);
    isolated nodes absent instead of raising."""
    from .operators.reciprocity import reciprocity as _rec

    g = _as_graph(spark, edges, nodes, directed=True)
    nm = _name_map(g)
    return {nm[r["id"]]: r["reciprocity"] for r in _rec(g).collect()}


def single_source_dijkstra_path_length(
    spark, edges, source, nodes=(), directed: bool = False
) -> dict:
    """``nx.single_source_dijkstra_path_length`` -> {name: dist}
    (shortest_paths/weighted.py:733)."""
    from .operators.shortest_paths import (
        single_source_bellman_ford_path_length as _bf,
    )

    g = _as_graph(spark, edges, nodes, directed)
    nm = _name_map(g)
    rev = {n: i for i, n in nm.items()}
    return {
        nm[r["id"]]: r["dist"]
        for r in _bf(g, rev[str(source)]).collect()
    }


def topological_generations(spark, edges, nodes=()) -> list[list]:
    """``nx.topological_generations`` -> [[names]] sorted by name
    within each generation (dag.py:282)."""
    from .operators.dag import topological_generations as _tg

    g = _as_graph(spark, edges, nodes, directed=True)
    nm = _name_map(g)
    rows = _tg(g).collect()
    ngen = max((r["generation"] for r in rows), default=-1) + 1
    out = [[] for _ in range(ngen)]
    for r in rows:
        out[r["generation"]].append(nm[r["id"]])
    return [sorted(layer) for layer in out]


def is_directed_acyclic_graph(spark, edges, nodes=()) -> bool:
    """``nx.is_directed_acyclic_graph`` (dag.py:123)."""
    from .operators.dag import is_directed_acyclic_graph as _dag

    return _dag(_as_graph(spark, edges, nodes, directed=True))


def betweenness_centrality(
    spark, edges, nodes=(), directed: bool = False,
    k: int | None = None, normalized: bool = True,
) -> dict:
    """``nx.betweenness_centrality`` -> {name: bc}
    (centrality/betweenness.py:13)."""
    from .operators.centrality import betweenness_centrality as _bc

    g = _as_graph(spark, edges, nodes, directed)
    nm = _name_map(g)
    return {
        nm[r["id"]]: r["betweenness"]
        for r in _bc(g, k=k, normalized=normalized).collect()
    }


def closeness_centrality(spark, edges, u, nodes=(), directed: bool = False) -> float:
    """``nx.closeness_centrality(G, u)`` (centrality/closeness.py:20)."""
    from .operators.centrality import closeness_centrality as _cl

    g = _as_graph(spark, edges, nodes, directed)
    rev = {n: i for i, n in _name_map(g).items()}
    return _cl(g, rev[str(u)])


def descendants(spark, edges, source, nodes=()) -> set:
    """``nx.descendants`` (dag.py:42)."""
    from .operators.traversal import descendants as _d

    g = _as_graph(spark, edges, nodes, directed=True)
    nm = _name_map(g)
    rev = {n: i for i, n in nm.items()}
    return {nm[r["id"]] for r in _d(g, rev[str(source)]).collect()}


def ancestors(spark, edges, source, nodes=()) -> set:
    """``nx.ancestors`` (dag.py:72)."""
    from .operators.traversal import ancestors as _a

    g = _as_graph(spark, edges, nodes, directed=True)
    nm = _name_map(g)
    rev = {n: i for i, n in nm.items()}
    return {nm[r["id"]] for r in _a(g, rev[str(source)]).collect()}


def maximal_matching(spark, edges, nodes=()) -> set:
    """``nx.maximal_matching`` (matching.py:19) — a valid maximal
    matching (the greedy scan order differs: hashed-priority rounds)."""
    from .operators.matching import maximal_matching as _mm

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {(nm[r["src"]], nm[r["dst"]]) for r in _mm(g).collect()}


def min_weighted_vertex_cover(spark, edges, nodes=()) -> set:
    """``nx.approximation.min_weighted_vertex_cover``
    (approximation/vertex_cover.py:13), unit weights — endpoints of a
    maximal matching (2-approximation)."""
    from .operators.matching import vertex_cover_approx as _vc

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {nm[r["id"]] for r in _vc(g).collect() if r["in_cover"]}


def dominating_set(spark, edges, nodes=()) -> set:
    """``nx.dominating_set`` (dominating.py:14) — a valid dominating
    set (grown from Luby MIS rather than a sequential frontier)."""
    from .operators.independent_set import dominating_set as _ds

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {nm[r["id"]] for r in _ds(g).collect() if r["in_set"]}


def local_bridges(spark, edges, nodes=()) -> set:
    """``nx.local_bridges(G, with_span=False)`` (bridges.py:130)."""
    from .operators.structural import local_bridges as _lb

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {
        tuple(sorted((nm[r["src"]], nm[r["dst"]]))) for r in _lb(g).collect()
    }


def s_metric(spark, edges, nodes=()) -> float:
    """``nx.s_metric`` (smetric.py:5, unnormalized)."""
    from .operators.structural import s_metric as _sm

    g = _as_graph(spark, edges, nodes, directed=False)
    return float(_sm(g).collect()[0]["s_metric"])


def rich_club_coefficient(spark, edges, nodes=()) -> dict:
    """``nx.rich_club_coefficient(G, normalized=False)``
    (richclub.py:10)."""
    from .operators.structural import rich_club_coefficient as _rc

    g = _as_graph(spark, edges, nodes, directed=False)
    return {r["k"]: r["phi"] for r in _rc(g).collect()}


def wiener_index(spark, edges, nodes=()) -> float:
    """``nx.wiener_index`` (wiener.py:12) — exact when run with
    S = V (which this facade does); the operator form
    (``wiener_index_sampled``) takes a pivot sample at scale."""
    from .operators.distance_measures import wiener_index_sampled as _w

    g = _as_graph(spark, edges, nodes, directed=False)
    return float(
        _w(g, g.vertices.select("id")).collect()[0]["wiener_est"]
    )


def k_shell(spark, edges, k=None, nodes=()) -> set:
    """``nx.k_shell(G, k)`` node set (core.py k_shell)."""
    from .operators.core import k_shell as _ks

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {nm[r["id"]] for r in _ks(g, k).vertices.select("id").collect()}


def k_crust(spark, edges, k=None, nodes=()) -> set:
    """``nx.k_crust(G, k)`` node set (core.py k_crust)."""
    from .operators.core import k_crust as _kc

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {nm[r["id"]] for r in _kc(g, k).vertices.select("id").collect()}


def k_corona(spark, edges, k, nodes=()) -> set:
    """``nx.k_corona(G, k)`` node set (core.py k_corona)."""
    from .operators.core import k_corona as _kc

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {nm[r["id"]] for r in _kc(g, k).vertices.select("id").collect()}


def onion_layers(spark, edges, nodes=()) -> dict:
    """``nx.onion_layers(G)`` (core.py onion_layers)."""
    from .operators.core import onion_layers as _ol

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {nm[r["id"]]: r["layer"] for r in _ol(g).collect()}


def node_boundary(spark, edges, nbunch1, nbunch2=None, nodes=()) -> set:
    """``nx.node_boundary`` (boundary.py:122)."""
    from .operators.boundary import node_boundary as _nb

    g = _as_graph(spark, edges, nodes, directed=False)
    inv = {v: k for k, v in _name_map(g).items()}
    s = spark.createDataFrame([(inv[str(n)],) for n in nbunch1], "id long")
    t = (
        spark.createDataFrame([(inv[str(n)],) for n in nbunch2], "id long")
        if nbunch2 is not None
        else None
    )
    nm = _name_map(g)
    return {nm[r["id"]] for r in _nb(g, s, t).collect()}


def edge_boundary(spark, edges, nbunch1, nbunch2=None, nodes=()) -> set:
    """``nx.edge_boundary`` (boundary.py:25); undirected edges are
    returned as canonical sorted tuples."""
    from .operators.boundary import edge_boundary as _eb

    g = _as_graph(spark, edges, nodes, directed=False)
    inv = {v: k for k, v in _name_map(g).items()}
    s = spark.createDataFrame([(inv[str(n)],) for n in nbunch1], "id long")
    t = (
        spark.createDataFrame([(inv[str(n)],) for n in nbunch2], "id long")
        if nbunch2 is not None
        else None
    )
    nm = _name_map(g)
    return {
        tuple(sorted((nm[r["src"]], nm[r["dst"]])))
        for r in _eb(g, s, t).collect()
    }


def average_degree_connectivity(spark, edges, nodes=()) -> dict:
    """``nx.average_degree_connectivity`` (connectivity.py:12)."""
    from .operators.assortativity import average_degree_connectivity as _adc

    g = _as_graph(spark, edges, nodes, directed=False)
    return {
        r["degree"]: r["avg_connectivity"] for r in _adc(g).collect()
    }


def effective_size(spark, edges, nodes=()) -> dict:
    """``nx.effective_size`` (structuralholes.py), unweighted
    undirected form; isolated nodes map to None (reference: nan)."""
    from .operators.structural import effective_size as _es

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {nm[r["id"]]: r["effective_size"] for r in _es(g).collect()}


def degree_centrality(spark, edges, nodes=()) -> dict:
    """``nx.degree_centrality`` (degree_alg.py:10)."""
    from .operators.structural import degree_centrality as _dc

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {nm[r["id"]]: r["centrality"] for r in _dc(g).collect()}


def is_bipartite(spark, edges, nodes=()) -> bool:
    """``nx.is_bipartite`` (bipartite/basic.py:9)."""
    from .operators.bipartite import is_bipartite as _ib

    g = _as_graph(spark, edges, nodes, directed=False)
    return _ib(g)


def _nbunch(spark, g, nb):
    inv = {v: k for k, v in _name_map(g).items()}
    return spark.createDataFrame([(inv[str(n)],) for n in nb], "id long")


def cut_size(spark, edges, S, T=None, nodes=(), directed=False) -> float:
    """``nx.cut_size`` (cuts.py:17)."""
    from .operators.cuts import cut_size as _cs

    g = _as_graph(spark, edges, nodes, directed=directed)
    t = _nbunch(spark, g, T) if T is not None else None
    return _cs(g, _nbunch(spark, g, S), t)


def volume(spark, edges, S, nodes=(), directed=False) -> float:
    """``nx.volume`` (cuts.py:79)."""
    from .operators.cuts import volume as _v

    g = _as_graph(spark, edges, nodes, directed=directed)
    return _v(g, _nbunch(spark, g, S))


def conductance(spark, edges, S, T=None, nodes=(), directed=False) -> float:
    """``nx.conductance`` (cuts.py:183)."""
    from .operators.cuts import conductance as _c

    g = _as_graph(spark, edges, nodes, directed=directed)
    t = _nbunch(spark, g, T) if T is not None else None
    return _c(g, _nbunch(spark, g, S), t)


def normalized_cut_size(spark, edges, S, T=None, nodes=(), directed=False) -> float:
    """``nx.normalized_cut_size`` (cuts.py:125)."""
    from .operators.cuts import normalized_cut_size as _n

    g = _as_graph(spark, edges, nodes, directed=directed)
    t = _nbunch(spark, g, T) if T is not None else None
    return _n(g, _nbunch(spark, g, S), t)


def constraint(spark, edges, nodes=()) -> dict:
    """``nx.constraint`` (structuralholes.py), unweighted undirected
    form; isolated nodes map to None (reference: nan)."""
    from .operators.structural import constraint as _c

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {nm[r["id"]]: r["constraint"] for r in _c(g).collect()}


def square_clustering(spark, edges, nodes=()) -> dict:
    """``nx.square_clustering`` (cluster.py)."""
    from .operators.triangles import square_clustering as _sq

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {nm[r["id"]]: r["sq_clustering"] for r in _sq(g).collect()}


def triadic_census(spark, edges, nodes=()) -> dict:
    """``nx.triadic_census`` (triads.py)."""
    from .operators.triads import triadic_census as _tc

    g = _as_graph(spark, edges, nodes, directed=True)
    return {r["triad_type"]: r["n_triads"] for r in _tc(g).collect()}


def biconnected_components(spark, edges, nodes=()) -> list[set]:
    """``nx.biconnected_components`` (biconnected.py:166) — node sets,
    one per block with >= 1 edge."""
    from .operators.biconnected import biconnected_components as _bc

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    blocks: dict[tuple, set] = {}
    for r in _bc(g).collect():
        blocks.setdefault((r["bc_src"], r["bc_dst"]), set()).update(
            (nm[r["src"]], nm[r["dst"]])
        )
    return list(blocks.values())


def articulation_points(spark, edges, nodes=()) -> set:
    """``nx.articulation_points`` (biconnected.py:226)."""
    from .operators.biconnected import articulation_points as _ap

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {nm[r["id"]] for r in _ap(g).collect()}


def bridges(spark, edges, nodes=()) -> set:
    """``nx.bridges`` (bridges.py:12)."""
    from .operators.biconnected import bridges as _br

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    return {
        tuple(sorted((nm[r["src"]], nm[r["dst"]]))) for r in _br(g).collect()
    }


def has_bridges(spark, edges, nodes=()) -> bool:
    """``nx.has_bridges`` (bridges.py:81)."""
    return bool(bridges(spark, edges, nodes))


def is_tree(spark, edges, nodes=()) -> bool:
    """``nx.is_tree`` (tree/recognition.py:141)."""
    from .operators.recognition import is_tree as _it

    return _it(_as_graph(spark, edges, nodes, directed=False))


def is_forest(spark, edges, nodes=()) -> bool:
    """``nx.is_forest`` (tree/recognition.py:215)."""
    from .operators.recognition import is_forest as _if

    return _if(_as_graph(spark, edges, nodes, directed=False))


def is_eulerian(spark, edges, nodes=(), directed=False) -> bool:
    """``nx.is_eulerian`` (euler.py:17)."""
    from .operators.recognition import is_eulerian as _ie

    return _ie(_as_graph(spark, edges, nodes, directed=directed))


def has_eulerian_path(spark, edges, nodes=(), directed=False) -> bool:
    """``nx.has_eulerian_path`` (euler.py:328)."""
    from .operators.recognition import has_eulerian_path as _hep

    return _hep(_as_graph(spark, edges, nodes, directed=directed))


def voterank(spark, edges, number_of_nodes=None, nodes=(), directed=False) -> list:
    """``nx.voterank`` (centrality/voterank_alg.py:9) — ordered seed
    list."""
    from .operators.voterank import voterank as _vr

    g = _as_graph(spark, edges, nodes, directed=directed)
    nm = _name_map(g)
    return [
        nm[r["id"]]
        for r in _vr(g, number_of_nodes).orderBy("seed_rank").collect()
    ]


def _ecc_all(spark, edges, nodes=()) -> tuple[dict, int]:
    """Exact per-node eccentricity via one batched multi-source BFS
    from EVERY vertex (facade/test scale; the sampled operator is the
    100 TB path). Raises ValueError on disconnected input like the
    reference (distance_measures.py:200)."""
    from .operators.distance_measures import eccentricity_sampled

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    n = len(nm)
    rows = eccentricity_sampled(g, g.vertices.select("id")).collect()
    if any(r["n_reached"] != n for r in rows) or len(rows) != n:
        raise ValueError("Found infinite path length: graph not connected")
    return {nm[r["source"]]: r["ecc"] for r in rows}, n


def eccentricity(spark, edges, nodes=()) -> dict:
    """``nx.eccentricity`` (distance_measures.py:200)."""
    return _ecc_all(spark, edges, nodes)[0]


def diameter(spark, edges, nodes=()) -> int:
    """``nx.diameter`` (distance_measures.py:293)."""
    return max(_ecc_all(spark, edges, nodes)[0].values())


def radius(spark, edges, nodes=()) -> int:
    """``nx.radius`` (distance_measures.py:388)."""
    return min(_ecc_all(spark, edges, nodes)[0].values())


def center(spark, edges, nodes=()) -> set:
    """``nx.center`` (distance_measures.py:342)."""
    ecc = _ecc_all(spark, edges, nodes)[0]
    r = min(ecc.values())
    return {v for v, e in ecc.items() if e == r}


def periphery(spark, edges, nodes=()) -> set:
    """``nx.periphery`` (distance_measures.py:437)."""
    ecc = _ecc_all(spark, edges, nodes)[0]
    d = max(ecc.values())
    return {v for v, e in ecc.items() if e == d}


def shortest_path(spark, edges, source, target, nodes=(), directed=False) -> list:
    """``nx.shortest_path(G, source, target)`` (generic.py:64,
    unweighted hops) — node-name list source..target; raises
    ValueError when no path exists (nx raises NetworkXNoPath)."""
    from .operators.shortest_paths import shortest_path_tree

    g = _as_graph(spark, edges, nodes, directed=directed)
    nm = _name_map(g)
    rev = {v: k for k, v in nm.items()}
    tree = {
        r["id"]: r["pred"]
        for r in shortest_path_tree(g, rev[str(source)], weight=False).collect()
    }
    tid = rev[str(target)]
    if tid not in tree:
        raise ValueError(f"no path between {source} and {target}")
    path, cur = [], tid
    while cur is not None:
        path.append(nm[cur])
        cur = tree[cur]
    return path[::-1]


def single_source_shortest_path_length(spark, edges, source, nodes=(), directed=False) -> dict:
    """``nx.single_source_shortest_path_length`` (unweighted.py:23)."""
    from .operators.shortest_paths import shortest_path_tree

    g = _as_graph(spark, edges, nodes, directed=directed)
    nm = _name_map(g)
    rev = {v: k for k, v in nm.items()}
    return {
        nm[r["id"]]: int(r["dist"])
        for r in shortest_path_tree(g, rev[str(source)], weight=False).collect()
    }


def _communities_df(spark, g, community_attr: dict):
    nm = _name_map(g)
    rev = {v: k for k, v in nm.items()}
    return spark.createDataFrame(
        [(rev[str(k)], v) for k, v in community_attr.items()],
        "id long, community long",
    )


def cn_soundarajan_hopcroft(spark, edges, community_attr, nodes=()) -> dict:
    """``nx.cn_soundarajan_hopcroft`` (link_prediction.py:478) over
    wedge candidates; ``community_attr`` maps node name → community."""
    from .operators.links import cn_soundarajan_hopcroft as _cn

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    cdf = _communities_df(spark, g, community_attr)
    return {(nm[r["u"]], nm[r["v"]]): r["score"] for r in _cn(g, cdf).collect()}


def ra_index_soundarajan_hopcroft(spark, edges, community_attr, nodes=()) -> dict:
    """``nx.ra_index_soundarajan_hopcroft`` (link_prediction.py:560)."""
    from .operators.links import ra_index_soundarajan_hopcroft as _ra

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    cdf = _communities_df(spark, g, community_attr)
    return {(nm[r["u"]], nm[r["v"]]): r["score"] for r in _ra(g, cdf).collect()}


def within_inter_cluster(spark, edges, community_attr, delta=0.001, nodes=()) -> dict:
    """``nx.within_inter_cluster`` (link_prediction.py:638)."""
    from .operators.links import within_inter_cluster as _wic

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    cdf = _communities_df(spark, g, community_attr)
    return {
        (nm[r["u"]], nm[r["v"]]): r["score"] for r in _wic(g, cdf, delta).collect()
    }


def all_pairs_shortest_path_length(spark, edges, nodes=(), directed=False) -> dict:
    """``nx.all_pairs_shortest_path_length`` (unweighted.py:118) — one
    batched multi-source BFS from every vertex; unreachable pairs
    absent, exactly like the reference."""
    from .operators.traversal import multi_source_bfs_layers

    g = _as_graph(spark, edges, nodes, directed=directed)
    nm = _name_map(g)
    out: dict = {n: {} for n in nm.values()}
    for r in multi_source_bfs_layers(g, g.vertices.select("id")).collect():
        out[nm[r["source"]]][nm[r["id"]]] = r["layer"]
    return out


def average_shortest_path_length(spark, edges, nodes=(), directed=False) -> float:
    """``nx.average_shortest_path_length`` (generic.py:406) — exact:
    Σ d(s,t) / (n(n-1)); raises on disconnected input like the
    reference."""
    from .operators.traversal import multi_source_bfs_counts

    g = _as_graph(spark, edges, nodes, directed=directed)
    n = g.vertices.count()
    if n <= 1:
        raise ValueError("average shortest path length undefined below 2 nodes")
    msb = multi_source_bfs_counts(g, g.vertices.select("id"), directed=directed)
    agg = msb.agg(
        F.sum(F.col("layer").cast("long") * F.col("n_src")).alias("s"),
        F.sum("n_src").alias("pairs"),
    ).first()
    if agg["pairs"] != n * n:  # every source must reach every node
        raise ValueError("Found infinite path length: graph not connected")
    return agg["s"] / (n * (n - 1))


def bfs_tree(spark, edges, source, nodes=(), directed=False) -> set:
    """``nx.bfs_tree`` edge set (traversal/breadth_first_search.py:100)
    with deterministic min-id parents — returned as (parent, child)
    name pairs."""
    from .operators.shortest_paths import shortest_path_tree

    g = _as_graph(spark, edges, nodes, directed=directed)
    nm = _name_map(g)
    rev = {v: k for k, v in nm.items()}
    return {
        (nm[r["pred"]], nm[r["id"]])
        for r in shortest_path_tree(g, rev[str(source)], weight=False).collect()
        if r["pred"] is not None
    }


def girvan_newman(spark, edges, nodes=()) -> set:
    """First level of ``nx.community.girvan_newman``
    (community/centrality.py:10) — frozenset partition of node
    names."""
    from .operators.girvan_newman import girvan_newman_level

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    out: dict = {}
    for r in girvan_newman_level(g, levels=1).collect():
        out.setdefault(r["component"], set()).add(nm[r["id"]])
    return {frozenset(s) for s in out.values()}


def dag_longest_path(spark, edges, nodes=(), weighted=False) -> list:
    """``nx.dag_longest_path`` (dag.py) — node-name list of one
    maximum-weight path (deterministic tight-predecessor choice)."""
    from .operators.dag import dag_longest_path as _dlp

    g = _as_graph(spark, edges, nodes, directed=True)
    nm = _name_map(g)
    rows = sorted(_dlp(g, weighted=weighted).collect(), key=lambda r: r["pos"])
    return [nm[r["id"]] for r in rows]


def dag_longest_path_length(spark, edges, nodes=(), weighted=False) -> float:
    from pyspark.sql import functions as F

    from .operators.dag import longest_path_lengths

    g = _as_graph(spark, edges, nodes, directed=True)
    v = longest_path_lengths(g, weighted=weighted).agg(F.max("dist")).first()[0]
    return float(v)


def transitive_closure(spark, edges, nodes=()) -> set:
    """``nx.transitive_closure`` (reflexive=False) edge set."""
    from .operators.dag import transitive_closure as _tc

    g = _as_graph(spark, edges, nodes, directed=True)
    nm = _name_map(g)
    return {(nm[r["src"]], nm[r["dst"]]) for r in _tc(g).collect()}


def transitive_reduction(spark, edges, nodes=()) -> set:
    from .operators.dag import transitive_reduction as _tr

    g = _as_graph(spark, edges, nodes, directed=True)
    nm = _name_map(g)
    return {(nm[r["src"]], nm[r["dst"]]) for r in _tr(g).collect()}


def attracting_components(spark, edges, nodes=()) -> list[set]:
    from .operators.strongly_connected import attracting_components as _ac

    g = _as_graph(spark, edges, nodes, directed=True)
    nm = _name_map(g)
    out: dict = {}
    for r in _ac(g).collect():
        out.setdefault(r["component"], set()).add(nm[r["id"]])
    return list(out.values())


def is_semiconnected(spark, edges, nodes=()) -> bool:
    from .operators.strongly_connected import is_semiconnected as _sc

    return _sc(_as_graph(spark, edges, nodes, directed=True))


def is_aperiodic(spark, edges, nodes=()) -> bool:
    from .operators.strongly_connected import is_aperiodic as _ap

    return _ap(_as_graph(spark, edges, nodes, directed=True))


def voronoi_cells(spark, edges, center_nodes, nodes=(), directed=False) -> dict:
    """``nx.voronoi_cells`` — {center name: set of member names};
    unreachable nodes collected under 'unreachable' (reference
    contract)."""
    from .operators.traversal import voronoi_cells as _vc

    g = _as_graph(spark, edges, nodes, directed=directed)
    nm = _name_map(g)
    rev = {v: k for k, v in nm.items()}
    centers = [rev[str(c)] for c in center_nodes]
    out: dict = {str(c): set() for c in center_nodes}
    reached = set()
    for r in _vc(g, centers).collect():
        out[nm[r["center"]]].add(nm[r["id"]])
        reached.add(r["id"])
    unreachable = {nm[i] for i in nm if i not in reached}
    if unreachable:
        out["unreachable"] = unreachable
    return out


def partition_quality(spark, edges, communities, nodes=()) -> tuple:
    """``nx.community.partition_quality`` — (coverage, performance)
    for a list-of-sets partition."""
    from .operators.community_metrics import partition_quality as _pq

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    rev = {v: k for k, v in nm.items()}
    rows = [
        (rev[str(n)], i) for i, comm in enumerate(communities) for n in comm
    ]
    labels = spark.createDataFrame(rows, "id LONG, label LONG")
    r = _pq(g, labels).first()
    return (r["coverage"], r["performance"])


def global_reaching_centrality(spark, edges, nodes=()) -> float:
    from .operators.reaching import global_reaching_centrality as _grc

    g = _as_graph(spark, edges, nodes, directed=True)
    return float(_grc(g).first()["grc"])


def snap_aggregation(spark, edges, node_attributes, edge_attributes=None, nodes=()) -> set:
    """``nx.snap_aggregation`` partition — set of frozensets of node
    names (supernode identity is engine-specific by design).
    ``node_attributes`` maps node name -> attr string;
    ``edge_attributes`` optionally maps (u, v) -> type string."""
    from .operators.summarization import snap_groups

    g = _as_graph(spark, edges, nodes, directed=False)
    nm = _name_map(g)
    rev = {v: k for k, v in nm.items()}
    attrs = spark.createDataFrame(
        [(rev[str(k)], str(v)) for k, v in node_attributes.items()],
        "id LONG, attr STRING",
    )
    et = None
    if edge_attributes:
        et = spark.createDataFrame(
            [
                (rev[str(u)], rev[str(v)], str(t))
                for (u, v), t in edge_attributes.items()
            ],
            "src LONG, dst LONG, etype STRING",
        )
    out: dict = {}
    for r in snap_groups(g, attrs, edge_types=et).collect():
        out.setdefault(r["group"], set()).add(nm[r["id"]])
    return {frozenset(s) for s in out.values()}
