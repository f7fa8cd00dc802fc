"""Incremental PageRank serving refresh: warm start converges to the
same fixpoint as a cold run, in fewer supersteps, across a growing
page store (ids remap between epochs; ranks are url-keyed)."""

import pytest

from linkgraph.sources import corpus
from linkgraph.streaming.incremental import refresh_ranks

# ring + chords: big enough that one extra page is a small
# perturbation (the incremental-crawl regime where warm start wins)
EPOCH1 = [(i, (i + 1) % 40) for i in range(40)] + [(i, (i + 7) % 40) for i in range(0, 40, 5)]
EPOCH2 = [(40, 3)]  # one new page with one out-link


def _write_pages(spark, path, edges, mode):
    corpus.pages_df(spark, "inc", edges).write.mode(mode).parquet(path)


def test_incremental_refresh(spark, tmp_path):
    pages = str(tmp_path / "pages")
    ranks = str(tmp_path / "ranks")

    _write_pages(spark, pages, EPOCH1, "overwrite")
    s1: dict = {}
    r1 = {r["url"]: r["rank"] for r in refresh_ranks(
        spark, pages, ranks, tol=1e-8, stats_out=s1).collect()}
    assert len(r1) == 40 and abs(sum(r1.values()) - 1.0) < 1e-9

    # epoch 2: append pages for the new edges (new node 7 remaps ids)
    _write_pages(spark, pages, EPOCH2, "append")
    s_warm: dict = {}
    r2 = {r["url"]: r["rank"] for r in refresh_ranks(
        spark, pages, ranks, tol=1e-8, stats_out=s_warm).collect()}
    assert len(r2) == 41

    # cold recompute on the same store must land on the same fixpoint
    import shutil

    shutil.rmtree(ranks)
    s_cold: dict = {}
    r_cold = {r["url"]: r["rank"] for r in refresh_ranks(
        spark, pages, ranks, tol=1e-8, stats_out=s_cold).collect()}
    for u in r_cold:
        assert r2[u] == pytest.approx(r_cold[u], abs=1e-6)

    # warm start must save supersteps vs the cold run
    assert s_warm["iterations"] < s_cold["iterations"]


def test_foreachbatch_stream(spark, tmp_path):
    """End-to-end: page drops through a real streaming query with the
    incremental sink; serving table reflects the full page set."""
    from linkgraph.streaming import ingest
    from linkgraph.streaming.incremental import incremental_pagerank_sink

    drops = str(tmp_path / "drops")
    store = str(tmp_path / "store")
    ranks = str(tmp_path / "serve")
    ck = str(tmp_path / "ck")

    pages = corpus.pages_df(spark, "inc", EPOCH1)
    pages.write.mode("append").parquet(drops)

    stream = ingest.read_page_stream(spark, drops, max_files_per_trigger=64)
    q = (
        stream.writeStream.foreachBatch(
            incremental_pagerank_sink(spark, store, ranks, tol=1e-6)
        )
        .option("checkpointLocation", ck)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    serving = {r["url"]: r["rank"] for r in spark.read.parquet(ranks).collect()}
    assert len(serving) == 40
    assert abs(sum(serving.values()) - 1.0) < 1e-6


def test_edge_store_refresh_parity(spark, tmp_path):
    """r5 O(Δ) ingest path: batches ingested once into the append-only
    edge store, refreshes built FROM THE STORE, land on the
    bit-identical serving tables the legacy whole-crawl re-extraction
    reaches — and a refresh never grows the store (extraction output
    is written at ingest, exactly once per page, never at refresh)."""
    import shutil

    from linkgraph.streaming.incremental import (
        graph_from_store,
        ingest_pages,
        refresh_components,
        refresh_ranks,
    )

    store = str(tmp_path / "store")
    pages = str(tmp_path / "pages")
    ranks_s = str(tmp_path / "ranks_store")
    ranks_p = str(tmp_path / "ranks_pages")

    b1 = corpus.pages_df(spark, "inc", EPOCH1)
    b1.write.mode("overwrite").parquet(pages)
    ingest_pages(spark, b1, store)
    refresh_ranks(spark, None, ranks_s, store_path=store, tol=1e-8)
    refresh_ranks(spark, pages, ranks_p, tol=1e-8)

    b2 = corpus.pages_df(spark, "inc", EPOCH2)
    b2.write.mode("append").parquet(pages)
    ingest_pages(spark, b2, store)
    edge_rows_before = spark.read.parquet(store + "/edges").count()
    r_store = {r["url"]: r["rank"] for r in refresh_ranks(
        spark, None, ranks_s, store_path=store, tol=1e-8).collect()}
    r_pages = {r["url"]: r["rank"] for r in refresh_ranks(
        spark, pages, ranks_p, tol=1e-8).collect()}
    assert r_store == r_pages  # bit-identical, not approx
    # refresh is read-only on the store: no re-extraction, no rewrite
    assert spark.read.parquet(store + "/edges").count() == edge_rows_before

    # the store-built graph equals the pages-built graph exactly
    from linkgraph.graph import graph_from_pages

    gs = graph_from_store(spark, store)
    gp = graph_from_pages(spark.read.parquet(pages))
    assert sorted(map(tuple, gs.vertices.collect())) == sorted(
        map(tuple, gp.vertices.collect())
    )
    assert sorted(map(tuple, gs.edges.collect())) == sorted(
        map(tuple, gp.edges.collect())
    )

    # CC refresher through the same store: identical to the pages path
    lab_s = str(tmp_path / "lab_store")
    lab_p = str(tmp_path / "lab_pages")
    l_s = {r["url"]: r["component_url"] for r in refresh_components(
        spark, None, lab_s, store_path=store).collect()}
    l_p = {r["url"]: r["component_url"] for r in refresh_components(
        spark, pages, lab_p).collect()}
    assert l_s == l_p

    # an out-link extracted BEFORE its target was crawled becomes an
    # edge once the target arrives (the store keeps unfiltered links):
    # EPOCH1 node 0 links to 1..; add a batch crawling a url that was
    # already linked-to plus a fresh linker, then check edge presence
    shutil.rmtree(store)
    late = corpus.pages_df(spark, "late", [(0, 1), (1, 0)])
    ingest_pages(spark, late.where("url like '%/0'"), store)
    g1 = graph_from_store(spark, store)
    assert g1.edges.count() == 0  # dst /1 not crawled yet
    ingest_pages(spark, late.where("url like '%/1'"), store)
    g2 = graph_from_store(spark, store)
    assert g2.edges.count() == 2  # both directions now resolve


def test_incremental_components_refresh(spark, tmp_path):
    """CC serving refresh: warm start reaches the identical (url,
    component_url) fixpoint as a cold run, in fewer supersteps, across
    an id-remapping append epoch."""
    from linkgraph.streaming.incremental import refresh_components

    pages = str(tmp_path / "pages")
    labels = str(tmp_path / "labels")

    # epoch 1: two 30-node chains (components resolve in O(log) rounds)
    chain_a = [(i, i + 1) for i in range(29)]
    chain_b = [(100 + i, 101 + i) for i in range(29)]
    _write_pages(spark, pages, chain_a + chain_b, "overwrite")
    s1: dict = {}
    l1 = {r["url"]: r["component_url"] for r in refresh_components(
        spark, pages, labels, local_max_edges=0, stats_out=s1).collect()}
    assert len(set(l1.values())) == 2

    # epoch 2: one new page whose link merges the two chains
    _write_pages(spark, pages, [(200, 15), (200, 115)], "append")
    s_warm: dict = {}
    l2 = {r["url"]: r["component_url"] for r in refresh_components(
        spark, pages, labels, local_max_edges=0, stats_out=s_warm).collect()}
    assert len(set(l2.values())) == 1

    # cold recompute on the same store: identical serving table
    import shutil

    shutil.rmtree(labels)
    s_cold: dict = {}
    l_cold = {r["url"]: r["component_url"] for r in refresh_components(
        spark, pages, labels, local_max_edges=0, stats_out=s_cold).collect()}
    assert l2 == l_cold
    assert s_warm["supersteps"] < s_cold["supersteps"]


def test_incremental_communities_refresh(spark, tmp_path):
    """LPA serving refresh: warm start lands on a VALID fixpoint with
    fewer drain sweeps than cold, and labels far from the append stay
    put (serving stability — the point of warm starts)."""
    from collections import Counter

    from linkgraph.streaming.incremental import refresh_communities

    pages = str(tmp_path / "pages")
    labels = str(tmp_path / "labels")

    # two well-separated cliques joined by nothing; epoch 2 appends a
    # pendant onto clique B only
    clique_a = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    clique_b = [(100 + i, 100 + j) for i in range(6) for j in range(i + 1, 6)]
    _write_pages(spark, pages, clique_a + clique_b, "overwrite")
    s_cold: dict = {}
    l1 = {r["url"]: r["label_url"] for r in refresh_communities(
        spark, pages, labels, local_max_edges=0, stats_out=s_cold).collect()}
    assert len(set(l1.values())) == 2

    _write_pages(spark, pages, [(200, 103)], "append")
    s_warm: dict = {}
    l2 = {r["url"]: r["label_url"] for r in refresh_communities(
        spark, pages, labels, local_max_edges=0, stats_out=s_warm).collect()}
    # fixpoint validity on the full graph (argmax membership per node)
    import networkx as nx

    G = nx.Graph()
    G.add_edges_from(clique_a + clique_b + [(200, 103)])
    url_of = lambda i: next(u for u in l2 if u.endswith(f"/{i}"))
    for u in G.nodes():
        freq = Counter(l2[url_of(v)] for v in G[u])
        assert freq[l2[url_of(u)]] == max(freq.values())
    # clique A untouched by the append: its labels did not churn
    for i in range(6):
        assert l2[url_of(i)] == l1[url_of(i)]
    # serving win = fewer total gather rounds (warmup + drain sweeps)
    warm_rounds = s_warm["sweeps"] + s_warm["warmup_rounds"]
    cold_rounds = s_cold["sweeps"] + s_cold["warmup_rounds"]
    assert warm_rounds < cold_rounds


def test_incremental_triangles_refresh(spark, tmp_path):
    """Triangle serving refresh: the Δ-edge probe plus previous counts
    equals a cold full recount, including triangles closed by TWO new
    edges (the dedup case), across an id-remapping append epoch."""
    import shutil

    from linkgraph.streaming.incremental import refresh_triangles

    pages = str(tmp_path / "pages")
    tri = str(tmp_path / "tri")

    # epoch 1: a triangle (0,1,2) + path 3-4
    _write_pages(spark, pages, [(0, 1), (1, 2), (2, 0), (3, 4)], "overwrite")
    s1: dict = {}
    t1 = {r["url"]: r["triangles"] for r in refresh_triangles(
        spark, pages, tri, stats_out=s1).collect()}
    assert s1["mode"] == "full"
    assert sorted(t1.values()) == [0, 0, 1, 1, 1]

    # epoch 2: close (3,4,5) with TWO new edges (4-5, 5-3) and add
    # (0,1,5) via one new edge... 5-0 and 5-1 are both new; triangle
    # (0,1,5) has two new edges, (3,4,5) has two new edges, and
    # (2,0,1) is old — the probe must count each new one exactly once
    _write_pages(spark, pages, [(5, 4), (5, 3), (5, 0), (5, 1)], "append")
    s2: dict = {}
    t2 = {r["url"]: r["triangles"] for r in refresh_triangles(
        spark, pages, tri, stats_out=s2).collect()}
    assert s2["mode"] == "delta" and s2["new_edges"] == 4

    shutil.rmtree(tri)
    shutil.rmtree(tri + ".edges")
    s_cold: dict = {}
    t_cold = {r["url"]: r["triangles"] for r in refresh_triangles(
        spark, pages, tri, stats_out=s_cold).collect()}
    assert s_cold["mode"] == "full"
    assert t2 == t_cold


def test_incremental_reach_refresh(spark, tmp_path):
    """HyperBall reach serving: warm registers land on the bit-identical
    fixpoint a cold run reaches (max-merge lattice), in fewer
    supersteps."""
    from linkgraph.streaming.incremental import refresh_reach

    pages = str(tmp_path / "pages")
    reach = str(tmp_path / "reach")

    _write_pages(spark, pages, EPOCH1, "overwrite")
    s1: dict = {}
    r1 = {r["url"]: r for r in refresh_reach(
        spark, pages, reach, b=6, stats_out=s1).collect()}
    assert len(r1) == 40
    # ring+chords is strongly connected: every page reaches all 40
    for r in r1.values():
        # one shared sketch draw for the whole reach set (no per-node
        # averaging): allow ~2 sigma of the b=6 sketch error
        assert r["reach_est"] == pytest.approx(40.0, rel=0.25)

    _write_pages(spark, pages, EPOCH2, "append")
    s_warm: dict = {}
    r2 = {r["url"]: r for r in refresh_reach(
        spark, pages, reach, b=6, stats_out=s_warm).collect()}
    assert len(r2) == 41

    import shutil

    shutil.rmtree(reach)
    s_cold: dict = {}
    r_cold = {r["url"]: r for r in refresh_reach(
        spark, pages, reach, b=6, stats_out=s_cold).collect()}
    regs = [f"r{i}" for i in range(64)]
    for u in r_cold:
        assert [r2[u][c] for c in regs] == [r_cold[u][c] for c in regs]
        assert r2[u]["reach_est"] == r_cold[u]["reach_est"]
    assert s_warm["supersteps"] < s_cold["supersteps"]


def test_incremental_communities_entry_membership(spark):
    """The LPA serving entry cannot be SQL-pinned (schedule-dependent
    choice among Fibonacci-many valid chain segmentations — see the
    entry docstring), so assert MEMBERSHIP in the valid family
    instead: after the two-epoch refresh every community is a
    contiguous run of >= 2 consecutive customers within one nation
    chain (no isolates exist on complete chains of length >= 2)."""
    import __spark_entry__ as entry

    rows = entry.queries()["incremental_communities_epoch2"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    # url encodes the custkey; rebuild nation chains from the fixture
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    nation_of = {
        str(r["c_custkey"]): r["c_nationkey"] for r in cust.collect()
    }
    key = lambda u: u.rsplit("/", 1)[-1]
    label_of = {key(r["url"]): key(r["label_url"]) for r in rows}
    assert len(label_of) == len(nation_of)
    # group chain positions per nation, sorted by custkey
    chains: dict = {}
    for ck, nk in nation_of.items():
        chains.setdefault(nk, []).append(int(ck))
    for nk, members in chains.items():
        members.sort()
        run_len = 1
        for prev, cur in zip(members, members[1:]):
            same = label_of[str(prev)] == label_of[str(cur)]
            if same:
                run_len += 1
            else:
                assert run_len >= 2 or len(members) == 1, (nk, prev, run_len)
                run_len = 1
        assert run_len >= 2 or len(members) == 1, (nk, run_len)
        # labels never cross nations: every community's representative
        # is a member of the same nation chain
        for ck in members:
            assert nation_of[label_of[str(ck)]] == nk


def test_ingest_epoch_replay_idempotent(spark, tmp_path):
    """foreachBatch replays an epoch at-least-once; epoch-partitioned
    overwrite ingest makes the replay a no-op (no doubled parallel
    links), and later epochs land beside it."""
    from linkgraph.streaming.incremental import graph_from_store, ingest_pages

    store = str(tmp_path / "store")
    b1 = corpus.pages_df(spark, "ep", [(0, 1), (1, 2)])
    ingest_pages(spark, b1, store, batch_id=0)
    ingest_pages(spark, b1, store, batch_id=0)  # replayed epoch
    g = graph_from_store(spark, store)
    assert g.edges.count() == 2  # NOT 4: replay overwrote, not appended
    b2 = corpus.pages_df(spark, "ep2", [(10, 11)])
    ingest_pages(spark, b2, store, batch_id=1)
    g2 = graph_from_store(spark, store)
    assert g2.edges.count() == 3
    assert g2.vertices.count() == 5


def test_stable_id_ledger(spark, tmp_path):
    """r5 stretch: the id ledger assigns each url a BIGINT once — ids
    survive epochs unchanged (dense, monotone by arrival), the
    stable-id graph equals the lexicographic build up to relabeling,
    and the id-invariant refreshers produce bit-identical serving
    tables through either dictionary."""
    from linkgraph.streaming.incremental import (
        graph_from_store,
        ingest_pages,
        refresh_ranks,
        refresh_triangles,
    )

    store = str(tmp_path / "store")
    b1 = corpus.pages_df(spark, "led", EPOCH1)
    ingest_pages(spark, b1, store, stable_ids=True)
    ids1 = {r["url"]: r["id"]
            for r in spark.read.parquet(store + "/ids").collect()}
    assert sorted(ids1.values()) == list(range(40))  # dense from 0

    b2 = corpus.pages_df(spark, "led", EPOCH2)
    new_urls = {r["url"] for r in b2.select("url").collect()} - set(ids1)
    ingest_pages(spark, b2.where(~b2.url.isin(list(ids1))), store,
                 stable_ids=True)
    ids2 = {r["url"]: r["id"]
            for r in spark.read.parquet(store + "/ids").collect()}
    for u, i in ids1.items():
        assert ids2[u] == i  # epoch-1 ids never remap
    assert {ids2[u] for u in new_urls} == set(
        range(40, 40 + len(new_urls))
    )  # new urls appended at the tail

    # same graph up to relabeling: edge count + sorted url-edge set
    gl = graph_from_store(spark, store)
    gs = graph_from_store(spark, store, stable_ids=True)
    def url_edges(g):
        ids = g.vertices
        return sorted(
            (r["su"], r["du"])
            for r in g.edges.join(
                ids.selectExpr("id as src", "url as su"), "src"
            ).join(ids.selectExpr("id as dst", "url as du"), "dst")
            .select("su", "du").collect()
        )
    assert url_edges(gl) == url_edges(gs)

    # id-invariant refreshers: bit-identical serving tables
    r_lex = {r["url"]: r["rank"] for r in refresh_ranks(
        spark, None, str(tmp_path / "rl"), store_path=store,
        tol=1e-8).collect()}
    r_stb = {r["url"]: r["rank"] for r in refresh_ranks(
        spark, None, str(tmp_path / "rs"), store_path=store,
        tol=1e-8, stable_ids=True).collect()}
    # ranks are id-invariant up to float summation ORDER (different
    # ids -> different gather order); triangles are exact integers
    assert set(r_lex) == set(r_stb)
    for u in r_lex:
        assert r_lex[u] == pytest.approx(r_stb[u], abs=1e-12)
    t_lex = {r["url"]: r["triangles"] for r in refresh_triangles(
        spark, None, str(tmp_path / "tl"), store_path=store).collect()}
    t_stb = {r["url"]: r["triangles"] for r in refresh_triangles(
        spark, None, str(tmp_path / "ts"), store_path=store,
        stable_ids=True).collect()}
    assert t_lex == t_stb
