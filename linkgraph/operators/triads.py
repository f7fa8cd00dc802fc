"""Directed triadic census — counts of the 16 MAN triad isomorphism
classes over all node triples.

Reference semantics: ``nx.triadic_census``
(networkx/algorithms/triads.py) — the Batagelj–Mrvar node-iterative
algorithm. The distributed form inverts it into three set-sized
pieces, none of which touches all C(n,3) triples:

1. **Dyad states.** One pass over the distinct directed edge set
   produces, per unordered pair (a<b), a 2-bit state
   (1 = a→b, 2 = b→a, 3 = mutual).
2. **Triples with ≥2 linked dyads** are exactly the wedges of the
   linked-pair graph: a self-equi-join of the dyad table on a shared
   endpoint (the same shape as the triangle wedge join; Σ deg² cost,
   hub skew bounded by AQE / the documented degree-cap mitigation),
   a left join for the third pair's state, then one ``distinct`` —
   a 3-linked triple materializes from 3 centers, a 2-linked from 1.
   Each triple's 6-bit code looks up its class in a 64-entry literal
   map (JVM-side ``element_at``).
3. **Triples with ≤1 linked dyad** are counted combinatorially from
   three scalars: 102 = m·(n−2) − Σ mutual-dyads-in-enumerated,
   012 = a·(n−2) − Σ asym-dyads-in-enumerated, 003 = C(n,3) − rest.

The 64-code → class mapping is the standard MAN classification
(derived by enumerating all 3-node digraph pair-state combinations
and classifying each — the same table networkx's TRICODES encodes).
Self-loops are dropped; edges are restricted to the vertex table so
n and the dyad universe agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import LinkGraph

TRIAD_CLASSES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]

# code = s(x,y) + 4*s(x,z) + 16*s(y,z) for the sorted triple x<y<z,
# where each s is the canonical pair state (1=lo→hi, 2=hi→lo, 3=both)
CODE_TO_CLASS = {
    0: "003",
    1: "012", 2: "012", 4: "012", 8: "012", 16: "012", 32: "012",
    3: "102", 12: "102", 48: "102",
    5: "021D", 18: "021D", 40: "021D",
    10: "021U", 20: "021U", 33: "021U",
    6: "021C", 9: "021C", 17: "021C", 24: "021C", 34: "021C", 36: "021C",
    11: "111D", 14: "111D", 28: "111D", 35: "111D", 49: "111D", 52: "111D",
    7: "111U", 13: "111U", 19: "111U", 44: "111U", 50: "111U", 56: "111U",
    21: "030T", 22: "030T", 26: "030T", 37: "030T", 41: "030T", 42: "030T",
    25: "030C", 38: "030C",
    15: "201", 51: "201", 60: "201",
    30: "120D", 43: "120D", 53: "120D",
    23: "120U", 45: "120U", 58: "120U",
    27: "120C", 29: "120C", 39: "120C", 46: "120C", 54: "120C", 57: "120C",
    31: "210", 47: "210", 55: "210", 59: "210", 61: "210", 62: "210",
    63: "300",
}


def _dyad_states(graph: LinkGraph) -> DataFrame:
    """(a, b, s) with a<b and s ∈ {1,2,3} for every linked pair."""
    verts = graph.vertices.select("id")
    e = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .distinct()
    )
    bits = e.select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        F.when(F.col("src") < F.col("dst"), F.lit(1)).otherwise(F.lit(2)).alias("bit"),
    )
    return bits.groupBy("a", "b").agg(F.sum(F.col("bit")).cast("int").alias("s"))


def triadic_census(graph: LinkGraph) -> DataFrame:
    """(triad_type STRING, n_triads BIGINT), all 16 classes (zeros
    included). Directed graphs only (reference parity:
    ``@not_implemented_for('undirected')``)."""
    if not graph.directed:
        raise ValueError(
            "triadic_census is not defined for undirected graphs "
            "(reference parity: networkx/algorithms/triads.py)"
        )
    spark = graph.spark
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    dy = _dyad_states(graph).repartition(nparts, "a").persist()
    n = graph.vertices.count()

    nbrs = (
        dy.select(F.col("a").alias("center"), F.col("b").alias("other"), "s")
        .unionByName(
            dy.select(F.col("b").alias("center"), F.col("a").alias("other"), "s")
        )
    )
    j1 = nbrs.select("center", F.col("other").alias("u"), F.col("s").alias("s1"))
    j2 = nbrs.select("center", F.col("other").alias("v"), F.col("s").alias("s2"))
    wedges = j1.join(j2, "center").where(F.col("u") < F.col("v"))
    # third pair's state ({u,v}, canonical since u<v)
    third = dy.select(
        F.col("a").alias("u"), F.col("b").alias("v"), F.col("s").alias("s_uv")
    )
    trip = wedges.join(third, ["u", "v"], "left").select(
        "u", "v", F.col("center").alias("w"),
        "s1", "s2", F.coalesce("s_uv", F.lit(0)).alias("s_uv"),
    )
    w, u, v = F.col("w"), F.col("u"), F.col("v")
    code = (
        F.when(w < u, F.col("s1") + 4 * F.col("s2") + 16 * F.col("s_uv"))
        .when(w < v, F.col("s1") + 4 * F.col("s_uv") + 16 * F.col("s2"))
        .otherwise(F.col("s_uv") + 4 * F.col("s1") + 16 * F.col("s2"))
    )
    tri = (
        trip.select(
            F.least("u", "w").alias("x"),
            F.expr("array_sort(array(u, v, w))[1]").alias("y"),
            F.greatest("v", "w").alias("z"),
            code.alias("code"),
        )
        .distinct()
        .persist()
    )

    lookup = F.create_map(
        *[x for k, cls in CODE_TO_CLASS.items() for x in (F.lit(k), F.lit(cls))]
    )
    s_cols = [
        (F.col("code") % 4),
        (F.floor(F.col("code") / 4) % 4),
        (F.floor(F.col("code") / 16) % 4),
    ]
    mcount = sum(F.when(s == 3, 1).otherwise(0) for s in s_cols)
    acount = sum(F.when((s == 1) | (s == 2), 1).otherwise(0) for s in s_cols)
    enum_stats = tri.agg(
        F.count(F.lit(1)).alias("n_tri"),
        F.coalesce(F.sum(mcount), F.lit(0)).alias("sum_m"),
        F.coalesce(F.sum(acount), F.lit(0)).alias("sum_a"),
    ).first()
    enum_counts = {
        r["triad_type"]: r["n_triads"]
        for r in tri.select(F.element_at(lookup, F.col("code")).alias("triad_type"))
        .groupBy("triad_type")
        .agg(F.count(F.lit(1)).alias("n_triads"))
        .collect()
    }
    dyad_counts = dy.agg(
        F.coalesce(F.sum(F.when(F.col("s") == 3, 1).otherwise(0)), F.lit(0)).alias("m"),
        F.coalesce(F.sum(F.when(F.col("s") != 3, 1).otherwise(0)), F.lit(0)).alias("a"),
    ).first()
    dy.unpersist()
    tri.unpersist()

    m_d, a_d = int(dyad_counts["m"]), int(dyad_counts["a"])
    counts = dict(enum_counts)
    counts["102"] = counts.get("102", 0) + m_d * max(n - 2, 0) - int(enum_stats["sum_m"])
    counts["012"] = counts.get("012", 0) + a_d * max(n - 2, 0) - int(enum_stats["sum_a"])
    total_rest = sum(counts.values())
    counts["003"] = n * (n - 1) * (n - 2) // 6 - total_rest
    rows = [(cls, int(counts.get(cls, 0))) for cls in TRIAD_CLASSES]
    return spark.createDataFrame(rows, "triad_type string, n_triads long")
