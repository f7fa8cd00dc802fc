"""Edge-list / adjacency-list / JSON node-link file formats.

Spark-first re-expression of the reference readers/writers
(networkx/readwrite/edgelist.py:302,127,177,429,388;
networkx/readwrite/adjlist.py:248,110,174;
networkx/readwrite/json_graph/node_link.py:26,144): instead of a
line-at-a-time Python loop feeding ``G.add_edge``, the file IS a
distributed scan — ``spark.read.csv/text/json`` with comment handling
and compression codecs built in — and the graph IS the resulting edge
DataFrame. Writers are the inverse ``df.write``.

All readers return name-keyed edge frames ``(su STRING, sv STRING
[, weight DOUBLE])``; callers go through
:func:`linkgraph.graph.graph_from_edge_names`-style id assignment for
dense ids (networkx/relabel.py:227 analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_edgelist(
    spark: SparkSession,
    path: str,
    comments: str = "#",
    delimiter: str = " ",
    weighted: bool = False,
) -> DataFrame:
    """Distributed analog of ``nx.read_edgelist`` /
    ``read_weighted_edgelist`` (networkx/readwrite/edgelist.py:302,429).
    Compression (.gz etc.) is handled by Spark codecs — the analog of
    the reference's ``@open_file`` decorator
    (networkx/utils/decorators.py:104)."""
    fields = [
        T.StructField("su", T.StringType()),
        T.StructField("sv", T.StringType()),
    ]
    if weighted:
        fields.append(T.StructField("weight", T.DoubleType()))
    df = spark.read.csv(
        path,
        sep=delimiter,
        comment=comments or None,
        schema=T.StructType(fields),
        mode="PERMISSIVE",
    )
    out = df.where(F.col("su").isNotNull() & F.col("sv").isNotNull())
    if not weighted:
        out = out.withColumn("weight", F.lit(None).cast("double"))
    return out


def write_edgelist(edges: DataFrame, path: str, delimiter: str = " ") -> None:
    """``nx.write_edgelist`` analog (edgelist.py:127): distributed csv
    write, one (u, v[, w]) line per edge."""
    cols = [F.col("su"), F.col("sv")]
    if "weight" in edges.columns:
        cols.append(F.col("weight"))
    edges.select(*cols).write.mode("overwrite").csv(path, sep=delimiter)


def parse_edgelist(
    spark: SparkSession, lines: list[str], comments: str = "#", weighted: bool = False
) -> DataFrame:
    """In-memory form (edgelist.py:177) — same parse as read_edgelist
    over a tiny parallelized dataset (fixtures/tests)."""
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    return _parse_lines(df, comments, weighted)


def _parse_lines(df: DataFrame, comments: str, weighted: bool) -> DataFrame:
    clean = df.select(
        F.trim(
            F.when(
                F.instr("value", comments) > 0,
                F.expr(f"substring(value, 1, instr(value, '{comments}') - 1)"),
            ).otherwise(F.col("value"))
        ).alias("line")
    ).where(F.col("line") != "")
    parts = clean.select(F.split("line", r"\s+").alias("p"))
    out = parts.select(
        F.col("p")[0].alias("su"),
        F.col("p")[1].alias("sv"),
        (F.col("p")[2].cast("double") if weighted else F.lit(None).cast("double")).alias(
            "weight"
        ),
    )
    return out.where(F.col("su").isNotNull() & F.col("sv").isNotNull())


def read_adjlist(spark: SparkSession, path: str, comments: str = "#") -> DataFrame:
    """``nx.read_adjlist`` analog (adjlist.py:248): each line is
    ``node nbr nbr ...``; explode to edge rows. Nodes with no
    neighbors still appear (as su with null sv) so callers can
    recover isolated vertices."""
    return _parse_adj(spark.read.text(path), comments)


def parse_adjlist(spark: SparkSession, lines: list[str], comments: str = "#") -> DataFrame:
    return _parse_adj(
        spark.createDataFrame([(ln,) for ln in lines], "value string"), comments
    )


def _parse_adj(df: DataFrame, comments: str) -> DataFrame:
    clean = df.select(
        F.trim(
            F.when(
                F.instr("value", comments) > 0,
                F.expr(f"substring(value, 1, instr(value, '{comments}') - 1)"),
            ).otherwise(F.col("value"))
        ).alias("line")
    ).where(F.col("line") != "")
    parts = clean.select(F.split("line", r"\s+").alias("p"))
    return parts.select(
        F.col("p")[0].alias("su"),
        F.explode_outer(F.slice("p", 2, 1_000_000)).alias("sv"),
    ).withColumn("weight", F.lit(None).cast("double"))


def write_adjlist(edges: DataFrame, path: str) -> None:
    """``nx.write_adjlist`` analog (adjlist.py:110): group out-edges
    per node into one line."""
    (
        edges.groupBy("su")
        .agg(F.array_join(F.sort_array(F.collect_list("sv")), " ").alias("nbrs"))
        .select(F.concat_ws(" ", "su", "nbrs").alias("value"))
        .write.mode("overwrite")
        .text(path)
    )


def read_node_link_json(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """JSON node-link format (json_graph/node_link.py:144): one JSON
    doc ``{"nodes": [{"id": ...}], "links": [{"source","target"}]}``.
    Returns (nodes_df(su), edges_df(su, sv, weight))."""
    doc = spark.read.option("multiLine", "true").json(path)
    nodes = doc.select(F.explode("nodes").alias("n")).select(
        F.col("n.id").cast("string").alias("su")
    )
    links = doc.select(F.explode("links").alias("l"))
    lcols = links.select("l.*").columns
    edges = links.select(
        F.col("l.source").cast("string").alias("su"),
        F.col("l.target").cast("string").alias("sv"),
        (F.col("l.weight").cast("double") if "weight" in lcols else F.lit(None).cast("double")).alias("weight"),
    )
    return nodes, edges


def write_node_link_json(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    """``nx.node_link_data`` + json dump analog (node_link.py:26):
    assemble the single-doc form distributed-side, write one file."""
    n = nodes.agg(F.collect_list(F.struct(F.col("su").alias("id"))).alias("nodes"))
    e = edges.agg(
        F.collect_list(
            F.struct(
                F.col("su").alias("source"),
                F.col("sv").alias("target"),
                F.col("weight"),
            )
        ).alias("links")
    )
    n.crossJoin(e).coalesce(1).write.mode("overwrite").json(path)
