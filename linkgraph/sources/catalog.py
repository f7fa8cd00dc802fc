"""Table catalog seam: Iceberg when the runtime is present, Parquet
with an Iceberg-shaped layout otherwise.

The north rule stores Common-Crawl pages "in Iceberg at 10^12-document
scale". This sandbox has no Iceberg runtime jar (verified: nothing in
pyspark/jars, no ivy cache — SURVEY.md provenance note), so the
catalog writes Parquet with the SAME logical layout and swaps to real
Iceberg tables transparently when ``iceberg_available()``:

* pages table: the mandated schema ``(url, warc_ts, html, text,
  lang)``, **bucketed by url hash** (``bucket(N, url)`` in Iceberg
  DDL; emulated as a persisted ``url_bucket = pmod(xxhash64(url), N)``
  partition column for Parquet). Point lookups and the id-dictionary
  join prune to one bucket; co-bucketed readers join without a
  shuffle on the Iceberg side.
* edge/vertex snapshots: partitioned by ``pmod(src, N)`` — the same
  hash layout the superstep adjacency uses, so a cold-start
  ``build_adjacency`` reads pre-clustered rows.

At 10^12 documents the bucket count is the lever: 2^14 buckets of
~60M pages keep per-task scan slices in the hundreds of MB; metadata
(one manifest per bucket-partition) stays far below Iceberg's limits.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog class is loadable in this JVM."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


@dataclass
class Catalog:
    spark: SparkSession
    warehouse: str
    num_buckets: int = 32
    format: str = "auto"  # auto | parquet | iceberg

    def _use_iceberg(self) -> bool:
        if self.format == "iceberg":
            return True
        if self.format == "parquet":
            return False
        return iceberg_available(self.spark)

    def _path(self, name: str) -> str:
        return f"{self.warehouse}/{name}"

    # -- pages ----------------------------------------------------------
    def write_pages(self, pages: DataFrame, mode: str = "append") -> None:
        if self._use_iceberg():  # pragma: no cover - no runtime jar here
            (
                pages.writeTo(f"linkgraph.pages")
                .partitionedBy(F.bucket(self.num_buckets, F.col("url")))
                .createOrReplace()
            )
            return
        bucketed = pages.withColumn(
            "url_bucket", F.pmod(F.xxhash64("url"), F.lit(self.num_buckets)).cast("int")
        )
        (
            bucketed.write.mode(mode)
            .partitionBy("url_bucket")
            .parquet(self._path("pages"))
        )

    def read_pages(self) -> DataFrame:
        if self._use_iceberg():  # pragma: no cover
            return self.spark.table("linkgraph.pages")
        return self.spark.read.parquet(self._path("pages")).drop("url_bucket")

    def read_pages_bucket(self, url: str) -> DataFrame:
        """Bucket-pruned point read: only 1/num_buckets of the table is
        scanned (partition pruning on the bucket column — the Parquet
        emulation of Iceberg's bucket transform pruning)."""
        b = None
        df = self.spark.read.parquet(self._path("pages"))
        bucket_expr = F.pmod(F.xxhash64(F.lit(url)), F.lit(self.num_buckets)).cast("int")
        return df.where(F.col("url_bucket") == bucket_expr).where(
            F.col("url") == url
        ).drop("url_bucket")

    # -- graph snapshots -------------------------------------------------
    def write_edges(self, edges: DataFrame, name: str = "edges", mode: str = "overwrite") -> None:
        bucketed = edges.withColumn(
            "src_bucket", F.pmod(F.col("src"), F.lit(self.num_buckets)).cast("int")
        )
        bucketed.write.mode(mode).partitionBy("src_bucket").parquet(self._path(name))

    def read_edges(self, name: str = "edges") -> DataFrame:
        return self.spark.read.parquet(self._path(name)).drop("src_bucket")

    def write_vertices(self, vertices: DataFrame, mode: str = "overwrite") -> None:
        vertices.write.mode(mode).parquet(self._path("vertices"))

    def read_vertices(self) -> DataFrame:
        return self.spark.read.parquet(self._path("vertices"))
