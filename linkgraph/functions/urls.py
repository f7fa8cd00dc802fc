"""URL column functions — JVM-side parsing for link-graph ingest.

All expressions compile to built-in Spark SQL functions
(``parse_url``, ``regexp_replace``) — no Python in the path. The
extraction UDF (sources/extract.py) keeps its own byte-exact Python
normalizer for parity with the reference extractor; these column
forms are the at-scale ergonomics for edge tables that already hold
URL strings (host graphs, domain rollups, tracking-param hygiene).

``registered_domain`` is the standard last-two-labels approximation
(a full public-suffix list is a broadcast dictionary join — seam
documented, not shipped: no list in this sandbox).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_host(url: Column) -> Column:
    """Hostname (lowercased); NULL for unparseable input."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def url_path(url: Column) -> Column:
    return F.parse_url(url, F.lit("PATH"))


def url_query(url: Column) -> Column:
    return F.parse_url(url, F.lit("QUERY"))


def is_https(url: Column) -> Column:
    return F.startswith(F.lower(url), F.lit("https://"))


def registered_domain(url: Column) -> Column:
    """Last two dot-labels of the host ('a.b.c.com' -> 'c.com')."""
    h = url_host(url)
    return F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)


def path_depth(url: Column) -> Column:
    """Number of non-empty path segments."""
    p = F.regexp_replace(F.coalesce(url_path(url), F.lit("")), r"^/+|/+$", "")
    return F.when(F.length(p) == 0, F.lit(0)).otherwise(
        F.size(F.split(p, "/+"))
    )


def strip_tracking_params(url: Column) -> Column:
    """Remove utm_*/gclid/fbclid query params (and a dangling ? or &)."""
    out = F.regexp_replace(
        url, r"(utm_[a-z]+|gclid|fbclid)=[^&#]*&?", ""
    )
    return F.regexp_replace(out, r"[?&]$", "")
