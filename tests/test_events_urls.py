"""Unit tests for sessionization and URL column functions."""

import datetime as dt

import pyspark.sql.functions as F

from linkgraph.functions.events import extract_prop, session_stats, sessionize
from linkgraph.functions.urls import (
    is_https,
    path_depth,
    registered_domain,
    strip_tracking_params,
    url_host,
)


def _ev(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: 3 events in one session, then a 2h gap -> new session
        (1, t0, "view", "{\"k\": 3}"),
        (1, t0 + dt.timedelta(minutes=5), "click", "{\"k\": 4}"),
        (1, t0 + dt.timedelta(minutes=10), "view", "{\"k\": 5}"),
        (1, t0 + dt.timedelta(hours=3), "view", "{\"k\": 6}"),
        # user 2: single event
        (2, t0, "error", "{\"k\": 9}"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, props string"
    )


def test_sessionize_boundaries(spark):
    s = sessionize(_ev(spark), gap_seconds=3600)
    got = {(r["user_id"], r["ts"].minute + 60 * r["ts"].hour): r["session_seq"]
           for r in s.collect()}
    assert got[(1, 0)] == 1 and got[(1, 5)] == 1 and got[(1, 10)] == 1
    assert got[(1, 180)] == 2
    assert got[(2, 0)] == 1


def test_session_stats(spark):
    st = {(r["user_id"], r["session_seq"]): r
          for r in session_stats(_ev(spark), gap_seconds=3600).collect()}
    a = st[(1, 1)]
    assert a["n_events"] == 3 and a["duration_us"] == 10 * 60 * 1_000_000
    assert a["n_types"] == 2
    assert st[(1, 2)]["n_events"] == 1 and st[(1, 2)]["duration_us"] == 0
    assert st[(2, 1)]["n_events"] == 1


def test_extract_prop(spark):
    got = {r["user_id"]: r["prop_k"]
           for r in extract_prop(_ev(spark), "k").collect() if r["ts"].hour == 0
           and r["ts"].minute == 0}
    assert got == {1: 3, 2: 9}


def test_url_functions(spark):
    urls = [
        (1, "https://a.b.shop.example.com/c/42/items?utm_source=feed&pid=42"),
        (2, "http://example.org/"),
        (3, "https://example.org"),
    ]
    df = spark.createDataFrame(urls, "id long, url string")
    out = {r["id"]: r for r in df.select(
        "id",
        url_host(F.col("url")).alias("h"),
        registered_domain(F.col("url")).alias("d"),
        path_depth(F.col("url")).alias("n"),
        is_https(F.col("url")).alias("s"),
        strip_tracking_params(F.col("url")).alias("c"),
    ).collect()}
    assert out[1]["h"] == "a.b.shop.example.com"
    assert out[1]["d"] == "example.com"
    assert out[1]["n"] == 3
    assert out[1]["s"] is True
    assert out[1]["c"] == "https://a.b.shop.example.com/c/42/items?pid=42"
    assert out[2]["h"] == "example.org" and out[2]["n"] == 0 and out[2]["s"] is False
    assert out[3]["n"] == 0
