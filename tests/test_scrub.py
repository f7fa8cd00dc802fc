"""PII scrubbing + corpus-unigram LM scoring (linkgraph/functions/scrub.py)."""

import math

import pytest
from pyspark.sql import functions as F

from linkgraph.functions.scrub import pii_scrub_table, unigram_logprob


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_and_redaction(spark):
    docs = _docs(
        spark,
        [
            (0, "mail bob.smith+x@mail.example.org end"),
            (1, "ssn 123-45-6789 tel 555-010-6789 ip 10.0.0.1"),
            (2, "no pii here"),
            (3, "two mails a@b.co c@d.io and ip 192.168.001.255"),
        ],
    )
    got = {r["doc_id"]: r for r in pii_scrub_table(docs).collect()}
    assert (got[0]["n_email"], got[0]["scrubbed"]) == (1, "mail <EMAIL> end")
    assert (got[1]["n_ssn"], got[1]["n_phone"], got[1]["n_ipv4"]) == (1, 1, 1)
    assert got[1]["scrubbed"] == "ssn <SSN> tel <PHONE> ip <IP>"
    assert got[2]["scrubbed"] == "no pii here"
    assert got[3]["n_email"] == 2 and got[3]["n_ipv4"] == 1
    assert got[3]["scrubbed"] == "two mails <EMAIL> <EMAIL> and ip <IP>"


def test_email_redacted_before_numeric_patterns(spark):
    # digits + dots inside an email local part must not leak <IP>/<PHONE>
    docs = _docs(spark, [(0, "x 10.0.0.1.user@example.com y")])
    row = pii_scrub_table(docs).collect()[0]
    assert row["scrubbed"] == "x <EMAIL> y"
    assert row["n_ipv4"] == 1  # counts are on raw text by contract


def test_unigram_logprob_hand_computed(spark):
    # corpus counts: a=3, b=2, c=1 (total 6)
    docs = _docs(spark, [(0, "a a b"), (1, "a b c"), (2, "   ")])
    got = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    lp = lambda c: math.log(c / 6.0)
    assert got[0]["avg_logprob"] == pytest.approx((2 * lp(3) + lp(2)) / 3, abs=1e-12)
    assert got[1]["avg_logprob"] == pytest.approx((lp(3) + lp(2) + lp(1)) / 3, abs=1e-12)
    assert got[2]["n_tokens"] == 0 and got[2]["avg_logprob"] is None
    assert got[0]["n_tokens"] == 3
