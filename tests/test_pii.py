"""PII redaction (functions/pii.py): Java-regex vs RE2 parity on an
adversarial string battery, chain-order semantics, and count/token
consistency.  The ``pii_redaction`` driver oracle covers the planted
corpus; this battery covers the corners planting can't reach."""

import duckdb
import pytest
from pyspark.sql import functions as F

from neuroner_spark.functions.pii import (
    EMAIL_TOKEN,
    IP_TOKEN,
    PHONE_TOKEN,
    pii_counts,
    pii_sql_exprs,
    redact_pii,
)

BATTERY = [
    "plain text, no pii at all",
    "a.b+c_d%e@mail.example.co.uk trailing",
    "double dots ok a..b@x.io and bare @ not an email x@y",
    "ip 10.1.2.3 inside, version 1.2.3.4.5 eats prefix",
    "(555) 123-4567 paren form",
    "dotted 555.123.4567 and dashed 555-123-4567 and bare 5551234567",
    "phone after ip 1.2.3.4 555-123-4567",
    "email with digits user123@10x.example.com then 999.999.999.999",
    "overlap trap 123.456.7890 is a phone not an ip",
    "unicode around héllo user@example.com wörld 10.0.0.1 done",
    "tight x@y.zz,10.0.0.1,(555) 123-4567;end",
    "at end user@example.com",
    "10.0.0.1",
    "(555) 123-4567",
    "",
    "version v1.2.3 date 2024.01.02 and build 10.20.30.40.50.60",
]


@pytest.fixture(scope="module")
def frames(spark):
    rows = [(i, s) for i, s in enumerate(BATTERY)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    red = redact_pii(F.col("text"))
    got = {
        r["doc_id"]: r.asDict()
        for r in sdf.select(
            "doc_id", *pii_counts(F.col("text")), red.alias("redacted")
        ).collect()
    }
    con = duckdb.connect()
    e = pii_sql_exprs("text")
    con.sql("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        r[0]: {"doc_id": r[0], "n_email": r[1], "n_ip": r[2], "n_phone": r[3], "redacted": r[4]}
        for r in con.sql(
            f"SELECT doc_id, {e['n_email']}, {e['n_ip']}, {e['n_phone']}, {e['redacted']} FROM t"
        ).fetchall()
    }
    return got, want


def test_engine_parity_bytes(frames):
    got, want = frames
    for i, s in enumerate(BATTERY):
        assert got[i]["redacted"] == want[i]["redacted"], (i, s)
        for k in ("n_email", "n_ip", "n_phone"):
            assert got[i][k] == want[i][k], (i, s, k)


def test_counts_match_inserted_tokens(frames):
    got, _ = frames
    for i in range(len(BATTERY)):
        r = got[i]
        assert r["redacted"].count(EMAIL_TOKEN) == r["n_email"], i
        assert r["redacted"].count(IP_TOKEN) == r["n_ip"], i
        assert r["redacted"].count(PHONE_TOKEN) == r["n_phone"], i


def test_specific_semantics(frames):
    got, _ = frames
    by_text = {BATTERY[i]: got[i]["redacted"] for i in range(len(BATTERY))}
    # version string: IP takes the 4-octet prefix, remainder survives
    assert "<IP>.5" in by_text["ip 10.1.2.3 inside, version 1.2.3.4.5 eats prefix"]
    # 3-3-4 dotted shape is a phone, never an IP (only 2 dots)
    assert by_text["overlap trap 123.456.7890 is a phone not an ip"] == (
        "overlap trap <PHONE> is a phone not an ip"
    )
    # bare 10 digits without separators deliberately not matched
    assert "5551234567" in by_text[
        "dotted 555.123.4567 and dashed 555-123-4567 and bare 5551234567"
    ]
    assert by_text[""] == ""
    assert by_text["10.0.0.1"] == "<IP>"
    assert by_text["(555) 123-4567"] == "<PHONE>"


def test_redaction_idempotent(spark):
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(BATTERY)], "doc_id long, text string")
    once = sdf.select("doc_id", redact_pii(F.col("text")).alias("text"))
    twice = once.select("doc_id", redact_pii(F.col("text")).alias("text"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
