"""PII scrub (operators/pii.py): unit behavior on real PII shapes +
cross-engine parity of the exact count/replace expressions (the
registered doc_pii_scrub query is additionally parity-checked over
the documents table by test_oracle_parity)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from recsys_spark_spark.operators.pii import (
    pii_counts,
    pii_counts_sql,
    pii_scrub,
    pii_scrub_sql,
)

CASES = [
    # (raw, expected_clean, n_emails, n_ips, n_phones)
    (
        "contact jane.doe+spam@sub.example.co.uk for details",
        "contact <EMAIL> for details",
        1, 0, 0,
    ),
    (
        "server at 192.168.0.1 and 10.0.255.7:8080 replied",
        "server at <IP> and <IP>:8080 replied",
        0, 2, 0,
    ),
    (
        "call +49-30-1234 or +1 555 0199 2211 now",
        "call <PHONE> or <PHONE> now",
        0, 0, 2,
    ),
    (
        "mail bob123@h4.example.com from 8.8.8.8 or +33-12-34-56-78",
        "mail <EMAIL> from <IP> or <PHONE>",
        1, 1, 1,
    ),
    # no PII: text passes through untouched, digit runs/years survive
    (
        "released in 2024 with 3.14159 accuracy at version 1.2",
        "released in 2024 with 3.14159 accuracy at version 1.2",
        0, 0, 0,
    ),
    # version-ish quad IS matched (documented recall-over-precision)
    ("upgrade to 1.2.3.4 now", "upgrade to <IP> now", 0, 1, 0),
    ("", "", 0, 0, 0),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, *_rest) in enumerate(CASES)], "id long, t string"
    )
    ne, ni, np_ = pii_counts(F.col("t"))
    return {
        r["id"]: r
        for r in df.select(
            "id",
            ne.cast("int").alias("n_emails"),
            ni.cast("int").alias("n_ips"),
            np_.cast("int").alias("n_phones"),
            pii_scrub(F.col("t")).alias("clean"),
        ).collect()
    }


@pytest.mark.parametrize("i", range(len(CASES)))
def test_scrub_and_counts(scrubbed, i):
    raw, clean, ne, ni, np_ = CASES[i]
    row = scrubbed[i]
    assert row["clean"] == clean, f"case {i}: {raw!r} -> {row['clean']!r}"
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (ne, ni, np_)


def test_fuzz_cross_engine_parity(spark):
    """Derandomized fuzz: 300 seeded random strings over a PII-heavy
    alphabet (digits, dots, @, +, -, letters) must scrub and count
    identically in Spark and DuckDB — probes match-boundary behavior
    the hand-written cases don't reach.  One Spark job + one DuckDB
    query (not per-example) to keep it fast."""
    import random

    rng = random.Random(0x9117)
    alphabet = "ab1.@+- 9@.x0"
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "id long, t string"
    )
    ne, ni, np_ = pii_counts(F.col("t"))
    got = {
        r["id"]: (r["n_emails"], r["n_ips"], r["n_phones"], r["clean"])
        for r in df.select(
            "id",
            ne.cast("int").alias("n_emails"),
            ni.cast("int").alias("n_ips"),
            np_.cast("int").alias("n_phones"),
            pii_scrub(F.col("t")).alias("clean"),
        ).collect()
    }
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE fuzz (id BIGINT, t VARCHAR)")
        con.executemany(
            "INSERT INTO fuzz VALUES (?, ?)", list(enumerate(cases))
        )
        want = {
            row[0]: tuple(row[1:])
            for row in con.execute(
                f"SELECT id, {pii_counts_sql('t')}, "
                f"{pii_scrub_sql('t')} AS clean FROM fuzz"
            ).fetchall()
        }
    finally:
        con.close()
    assert got == want


def test_duckdb_twin_matches_spark(scrubbed):
    """The SQL twins replay the exact same redaction on every case —
    the property the driver's value-hash gate relies on."""
    con = duckdb.connect()
    try:
        for i, (raw, *_rest) in enumerate(CASES):
            got = con.execute(
                f"SELECT {pii_counts_sql('?')}, {pii_scrub_sql('?')} AS clean",
                [raw, raw, raw, raw],
            ).fetchone()
            row = scrubbed[i]
            assert got == (
                row["n_emails"],
                row["n_ips"],
                row["n_phones"],
                row["clean"],
            ), f"case {i}: duckdb {got} vs spark"
    finally:
        con.close()
