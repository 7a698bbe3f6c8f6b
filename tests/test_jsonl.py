"""JSONL source/sink: round-trip parity with the parquet documents
table, gzip compression, and corrupt-line quarantine."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from recsys_spark_spark.sources.readers import read_documents_jsonl, table
from recsys_spark_spark.sources.writers import write_jsonl


def test_jsonl_roundtrip_documents(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_jsonl")
    docs = table(spark, sf_dir, "documents")
    write_jsonl(docs, out)  # gzip default

    files = os.listdir(out)
    assert any(f.endswith(".json.gz") for f in files), files

    # cache first: Spark refuses queries touching ONLY the corrupt
    # column on a raw JSON scan (see reader docstring)
    back = read_documents_jsonl(spark, out).cache()
    assert back.where(F.col("_corrupt_record").isNotNull()).count() == 0
    cols = ["doc_id", "source", "lang", "text", "n_chars"]
    want = sorted(tuple(r[c] for c in cols) for r in docs.select(cols).collect())
    got = sorted(tuple(r[c] for c in cols) for r in back.select(cols).collect())
    assert got == want


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "source": "web", "lang": "en", "text": "hello world", "n_chars": 11}\n'
        "this line is not json at all\n"
        '{"doc_id": 2, "source": "web", "lang": "de", "text": "hallo", "n_chars": 5}\n'
    )
    back = read_documents_jsonl(spark, str(p)).cache()
    good = back.where(F.col("_corrupt_record").isNull())
    bad = back.where(F.col("_corrupt_record").isNotNull())
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    assert bad.count() == 1
    assert "not json" in bad.first()["_corrupt_record"]
    back.unpersist()
