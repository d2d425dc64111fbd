"""Source-reader and multimodal plumbing tests."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hudi_glue_spark.operators.multimodal import sample_frames, text_as_payload
from hudi_glue_spark.sources.readers import read_csv


def test_read_csv_schema_and_glob(spark, tmp_path):
    """Schema'd CSV scan with header + glob (§2a #1 parity)."""
    for i, rows in enumerate([[(1, "a", 1.5)], [(2, "b", 2.5)]]):
        p = tmp_path / f"part{i}"
        spark.createDataFrame(rows, "id int, name string, score double").coalesce(
            1
        ).write.option("header", True).csv(str(p))
    df = read_csv(
        spark,
        f"{tmp_path}/part*",
        schema="id int, name string, score double",
        header=True,
    )
    got = {(r["id"], r["name"], r["score"]) for r in df.collect()}
    assert got == {(1, "a", 1.5), (2, "b", 2.5)}
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "int", "string", "double",
    ]


def test_sample_frames_matches_python(spark):
    """The Arrow explode path must equal a plain-Python re-derivation."""
    rows = [(1, "x" * 1000), (2, "hello world"), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "source", F.lit("s")
    )
    payload = text_as_payload(docs, "doc_id", "text")
    got = {
        (r["doc_id"], r["frame_idx"]): (
            r["frame_off"], r["frame_len"], r["frame_checksum"]
        )
        for r in sample_frames(payload, n_frames=4, frame_bytes=16).collect()
    }
    assert len(got) == 12
    for doc_id, text in rows:
        raw = text.encode()
        for i in range(4):
            off = (i * len(raw)) // 4
            chunk = raw[off : off + 16]
            assert got[(doc_id, i)] == (
                off, len(chunk), hashlib.md5(chunk).hexdigest()
            )
