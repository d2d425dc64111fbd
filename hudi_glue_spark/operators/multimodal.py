"""Multimodal column plumbing (§2b): opaque binary payloads with typed
metadata, processed through Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the DECODE step is
stubbed (clearly marked) — but everything Spark-side is real and tested:
the binary column schema, the ``mapInPandas`` batch iteration, the
output schema contract, and a deterministic metadata extractor whose
results are verified against a SQL oracle (a genuine differential test
of the Arrow/pandas path).

At 100 TB, payloads should be *pointers* (path/offset/length into blob
storage) with bytes materialized only inside the decode stage —
``payload_pointer`` models that; carrying raw bytes through shuffles is
the anti-pattern.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the metadata extractor (mapInPandas contract).
MEDIA_META_SCHEMA = (
    "doc_id long, byte_len int, checksum string, fake_width int, fake_height int"
)


def text_as_payload(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Model a multimodal table from the documents fixture: the text's
    UTF-8 bytes stand in for an image/audio blob, plus typed metadata."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("media_type"), F.lit("fake/blob"),
            F.lit("source"), F.col("source"),
        ).alias("media_meta"),
    )


def payload_pointer(df: DataFrame, path_col: str, offset_col: str, length_col: str) -> DataFrame:
    """Pointer-style payload (path + byte range) — the 100 TB layout:
    bytes stay in blob storage until the decode stage reads them."""
    return df.withColumn(
        "payload_ptr",
        F.struct(
            F.col(path_col).alias("path"),
            F.col(offset_col).cast("long").alias("offset"),
            F.col(length_col).cast("long").alias("length"),
        ),
    )


def _extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-Arrow-batch metadata extraction. Deterministic 'decode':
    md5 checksum + fake dimensions derived from it (stands in for a
    real image decode; same shape of computation, testable)."""
    for pdf in batches:
        payloads = pdf["payload"]
        sums = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len).astype("int32"),
                "checksum": sums,
                "fake_width": sums.map(lambda h: 1 + int(h[:4], 16) % 512).astype("int32"),
                "fake_height": sums.map(lambda h: 1 + int(h[4:8], 16) % 512).astype("int32"),
            }
        )


def extract_media_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the payload column.

    ``mapInPandas`` (not a row UDF): payload bytes cross the JVM→Python
    boundary once per Arrow batch. Partition count of the input is
    preserved — repartition upstream to size decode parallelism."""
    return df.select("doc_id", "payload").mapInPandas(_extract_batch, MEDIA_META_SCHEMA)


#: Output schema of the frame sampler (one row per sampled frame).
FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_off int, frame_len int, frame_checksum string"
)


def sample_frames(df: DataFrame, n_frames: int = 4, frame_bytes: int = 256) -> DataFrame:
    """Video-style frame sampling over binary payloads: ``n_frames``
    evenly spaced byte ranges per payload, checksummed — the row-explode
    shape of real frame extraction (1 payload row → k frame rows)
    through ``mapInPandas``, with a deterministic stand-in for the codec
    (the container ships no video libs; a real implementation replaces
    only the slice-and-hash with decode-and-sample).

    Offsets are ``(i·len)//n_frames`` — deterministic, length-adaptive,
    and SQL-reproducible, so the whole Arrow explode path is
    oracle-checkable."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens, sums = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(n_frames):
                    off = (i * len(raw)) // n_frames
                    chunk = raw[off : off + frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(off)
                    lens.append(len(chunk))
                    sums.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_off": pd.Series(offs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_checksum": pd.Series(sums, dtype="object"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_sample, FRAME_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """STUB: real image decode (PIL/opencv are not in this container).

    The Spark plumbing (schema contract, Arrow batching) is identical to
    :func:`extract_media_meta`; only the per-batch body differs."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires Pillow, not available in this environment; "
                "use extract_media_meta for the tested plumbing path"
            ) from e
        raise NotImplementedError("wire PIL decode here")

    return df.mapInPandas(_decode, "doc_id long, width int, height int, mode string")
