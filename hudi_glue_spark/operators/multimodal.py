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


# -- image decode (pure-Python container formats) ---------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type → sample channels (spec table 11.1).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: JPEG markers that are NOT frame headers inside the 0xC0-0xCF range.
_JPEG_NON_SOF = {0xC4, 0xC8, 0xCC}

IMAGE_META_SCHEMA = (
    "doc_id long, format string, width int, height int, channels int"
)


def parse_image_header(raw: bytes) -> tuple:
    """(format, width, height, channels) from PNG/JPEG/GIF container
    bytes — a dependency-free decoder for the dimensions/type metadata
    a curation pipeline filters on (full pixel decode still needs an
    imaging lib; this parses the real container headers, not a fake).
    Unknown/corrupt payloads yield (None, None, None, None)."""
    import struct

    if raw[:8] == _PNG_SIG and raw[12:16] == b"IHDR" and len(raw) >= 26:
        w, h = struct.unpack(">II", raw[16:24])
        return ("png", w, h, _PNG_CHANNELS.get(raw[25]))
    if raw[:2] == b"\xff\xd8":  # SOI
        i = 2
        while i + 9 < len(raw):
            if raw[i] != 0xFF:
                break
            marker = raw[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # bare markers
                i += 2
                continue
            if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
                h = int.from_bytes(raw[i + 5 : i + 7], "big")
                w = int.from_bytes(raw[i + 7 : i + 9], "big")
                return ("jpeg", w, h, raw[i + 9])
            i += 2 + int.from_bytes(raw[i + 2 : i + 4], "big")
    if raw[:6] in (b"GIF87a", b"GIF89a") and len(raw) >= 10:
        w = int.from_bytes(raw[6:8], "little")
        h = int.from_bytes(raw[8:10], "little")
        return ("gif", w, h, 3)
    return (None, None, None, None)


def decode_image(df: DataFrame) -> DataFrame:
    """Decode image container headers (PNG / JPEG SOF / GIF) from the
    ``payload`` binary column into typed metadata — Arrow-batched
    ``mapInPandas``, same plumbing as :func:`extract_media_meta`.

    A full pixel decode would swap :func:`parse_image_header` for a
    PIL/opencv call inside the same batch loop; the header path is the
    one curation filters (size/aspect/format) actually need, and it
    runs with zero native dependencies."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_image_header(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": pd.Series([m[0] for m in metas], dtype="object"),
                    "width": pd.array([m[1] for m in metas], dtype="Int32"),
                    "height": pd.array([m[2] for m in metas], dtype="Int32"),
                    "channels": pd.array([m[3] for m in metas], dtype="Int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(_decode, IMAGE_META_SCHEMA)


def png_bytes(w: int, h: int) -> bytes:
    """A real, minimal 8-bit grayscale PNG (IHDR + zlib IDAT + IEND) —
    stdlib-only synthetic fixture for exercising the decode path."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def jpeg_bytes(w: int, h: int) -> bytes:
    """Minimal JFIF byte stream (SOI + APP0 + SOF0 + EOI) with real
    marker structure — enough for any header parser; no entropy data."""
    import struct

    app0 = (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 72, 72)
        + b"\x00\x00"
    )
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def encode_test_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic image payloads: even ids → real PNG,
    odd ids → JFIF header stream, dims derived from the id (width
    1+id%64, height 1+(id·7)%64) so an oracle can predict the decoded
    metadata arithmetically."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 1 + i % 64, 1 + (i * 7) % 64
                payloads.append(png_bytes(w, h) if i % 2 == 0 else jpeg_bytes(w, h))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(
        _encode, "doc_id long, payload binary"
    )
