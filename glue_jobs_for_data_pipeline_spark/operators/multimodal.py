"""Multimodal column plumbing (BASELINE north-star: image/audio/video as
opaque binary columns with typed metadata).

``decode_media`` is an Arrow-batched mapInPandas operator whose decode
step is REAL for images: PNG / JPEG / GIF dimensions and format are
parsed from the byte headers in pure stdlib (no decode library needed),
and PIL is used for any other format when it is installed. Payloads
that are not recognizable images (e.g. the text-byte fixtures) fall
through to a deterministic stand-in so the operator is total and its
output reproducible in any environment.

Scale notes: binary payloads stay opaque through the plan (no JVM<->
Python crossing until the decode stage); mapInPandas streams Arrow
record batches so memory is bounded by batch size, not partition size;
metadata lands in ordinary columns so Catalyst can prune/filter on it
without touching bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoders, if ever present on the cluster
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture plumbing: treat each document's utf-8 bytes as an opaque
    media payload + typed metadata (what a real ingest would carry)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_meta",
        F.struct(
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit("fake/binary").alias("mime"),
        ),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for payloads that are not recognizable
    images: derive fake dimensions from the byte length so the operator
    is total and reproducible in any environment."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1, "FAKE"


_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}  # SOFn markers


def parse_image_header(payload: bytes) -> tuple[int, int, str] | None:
    """(width, height, format) from PNG/JPEG/GIF byte headers, pure
    stdlib — the published container magics, no decode library. Returns
    None for anything unrecognized. Format names match PIL's."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        # first chunk is IHDR: width/height are big-endian u32 at 16/20
        if payload[12:16] == b"IHDR":
            return (
                int.from_bytes(payload[16:20], "big"),
                int.from_bytes(payload[20:24], "big"),
                "PNG",
            )
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        # logical screen width/height: little-endian u16 at 6/8
        return (
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
            "GIF",
        )
    if payload[:2] == b"\xff\xd8":
        # walk marker segments to the first SOFn frame header, which
        # carries height (u16 BE at +5) then width (u16 BE at +7)
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if 0xD0 <= marker <= 0xD9:  # RST/SOI/EOI: no length field
                i += 2
                continue
            if marker in _JPEG_SOF:
                return (
                    int.from_bytes(payload[i + 7 : i + 9], "big"),
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                    "JPEG",
                )
            i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
        return None
    return None


def _decode_one(payload: bytes) -> tuple[int, int, str]:
    """Decode one payload's image metadata: header parse for the common
    container formats (deterministic, dependency-free), PIL for anything
    else when installed, fake stand-in otherwise."""
    parsed = parse_image_header(payload)
    if parsed is not None:
        return parsed
    if HAVE_PIL:
        import io

        try:
            with Image.open(io.BytesIO(payload)) as im:
                return im.width, im.height, im.format or "UNKNOWN"
        except Exception:
            pass
    return _fake_decode(payload)


def decode_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode/feature-extract stage as mapInPandas over Arrow batches.

    Real pipelines put the expensive per-item decode here; binary
    payloads stay opaque until this stage, and the decode itself is
    real for PNG/JPEG/GIF (header parse) with PIL as the wider-format
    path when present.
    """
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            dims = [_decode_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "format": [d[2] for d in dims],
                }
            )

    return df.select(id_col, "payload").mapInPandas(decode_batches, DECODED_SCHEMA)


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", every_n_bytes: int = 100
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: one output row per
    sampled "frame". Frame count derives deterministically from payload
    size (a real impl reads container metadata); the explode pattern —
    one input row fanning out to per-frame rows with an index — is the
    real operator shape, built-in (no UDF).
    """
    n_frames = (F.octet_length("payload") / F.lit(every_n_bytes)).cast("int") + 1
    return df.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_f"),
    ).select(
        id_col,
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).alias("byte_offset"),
    )
