"""Multimodal column plumbing (BASELINE north-star: image/audio/video as
opaque binary columns with typed metadata).

The decode libraries (PIL/ffmpeg/soundfile) are NOT in this container,
so the actual media decoding is stubbed: ``decode_media`` is a real
Arrow-batched mapInPandas operator with the production signature,
schema, and batch shape, whose pixel-decode step is a deterministic
fake (arithmetic on the raw bytes). Swapping ``_fake_decode`` for a real
PIL/ffmpeg call is the only change needed on a cluster with the libs.

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
    """Deterministic stand-in for an image decode: derive fake dimensions
    from the byte length (replace with PIL.Image.open for real data)."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1, "FAKE"


def decode_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode/feature-extract stage as mapInPandas over Arrow batches.

    Real pipelines put the expensive per-item decode here; the operator
    contract (schema in/out, batch iteration, partition preservation) is
    exactly what a PIL/ffmpeg decode needs.
    """
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if HAVE_PIL:
                raise NotImplementedError(
                    "real image decode not wired; container lacks test images"
                )
            dims = [_fake_decode(p) for p in pdf["payload"]]
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
