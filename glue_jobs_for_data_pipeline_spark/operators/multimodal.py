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


# Affine gram-hash family for render_thumbnail — chosen < 2^31 so the
# DuckDB oracle can restate the arithmetic exactly in BIGINT.
PHASH_A, PHASH_B, PHASH_P = 1103515245, 12345, 2147483647


def render_thumbnail(text: str) -> bytes:
    """Deterministic 9x8 grayscale 'thumbnail' of a document: cell i's
    luma is the min-hash of the byte 3-grams that land in cell i.
    Fixture synthesis for the image-dedup tier — it gives the documents
    table what stored images have: a raw-bitmap payload that is
    SHIFT-INVARIANT (grams carry no positions, so an insertion doesn't
    smear every later pixel the way a byte-stream view does) and
    EDIT-LOCAL (a small edit changes few grams, so few cells move).
    Real pipelines get these properties from decode + resize; measured
    on the sf0.01 fixture this renderer separates planted near-dups
    (Hamming 0-2) from unrelated docs (>= 10).

    Vectorized AND SQL-reproducible: each byte 3-gram packs INJECTIVELY
    into a 24-bit code (no collisions at the gram level) and an affine
    hash (code*A + B) mod P with P = 2^31 - 1 assigns cell and luma —
    every intermediate stays below 2^56, so a DuckDB oracle can state
    the identical arithmetic in plain BIGINT (catalog_ext's
    _X_PHASH_SIG_CTE does, making the whole image-dedup tier
    hash-checkable end-to-end; that is why this is affine-mod-prime
    and not a 64-bit wraparound mix). ~100x the per-gram-md5 form this
    replaced; the only hash-quality requirement is cell uniformity.
    """
    import numpy as np

    norm = " ".join(text.lower().split()).encode("utf-8", "ignore")
    if len(norm) < 3:
        norm = norm + b"\x00" * (3 - len(norm))
    a = np.frombuffer(norm, dtype=np.uint8).astype(np.int64)
    code = np.unique(a[:-2] | (a[1:-1] << 8) | (a[2:] << 16))
    h = (code * PHASH_A + PHASH_B) % PHASH_P
    n_cells = _DHASH_W * _DHASH_H
    cells = h % n_cells
    vals = (h // n_cells) % 256
    grid = np.full(n_cells, 999, dtype=np.int64)
    np.minimum.at(grid, cells, vals)
    grid[grid == 999] = 0
    return bytes(grid.astype(np.uint8))


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def attach_thumbnail_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, payload): render each document's deterministic raw
    thumbnail via mapInPandas — the fixture's stand-in for an image
    ingest column."""
    import pandas as pd

    def render_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [render_thumbnail(t) for t in pdf[text_col]],
                }
            )

    return df.select(id_col, text_col).mapInPandas(render_batches, THUMB_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)

_DHASH_W, _DHASH_H = 9, 8  # 9x8 luma grid -> 8x8 = 64 difference bits


def _luma_grid(payload: bytes) -> list[list[float]]:
    """The decoded, downsampled grayscale grid dHash runs on.

    Real path: PIL decode -> grayscale -> 9x8 resize when PIL is
    installed and the payload is a decodable image. Fallback (this
    container has no image libs): treat the payload bytes as an 8-bit
    luma stream and average fixed cells — deterministic, total, and
    LOCALITY-PRESERVING (a small byte edit perturbs only the cells it
    lands in), which is the property the downstream Hamming tier needs.
    """
    if HAVE_PIL:
        import io

        try:
            with Image.open(io.BytesIO(payload)) as im:
                small = im.convert("L").resize(
                    (_DHASH_W, _DHASH_H), Image.LANCZOS
                )
                px = list(small.getdata())
                return [
                    [float(px[r * _DHASH_W + c] ) for c in range(_DHASH_W)]
                    for r in range(_DHASH_H)
                ]
        except Exception:
            pass
    n = len(payload)
    cells = _DHASH_W * _DHASH_H
    if n == 0:
        return [[0.0] * _DHASH_W for _ in range(_DHASH_H)]
    grid = []
    for r in range(_DHASH_H):
        row = []
        for c in range(_DHASH_W):
            i = r * _DHASH_W + c
            lo, hi = (i * n) // cells, ((i + 1) * n) // cells
            if hi <= lo:
                hi = lo + 1
            seg = payload[lo:min(hi, n)]
            row.append(sum(seg) / max(len(seg), 1))
        grid.append(row)
    return grid


def dhash64(payload: bytes) -> int:
    """64-bit difference hash: bit (r, c) = [grid[r][c] < grid[r][c+1]]
    over the 9x8 luma grid — the standard dHash, returned as a SIGNED
    64-bit int so it lands in a Spark LongType column."""
    grid = _luma_grid(payload)
    h = 0
    bit = 0
    for r in range(_DHASH_H):
        for c in range(_DHASH_W - 1):
            if grid[r][c] < grid[r][c + 1]:
                h |= 1 << bit
            bit += 1
    if h >= 1 << 63:
        h -= 1 << 64
    return h


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_row", T.IntegerType()),
        T.StructField("out_col", T.IntegerType()),
        T.StructField("luma", T.LongType()),
    ]
)


def resize_luma_grid(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    out_w: int = 3,
    out_h: int = 4,
) -> DataFrame:
    """Image RESIZE as an Arrow batch stage: box-average pooling of the
    raw 9x8 grayscale bitmaps down to ``out_w x out_h`` (area
    interpolation — the resize mode production thumbnailers use for
    downscale). Output is one scalar row per output pixel
    (doc_id, out_row, out_col, luma) so the driver can hash it.

    Pixel math is pure integer (block SUM then floor-div by the block
    size), so a DuckDB oracle can restate it exactly on top of the
    same luma grid the phash twin already rebuilds in SQL
    (catalog_ext._X_PHASH_SIG_BODY's full_grid CTE) — this is the
    operator the brief's decode / feature-extract / RESIZE /
    frame-sample list was missing as a standalone, oracle-checked
    stage. On real images the only change is a PIL/libvips decode in
    front of the pooling (the _luma_grid PIL path); the Spark plumbing
    — binary column in, Arrow batches, scalarized pixels out — is
    identical and is what this verifies.

    Scale shape: map-only (payloads never shuffle); each vector of
    blocks is pooled with one numpy reshape+sum per batch, and the
    output is out_w*out_h thin rows per image.
    """
    import numpy as np
    import pandas as pd

    if _DHASH_W % out_w or _DHASH_H % out_h:
        raise ValueError(
            f"out dims {out_w}x{out_h} must divide the {_DHASH_W}x{_DHASH_H} grid"
        )
    bw, bh = _DHASH_W // out_w, _DHASH_H // out_h

    def resize_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            flat = np.frombuffer(
                b"".join(pdf[payload_col]), dtype=np.uint8
            ).astype(np.int64)
            grids = flat.reshape(n, _DHASH_H, _DHASH_W)
            # (n, out_h, bh, out_w, bw) -> sum each bh x bw block
            pooled = (
                grids.reshape(n, out_h, bh, out_w, bw).sum(axis=(2, 4))
                // (bw * bh)
            )
            ids = np.repeat(pdf[id_col].to_numpy(dtype="int64"), out_h * out_w)
            rows = np.tile(np.repeat(np.arange(out_h), out_w), n)
            cols = np.tile(np.arange(out_w), out_h * n)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "out_row": rows.astype("int32"),
                    "out_col": cols.astype("int32"),
                    "luma": pooled.reshape(-1),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        resize_batches, RESIZE_SCHEMA
    )


def phash_signatures(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, phash): perceptual dHash per payload via mapInPandas —
    the ONE Python stage of the image-dedup pipeline (decode + resize
    is genuinely per-item imperative work; everything after the 8-byte
    signature is JVM-side banding in dedup.hamming_band_pairs)."""
    import pandas as pd

    def hash_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "phash": pd.Series(
                        [dhash64(p) for p in pdf["payload"]], dtype="int64"
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(hash_batches, PHASH_SCHEMA)


def phash_dup_pairs(
    df: DataFrame, id_col: str = "doc_id", max_hamming: int = 6
) -> DataFrame:
    """Image content near-dup pairs: perceptual hash + banded Hamming
    buckets — the multimodal analog of SimHash text dedup, sharing its
    banding engine. 8 bands x 8 bits give a complete candidate set for
    hamming <= 7 (pigeonhole); default threshold 6 of 64 bits is the
    usual 'same image, re-encoded/retouched' operating point.

    Scale shape: payload bytes cross into Python exactly once
    (signature stage); the candidate join shuffles 8-byte hashes, never
    pixels, and is equi-join-bucketed — no all-pairs anywhere. The
    signature frame is cached before banding: unlike SimHash (pure
    codegen'd built-ins, cheaper to recompute than to cache), this
    signature stage decodes payloads in Python, and the band join's
    two branches would otherwise run it twice. Cached blocks are 16
    bytes/image; bench/sweep loops release them via
    dedup.release_caches().
    """
    from .dedup import _cached, hamming_band_pairs

    sigs = _cached(phash_signatures(df, id_col))
    return hamming_band_pairs(
        sigs, id_col="doc_id", sig_col="phash",
        max_hamming=max_hamming, n_bands=8,
    )


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("energy_sum", T.LongType()),
        T.StructField("zero_crossings", T.IntegerType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def audio_frame_features(
    df: DataFrame, id_col: str = "doc_id", frame_size: int = 64
) -> DataFrame:
    """Audio decode + framed feature extraction as ONE Arrow-batched
    mapInPandas pass: the payload bytes are read as unsigned 8-bit PCM
    (the U8 WAV sample format), centered to [-128, 127], framed into
    ``frame_size``-sample windows (the tail frame keeps its partial
    length), and each frame emits the three classic speech-curation
    features — energy (sum of squares), zero-crossing count, and peak
    amplitude — all in exact integer arithmetic so the stage is
    bit-reproducible across engines (the DuckDB twin in
    plans/media_pack.py restates the same sums).

    This is the real operator shape for audio corpus curation (VAD,
    silence trimming, clipping detection run on exactly these frames);
    a codec decode (mp3/flac) would slot into the same batch loop,
    which is why it is mapInPandas and not a column expression.

    Scale shape: map-only — no shuffle, output partitioning inherits
    the input; memory is bounded by the Arrow batch size times the
    frame fan-out, never by partition size. NumPy does the per-payload
    work vectorized; the per-row Python loop touches only ~n/frame_size
    frame descriptors per doc.
    """
    import numpy as np
    import pandas as pd

    def feature_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids: list[int] = []
            fidx: list[int] = []
            ns: list[int] = []
            es: list[int] = []
            zc: list[int] = []
            pk: list[int] = []
            for did, p in zip(pdf[id_col], pdf["payload"]):
                a = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64) - 128
                for k, lo in enumerate(range(0, a.size, frame_size)):
                    seg = a[lo : lo + frame_size]
                    neg = seg < 0
                    ids.append(int(did))
                    fidx.append(k)
                    ns.append(int(seg.size))
                    es.append(int(np.dot(seg, seg)))
                    zc.append(int(np.count_nonzero(neg[:-1] != neg[1:])))
                    pk.append(int(np.abs(seg).max()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "energy_sum": pd.Series(es, dtype="int64"),
                    "zero_crossings": pd.Series(zc, dtype="int32"),
                    "peak": pd.Series(pk, dtype="int32"),
                }
            )

    return df.select(F.col(id_col), "payload").mapInPandas(
        feature_batches, AUDIO_FRAME_SCHEMA
    )


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
