"""Multimodal decode: real PNG/JPEG/GIF header parsing over binary
payload columns, deterministic fallback for non-image bytes, and the
Arrow-batched operator shape."""

from __future__ import annotations

import struct
import zlib

from glue_jobs_for_data_pipeline_spark.operators import multimodal


def make_png(width: int, height: int) -> bytes:
    """A fully valid (decodable) RGB PNG built with stdlib only."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80\x40\x20" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_jpeg_header(width: int, height: int) -> bytes:
    """SOI + APP0(JFIF) + SOF0 marker stream (the prefix every baseline
    JPEG carries; enough for any header-based size probe)."""
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3) + (
        b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0


def make_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height)


def test_parse_png():
    assert multimodal.parse_image_header(make_png(320, 200)) == (320, 200, "PNG")


def test_parse_jpeg_walks_segments_to_sof():
    assert multimodal.parse_image_header(make_jpeg_header(640, 480)) == (
        640,
        480,
        "JPEG",
    )


def test_parse_gif():
    assert multimodal.parse_image_header(make_gif(16, 9)) == (16, 9, "GIF")


def test_parse_rejects_non_images():
    assert multimodal.parse_image_header(b"plain text bytes") is None
    assert multimodal.parse_image_header(b"") is None
    assert multimodal.parse_image_header(b"\x89PNG\r\n\x1a\nXXXX") is None


def test_decode_one_pil_path_agrees_with_header_parse():
    """When PIL is installed the wider-format path must agree with the
    header parse on a real decodable PNG; without PIL the header parse
    already handled it — both environments give the same answer."""
    png = make_png(12, 34)
    assert multimodal._decode_one(png) == (12, 34, "PNG")
    if multimodal.HAVE_PIL:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(png)) as im:
            assert (im.width, im.height, im.format) == (12, 34, "PNG")


def test_decode_one_falls_back_deterministically():
    w, h, fmt = multimodal._decode_one(b"not an image at all")
    assert fmt == "FAKE" and w >= 1 and h >= 1


def test_decode_media_mixed_batch(spark):
    """The Spark operator over a mixed batch: real images decode to
    their true dimensions, non-image payloads take the fallback."""
    rows = [
        (1, make_png(320, 200)),
        (2, make_jpeg_header(640, 480)),
        (3, make_gif(16, 9)),
        (4, b"just some text bytes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in multimodal.decode_media(df).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["format"]) == (320, 200, "PNG")
    assert (out[2]["width"], out[2]["height"], out[2]["format"]) == (640, 480, "JPEG")
    assert (out[3]["width"], out[3]["height"], out[3]["format"]) == (16, 9, "GIF")
    assert out[4]["format"] == "FAKE"
    assert out[4]["n_bytes"] == len(b"just some text bytes")
