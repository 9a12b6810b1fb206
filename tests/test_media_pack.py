"""Audio/video curation tier: framed 8-bit-PCM features, VAD-style
gaps-and-islands segmentation, and luma-delta scene cuts — checked
against pure-Python references on crafted payloads plus plan-shape
assertions (the oracle twins hash-check the fixture end-to-end)."""

from __future__ import annotations

from glue_jobs_for_data_pipeline_spark.operators import multimodal


def _py_frames(payload: bytes, frame_size: int = 64):
    """Reference implementation of audio_frame_features for one payload."""
    a = [b - 128 for b in payload]
    out = []
    for k, lo in enumerate(range(0, len(a), frame_size)):
        seg = a[lo : lo + frame_size]
        zc = sum(
            1 for i in range(len(seg) - 1) if (seg[i] < 0) != (seg[i + 1] < 0)
        )
        out.append(
            {
                "frame_idx": k,
                "n_samples": len(seg),
                "energy_sum": sum(x * x for x in seg),
                "zero_crossings": zc,
                "peak": max(abs(x) for x in seg),
            }
        )
    return out


def test_audio_frames_match_reference_incl_partial_tail(spark):
    payloads = [
        (1, b"hello world " * 11),  # 132 bytes -> 3 frames, tail of 4
        (2, bytes(range(0, 256))),  # crosses the 128 sign boundary
        (3, b"\x80" * 64),  # exactly one full frame, all zeros centered
        (4, b"x"),  # single-sample frame
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = multimodal.audio_frame_features(df).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, payload in payloads:
        want = _py_frames(payload)
        have = sorted(by_doc[did], key=lambda r: r["frame_idx"])
        assert len(have) == len(want)
        for h, w in zip(have, want):
            for k in ("frame_idx", "n_samples", "energy_sum", "zero_crossings", "peak"):
                assert h[k] == w[k], (did, k, h[k], w[k])


def test_audio_frames_zero_centered_sign_convention():
    """byte 128 centers to 0, which counts as non-negative: 127,128
    (values -1,0) IS a crossing; 128,129 (0,+1) is not."""
    ref = _py_frames(bytes([127, 128, 129, 127]), frame_size=4)
    assert ref[0]["zero_crossings"] == 2  # (-1,0) crosses, (0,+1) no, (+1,-1) crosses


def test_audio_empty_payload_emits_no_frames(spark):
    df = spark.createDataFrame([(1, b"")], "doc_id long, payload binary")
    assert multimodal.audio_frame_features(df).count() == 0


def test_vad_segments_islands(spark, sf_dir):
    """Segments are maximal runs: within a doc, segment frame ranges are
    disjoint, non-adjacent (a gap separates them), and every covered
    frame is active under the threshold the query states."""
    from glue_jobs_for_data_pipeline_spark.plans import media_pack  # noqa: F401
    from glue_jobs_for_data_pipeline_spark.plans.catalog import QUERIES

    segs = QUERIES["x_mm_audio_vad_segments"](spark, sf_dir).collect()
    assert len(segs) > 0
    by_doc: dict[int, list] = {}
    for r in segs:
        assert r["start_frame"] <= r["end_frame"]
        assert r["n_frames"] == r["end_frame"] - r["start_frame"] + 1
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["start_frame"])
        for a, b in zip(rows, rows[1:]):
            assert a["end_frame"] + 1 < b["start_frame"]  # maximal runs


def test_scene_cuts_locality(spark):
    """A payload that switches byte regime mid-stream yields exactly one
    cut, at the boundary frame."""
    text = "a" * 96 + " " * 96  # luma 97 vs 32 per byte, frames of 32
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from glue_jobs_for_data_pipeline_spark.plans.media_pack import (
        x_mm_video_scene_cuts,
    )

    # run the same plan body over a crafted frame: reuse the query's
    # internals by registering the df as the documents table via a
    # temp parquet dir
    import tempfile

    d = tempfile.mkdtemp(prefix="spark_graft_media_")
    df.write.mode("overwrite").parquet(d + "/documents.parquet")
    out = x_mm_video_scene_cuts(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["frame_idx"] == 3  # first all-space frame
    assert r["delta"] == (32 - 97) * 32


def test_media_queries_are_udf_free_except_audio_decode(spark, sf_dir):
    """Plan shape: scene cuts stay entirely JVM-side (no Python node);
    the audio tier's only Python crossing is the Arrow decode stage."""
    from glue_jobs_for_data_pipeline_spark.plans import media_pack
    from glue_jobs_for_data_pipeline_spark.plans.catalog import QUERIES

    cuts_plan = (
        QUERIES["x_mm_video_scene_cuts"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "InPandas" not in cuts_plan and "BatchEvalPython" not in cuts_plan

    audio_plan = (
        QUERIES["x_mm_audio_features"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert audio_plan.count("InPandas") == 1
    assert "BatchEvalPython" not in audio_plan


def test_audio_resample_hand_check(spark, tmp_path):
    """'abcd' -> one 4-sample block: sum = 97+98+99+100-512 = -118."""
    import pandas as pd

    pd.DataFrame({"doc_id": [1], "text": ["abcd"]}).to_parquet(
        str(tmp_path / "documents.parquet")
    )
    from glue_jobs_for_data_pipeline_spark.plans.media_pack import (
        x_mm_audio_resample,
    )

    r = x_mm_audio_resample(spark, str(tmp_path)).collect()[0]
    assert r["n_blocks"] == 1
    assert r["rs_sum"] == -118
    assert r["rs_energy"] == 118 * 118
    assert r["rs_min"] == r["rs_max"] == -118


def test_audio_resample_is_udf_and_shuffle_free(spark, sf_dir):
    from glue_jobs_for_data_pipeline_spark.plans.media_pack import (
        x_mm_audio_resample,
    )

    plan = (
        x_mm_audio_resample(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "InPandas" not in plan and "BatchEvalPython" not in plan
    # map-only: no keyed shuffle (the only Exchange is spread()'s
    # round-robin repartition of the single-file fixture parquet)
    assert "hashpartitioning" not in plan.lower()
    assert "rangepartitioning" not in plan.lower()
