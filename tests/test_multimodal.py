from __future__ import annotations

import struct

import pytest

from analysisofuserbehavior_spark.operators import multimodal as mm


def _media(spark, rows):
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def _blob(w: int, h: int, payload: bytes = b"xyz") -> bytes:
    return struct.pack("<II", w, h) + payload


def test_media_metadata_roundtrip(spark):
    rows = [
        (1, "image", _blob(640, 480)),
        (2, "image", _blob(32, 32, b"")),
        (3, "audio", None),
    ]
    out = {r["doc_id"]: r for r in mm.media_metadata(_media(spark, rows)).collect()}
    assert (out[1]["width"], out[1]["height"]) == (640, 480)
    assert out[1]["n_bytes"] == 11
    assert (out[3]["width"], out[3]["height"], out[3]["n_bytes"]) == (0, 0, 0)


def test_frame_offsets_sample_every_n(spark):
    rows = [(1, "video", _blob(25, 0)), (2, "image", _blob(9, 9))]
    out = mm.frame_offsets(_media(spark, rows), every_n=10, fps=30).collect()
    assert [(r["doc_id"], r["frame_index"]) for r in out] == [(1, 0), (1, 10), (1, 20)]
    assert out[1]["timestamp_sec"] == 0.333


def test_real_decode_is_gated(spark):
    if mm.HAVE_PIL:
        pytest.skip("PIL present; stub gate not applicable")
    with pytest.raises(NotImplementedError):
        mm.decode_real(b"\x00" * 16)


def test_resize_media_rewrites_header_and_scales_payload(spark):
    import struct
    from analysisofuserbehavior_spark.operators.multimodal import resize_media

    rows = [
        (1, "image", struct.pack("<II", 100, 100) + b"x" * 1000),
        (2, "image", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, media binary")
    got = {r["doc_id"]: r["media"] for r in resize_media(df, 10, 10).collect()}
    w, h = struct.unpack("<II", got[1][:8])
    assert (w, h) == (10, 10)
    assert len(got[1]) - 8 == 10  # payload scaled by (10*10)/(100*100)
    assert got[2] is None


def test_embed_media_deterministic_and_ann_compatible(spark):
    import struct
    from analysisofuserbehavior_spark.operators.multimodal import embed_media
    from analysisofuserbehavior_spark.operators.similarity import ann_bruteforce_topk

    rows = [
        (i, "image", struct.pack("<II", i, i) + bytes([i] * 32)) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, media binary")
    a = embed_media(df).collect()
    b = embed_media(df).collect()
    assert sorted(map(tuple, ((r["doc_id"], tuple(r["embedding"])) for r in a))) == \
           sorted(map(tuple, ((r["doc_id"], tuple(r["embedding"])) for r in b)))
    # output schema feeds the similarity operators directly
    emb = embed_media(df, dim=16).withColumnRenamed("doc_id", "vec_id")
    topk = ann_bruteforce_topk(emb, n_queries=2, k=2)
    assert topk.count() == 4
