"""Multimodal binary-column plumbing (schema, Arrow batches, stub gating)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgpipe.multimodal import attach_fake_media, extract_media_features


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document body number {i} with payload text") for i in range(9)],
        "doc_id long, text string",
    )
    return attach_fake_media(docs)


def test_media_schema_and_types(media):
    kinds = {r.media_type for r in media.select("media_type").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    assert dict(media.dtypes)["payload"] == "binary"


def test_feature_extraction_plumbing(media):
    feats = extract_media_features(media, fake=True).toPandas()
    assert len(feats) == 9
    assert (feats.n_bytes > 0).all()
    assert feats.features.apply(len).eq(6).all()
    # deterministic: same input -> same features
    feats2 = extract_media_features(media, fake=True).toPandas()
    assert feats.sort_values("doc_id").features.apply(tuple).tolist() == \
        feats2.sort_values("doc_id").features.apply(tuple).tolist()


def test_real_codec_stub_raises(media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        extract_media_features(media, fake=False).count()
    assert "NotImplementedError" in str(exc.value) or "codec" in str(exc.value)


def test_resize_plumbing(media):
    from kgpipe.multimodal import resize_images

    out = resize_images(media, width=8, height=4, fake=True).toPandas()
    # only image rows survive; payload re-encoded to width*height bytes
    assert set(out.media_type) == {"image"}
    assert (out.width == 8).all() and (out.height == 4).all()
    assert out.payload.apply(len).eq(32).all()
    out2 = resize_images(media, width=8, height=4, fake=True).toPandas()
    assert out.sort_values("doc_id").payload.tolist() == \
        out2.sort_values("doc_id").payload.tolist()  # deterministic


def test_frame_sampling_fanout(media):
    from pyspark.sql import functions as F

    from kgpipe.multimodal import sample_frames

    frames = sample_frames(media, every_ms=1000, max_frames=4, fake=True)
    pdf = frames.toPandas()
    assert len(pdf) > 0
    vids = {r.doc_id for r in media.where(F.col("media_type") == "video")
            .select("doc_id").collect()}
    assert set(pdf.doc_id) == vids           # 1 video -> N frame rows
    per_doc = pdf.groupby("doc_id").frame_idx.agg(["min", "max", "count"])
    assert (per_doc["min"] == 0).all()
    assert (per_doc["count"] <= 4).all()
    # frame timestamps follow the sampling cadence
    assert (pdf.frame_ms == pdf.frame_idx * 1000).all()
