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
