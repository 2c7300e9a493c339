"""Multimodal plumbing: binary columns, Arrow-batched decode stage,
frame sampling — real schemas and batch shapes, stubbed codec."""

import pytest

from crypto_etl_airflow_spark.operators import multimodal
from crypto_etl_airflow_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _media(spark):
    return multimodal.documents_as_media(load_table(spark, SF_SMOKE, "documents"))


def test_media_schema_binary_payload(spark):
    media = _media(spark)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "media_type", "width", "height", "n_frames",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"
    row = media.limit(1).collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))


def test_extract_features_fake_decoder_is_deterministic(spark):
    media = _media(spark).limit(50)
    f1 = {r.media_id: r.features for r in multimodal.extract_features(media).collect()}
    f2 = {r.media_id: r.features for r in multimodal.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == multimodal.FEATURE_DIM for v in f1.values())
    assert all(0.0 <= x <= 1.0 for v in f1.values() for x in v)


def test_extract_features_custom_decoder(spark):
    media = _media(spark).limit(5)

    def decoder(payload: bytes, media_type: str):
        return [float(len(payload)), float(len(media_type))] + [0.0] * 6

    out = multimodal.extract_features(media, decoder=decoder).collect()
    assert all(r.features[0] == r.payload_bytes for r in out)


def test_extract_features_decoder_errors_surface(spark):
    media = _media(spark).limit(5)

    def broken(payload: bytes, media_type: str):
        raise NotImplementedError("real codec not available in container")

    with pytest.raises(Exception, match="real codec not available"):
        multimodal.extract_features(media, decoder=broken).collect()


def test_sample_frames_every_other(spark):
    frames = multimodal.sample_frames(_media(spark), every_nth=2)
    rows = frames.collect()
    assert rows, "video rows exist"
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for media_id, group in by_media.items():
        idxs = sorted(r.frame_idx for r in group)
        total = group[0].total_frames
        assert idxs == list(range(0, total, 2))
