"""Multimodal plumbing: deterministic fake decode through mapInPandas,
stub behavior without libraries."""

from __future__ import annotations

import pytest

from data_pipeline_4_online_retail_spark.operators.multimodal import (
    decode_image_batch,
    documents_as_media,
    extract_image_features,
)


def test_fake_decode_is_deterministic(spark, catalog):
    media = documents_as_media(catalog.table("documents"))
    a = sorted(tuple(r) for r in extract_image_features(media, fake=True).collect())
    b = sorted(tuple(r) for r in extract_image_features(media, fake=True).collect())
    assert a == b
    assert all(row[1] > 0 for row in a)  # byte_len
    assert all(16 <= row[2] < 80 for row in a)  # width in stub range


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_batch(b"\x89PNG", fake=False)


def test_media_schema_shape(spark, catalog):
    media = documents_as_media(catalog.table("documents"))
    fields = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert fields["content"] == "binary"
    assert fields["media_meta"].startswith("struct<mime:string,width:int")


def test_audio_mapinpandas_equals_jvm_twin(spark):
    """The Arrow/mapInPandas audio extractor and the JVM-side HOF twin
    must emit identical window rows — on ASCII docs bytes == characters,
    so the two computations are provably over the same samples."""
    from data_pipeline_4_online_retail_spark.operators.multimodal import (
        mm_audio_features_fake,
        mm_audio_window_stats,
    )

    sf = "/root/testdata/sf0.001"
    arrow = sorted(tuple(r) for r in mm_audio_features_fake(spark, sf).collect())
    jvm = sorted(tuple(r) for r in mm_audio_window_stats(spark, sf).collect())
    assert arrow == jvm and arrow


def test_audio_decode_guard(spark):
    import pytest as _pytest

    from data_pipeline_4_online_retail_spark.operators.multimodal import (
        extract_audio_windows,
    )

    with _pytest.raises(NotImplementedError):
        extract_audio_windows(None, fake=False)
