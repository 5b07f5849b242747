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


def test_real_decode_gated_for_non_png():
    """r12: PNG decodes ungated via the stdlib codec; everything else
    (JPEG here) still needs Pillow and raises in this container. A bare
    4-byte PNG prefix is NOT the 8-byte signature, so it falls through
    to the gate too."""
    with pytest.raises(NotImplementedError):
        decode_image_batch(b"\xff\xd8\xff\xe0jfif", fake=False)
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


SF_DIR = "/root/testdata/sf0.001"


def test_wav_features_real_container_roundtrip(spark, catalog):
    """The WAV path parses GENUINE RIFF bytes: features equal a direct
    computation from the text bytes, and Python's stdlib wave module
    agrees with our chunk-walking parser on the same containers."""
    import io
    import wave as stdwave

    from data_pipeline_4_online_retail_spark.operators.multimodal import (
        WAV_RATE,
        encode_wav_pcm16,
        mm_wav_features,
        text_to_pcm16,
    )

    docs = {r["doc_id"]: r["text"] for r in catalog.table("documents").collect()}
    out = {r["doc_id"]: r for r in mm_wav_features(spark, SF_DIR).collect()}
    assert set(out) == set(docs)
    for doc_id, text in list(docs.items())[:25]:
        samples = text_to_pcm16(text)
        r = out[doc_id]
        assert r["n_samples"] == len(samples)
        assert r["sample_rate"] == WAV_RATE
        assert r["peak_abs"] == max(abs(s) for s in samples)
        assert r["sum_sq"] == sum(s * s for s in samples)
        # independent stdlib parser on the same bytes
        wf = stdwave.open(io.BytesIO(encode_wav_pcm16(samples)))
        assert wf.getnframes() == len(samples)
        assert wf.getframerate() == WAV_RATE
        assert (wf.getnchannels(), wf.getsampwidth()) == (1, 2)


def test_wav_decoder_quarantines_malformed():
    import pytest

    from data_pipeline_4_online_retail_spark.operators.multimodal import (
        decode_wav_pcm16,
    )

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_pcm16(b"not a wav file at all........")
    with pytest.raises(ValueError, match="fmt/data"):
        decode_wav_pcm16(b"RIFF\x04\x00\x00\x00WAVE")


def test_ppm_features_match_replica(spark, catalog):
    from data_pipeline_4_online_retail_spark.operators.multimodal import (
        PPM_WIDTH,
        mm_ppm_features,
    )

    docs = {r["doc_id"]: r["text"] for r in catalog.table("documents").collect()}
    out = {r["doc_id"]: r for r in mm_ppm_features(spark, SF_DIR).collect()}
    assert set(out) == set(docs)
    for doc_id, text in list(docs.items())[:25]:
        raw = text.encode("utf-8")
        n_px = max(1, len(raw) // 3)
        h = max(1, n_px // PPM_WIDTH)
        rgb = (raw * 3)[: PPM_WIDTH * h * 3]
        r = out[doc_id]
        assert (r["width"], r["height"]) == (PPM_WIDTH, h)
        assert r["sum_r"] == sum(rgb[0::3])
        assert r["sum_g"] == sum(rgb[1::3])
        assert r["sum_b"] == sum(rgb[2::3])


def test_ppm_decoder_quarantines_malformed():
    import pytest

    from data_pipeline_4_online_retail_spark.operators.multimodal import (
        decode_ppm_p6,
        encode_ppm_p6,
    )

    with pytest.raises(ValueError, match="P6"):
        decode_ppm_p6(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="size mismatch"):
        decode_ppm_p6(encode_ppm_p6(2, 1, bytes(6))[:-2])


def test_ppm_resize_roundtrip_and_replica(spark):
    """Every output row is a valid 8x8 P6 whose channel sums match an
    independent pure-Python nearest-neighbor replay from the document
    text; resize indices cover the source raster's corners."""
    from data_pipeline_4_online_retail_spark.operators import multimodal as M

    rows = M.mm_ppm_resize(spark, "/root/testdata/sf0.001").limit(20).collect()
    assert rows
    for r in rows:
        b = bytes(r.out_ppm)
        assert b.startswith(b"P6\n8 8\n255\n")
        px = b.split(b"\n", 3)[3]
        assert len(px) == 8 * 8 * 3
        assert (r.out_sum_r, r.out_sum_g, r.out_sum_b) == (
            sum(px[0::3]),
            sum(px[1::3]),
            sum(px[2::3]),
        )
    # replica for one row, straight from the document text
    from pyspark.sql import functions as F

    doc = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") == rows[0].doc_id)
        .head()
    )
    raw = doc.text.encode("utf-8")
    n_px = max(1, len(raw) // 3)
    h = max(1, n_px // M.PPM_WIDTH)
    rgb = (raw * 3)[: M.PPM_WIDTH * h * 3]
    want = []
    for y in range(8):
        sy = y * h // 8
        for x in range(8):
            sx = x * M.PPM_WIDTH // 8
            s = (sy * M.PPM_WIDTH + sx) * 3
            want.extend(rgb[s : s + 3])
    got = bytes(rows[0].out_ppm).split(b"\n", 3)[3]
    assert bytes(want) == got


def test_binaryfile_source_matches_features_path(spark):
    """The filesystem route (real .ppm files through Spark's binaryFile
    source) must agree row-for-row with the in-engine construction."""
    from data_pipeline_4_online_retail_spark.operators import multimodal as M

    via_files = {
        r.doc_id: (r.width, r.height, r.sum_r, r.sum_g, r.sum_b)
        for r in M.mm_binaryfile_source(spark, "/root/testdata/sf0.001").collect()
    }
    via_engine = {
        r.doc_id: (r.width, r.height, r.sum_r, r.sum_g, r.sum_b)
        for r in M.mm_ppm_features(spark, "/root/testdata/sf0.001").collect()
        if r.doc_id < M.BINARY_SOURCE_DOCS
    }
    assert via_files == via_engine and len(via_files) == M.BINARY_SOURCE_DOCS


def test_resize_nearest_properties_hypothesis():
    """Pure-function properties of the nearest-neighbor kernel over
    random rasters: exact output size, identity at equal dims, every
    output pixel equals the source pixel at the integer-index mapping,
    and corner pixels are preserved (index 0 maps to 0)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_pipeline_4_online_retail_spark.operators.multimodal import (
        resize_rgb_nearest,
    )

    @settings(max_examples=50, deadline=None, derandomize=True)
    @given(
        st.integers(1, 12),
        st.integers(1, 12),
        st.integers(1, 12),
        st.integers(1, 12),
        st.randoms(use_true_random=False),
    )
    def prop(sw, sh, ow, oh, rnd):
        rgb = bytes(rnd.randrange(256) for _ in range(sw * sh * 3))
        out = resize_rgb_nearest(rgb, sw, sh, ow, oh)
        assert len(out) == ow * oh * 3
        if (sw, sh) == (ow, oh):
            assert out == rgb
        for y in range(oh):
            sy = y * sh // oh
            for x in range(ow):
                sx = x * sw // ow
                s = (sy * sw + sx) * 3
                o = (y * ow + x) * 3
                assert out[o : o + 3] == rgb[s : s + 3]
        # top-left corner always preserved
        assert out[0:3] == rgb[0:3]

    prop()


# ---------------------------------------------------------------------------
# r12: stdlib PNG codec (VERDICT r11 item 4)
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_filters_rgb_rgba():
    """Byte-exact encode->decode round trip for every filter type 0-4,
    both RGB and RGBA, on pixels with enough structure that each filter
    produces distinct filtered bytes."""
    from data_pipeline_4_online_retail_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    w, h = 7, 6
    for channels in (3, 4):
        px = bytes(
            (13 * i + 7 * (i // (w * channels)) + (i % 251)) % 256
            for i in range(w * h * channels)
        )
        for ft in range(5):
            png = encode_png(
                w, h, px, channels=channels, row_filters=[ft] * h
            )
            dw, dh, dch, dpx = decode_png(png)
            assert (dw, dh, dch) == (w, h, channels)
            assert dpx == px, f"filter {ft} channels {channels}"
        # mixed filters (the production row % 5 pattern)
        png = encode_png(
            w, h, px, channels=channels, row_filters=[y % 5 for y in range(h)]
        )
        assert decode_png(png)[3] == px


def test_png_decode_hand_built_reference():
    """Decode against HAND-COMPUTED filtered scanlines — independent of
    the encoder, so a mirrored encoder/decoder bug cannot cancel out.
    2x2 RGB; row 0 Sub-filtered, row 1 Up-filtered; the filtered byte
    values below are worked out from the PNG spec by hand."""
    import struct
    import zlib

    from data_pipeline_4_online_retail_spark.operators.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_png,
    )

    # raw pixels: row0 = (10,20,30),(40,60,80); row1 = (15,25,35),(50,70,90)
    expected = bytes([10, 20, 30, 40, 60, 80, 15, 25, 35, 50, 70, 90])
    # Sub: first pixel minus 0, second minus first -> 30,40,50
    row0 = bytes([1, 10, 20, 30, 30, 40, 50])
    # Up: row1 minus row0 raw -> 5,5,5 and 10,10,10
    row1 = bytes([2, 5, 5, 5, 10, 10, 10])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    png = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(row0 + row1))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png(png) == (2, 2, 3, expected)


def test_png_decoder_quarantines_malformed():
    """ValueError quarantine contract (same as WAV/PPM): bad CRC,
    unsupported depth/color/interlace, truncation, size mismatch."""
    import struct
    import zlib

    import pytest as _pytest

    from data_pipeline_4_online_retail_spark.operators.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    good = encode_png(2, 2, bytes(12))
    with _pytest.raises(ValueError):
        decode_png(b"GIF89a not a png")
    with _pytest.raises(ValueError):  # flip one CRC byte
        decode_png(good[:-1] + bytes([good[-1] ^ 0xFF]))
    with _pytest.raises(ValueError):  # truncated mid-chunk
        decode_png(good[: len(good) - 6])
    for ihdr in (
        struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0),  # 16-bit
        struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0),  # palette
        struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1),  # interlaced
    ):
        bad = (
            PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(14)))
            + _png_chunk(b"IEND", b"")
        )
        with _pytest.raises(ValueError):
            decode_png(bad)
    # decompressed size mismatch (one scanline short)
    bad = (
        PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(7)))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError):
        decode_png(bad)


def test_png_decode_image_batch_ungated():
    """decode_image_batch(fake=False) takes the stdlib PNG branch with
    no Pillow: returns the true dimensions and the ITU-R 601-2 integer
    mean luma (byte-exact expected value computed independently here)."""
    from data_pipeline_4_online_retail_spark.operators.multimodal import (
        decode_image_batch,
        encode_png,
    )

    w, h = 5, 4
    px = bytes((i * 17) % 256 for i in range(w * h * 3))
    png = encode_png(w, h, px, row_filters=[y % 5 for y in range(h)])
    dw, dh, luma = decode_image_batch(png, fake=False)
    expected = sum(
        (299 * px[i] + 587 * px[i + 1] + 114 * px[i + 2]) // 1000
        for i in range(0, len(px), 3)
    ) / (w * h)
    assert (dw, dh) == (w, h)
    assert luma == expected
    # RGBA: alpha ignored in luma
    pxa = bytes((i * 29) % 256 for i in range(w * h * 4))
    bands = [pxa[i : i + 4] for i in range(0, len(pxa), 4)]
    expected_a = sum(
        (299 * p[0] + 587 * p[1] + 114 * p[2]) // 1000 for p in bands
    ) / (w * h)
    pnga = encode_png(w, h, pxa, channels=4, row_filters=[y % 5 for y in range(h)])
    assert decode_image_batch(pnga, fake=False) == (w, h, expected_a)


def test_png_features_pipeline_ungated(spark, catalog):
    """The full production pipeline (encode stage -> extract_image_features
    fake=False) runs UNGATED on this container, and its width/height/
    mean_luma agree with the raster formula computed directly from the
    documents' text (the oracle's derivation)."""
    from data_pipeline_4_online_retail_spark.operators.multimodal import (
        PPM_WIDTH,
        documents_as_png_media,
        extract_image_features,
    )

    docs = catalog.table("documents").limit(20)
    feats = {
        r.doc_id: r
        for r in extract_image_features(
            documents_as_png_media(docs), fake=False
        ).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        raw = row.text.encode("utf-8")
        h = max(1, max(1, len(raw) // 3) // PPM_WIDTH)
        rgb = (raw * 3)[: PPM_WIDTH * h * 3]
        exp_luma = sum(
            (299 * rgb[i] + 587 * rgb[i + 1] + 114 * rgb[i + 2]) // 1000
            for i in range(0, len(rgb), 3)
        ) / (PPM_WIDTH * h)
        f = feats[row.doc_id]
        assert (f.width, f.height) == (PPM_WIDTH, h)
        assert f.mean_luma == exp_luma
        assert f.byte_len > 8  # real PNG container bytes
