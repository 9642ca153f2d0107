from skills_vectors_spark.operators import embed, multimodal


def test_embed_mock_deterministic_and_normalized(spark, sf_dir):
    from skills_vectors_spark import sources

    d = sources.load(spark, sf_dir, "documents")
    a = {r.doc_id: r.embedding for r in embed.embed_documents(d).collect()}
    b = {r.doc_id: r.embedding for r in embed.embed_documents(d).collect()}
    assert a == b
    import math

    for v in list(a.values())[:10]:
        assert len(v) == embed.EMBED_DIM
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-5)
    # the declared query emits the contract columns over the same pass
    rows = embed.embed_mock(spark, sf_dir).collect()
    assert len(rows) == len(a)
    assert all(r.dim == embed.EMBED_DIM and r.unit_norm_ok for r in rows)


def test_embed_depends_only_on_text(spark):
    df1 = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    df2 = spark.createDataFrame([(99, "hello world")], "doc_id long, text string")
    e1 = embed.embed_documents(df1).first().embedding
    e2 = embed.embed_documents(df2).first().embedding
    assert e1 == e2


def test_sqlhash_codegen_matches_python_reference(spark):
    """The JVM codegen sqlhash embedding must be bit-identical (after
    the float32 cast) to the Python reference implementation — the
    parity the embed_knn_pipeline oracle depends on."""
    import numpy as np
    import pandas as pd

    texts = ["hello world", "", "ünïcode ✓ test", "a" * 500, "x:y:0"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.embedding
        for r in embed.embed_documents(df, provider=embed.SQLHASH_PROVIDER).collect()
    }
    ref = embed._sqlhash_embed_batch(pd.Series(texts))
    for i, expect in enumerate(ref):
        assert np.array_equal(
            np.array(got[i], dtype=np.float32), np.array(expect, dtype=np.float32)
        ), texts[i][:20]


def test_mm_image_features_shape(spark, sf_dir):
    rows = multimodal.mm_image_features(spark, sf_dir).collect()
    assert rows
    for r in rows[:20]:
        assert 8 <= r.height <= 15 and 8 <= r.width <= 15
        # planted gradient: mean_c = base_c + (h-1)/2 + (w-1)/2, so the
        # mean sits in [0, 127] + [7, 14] and channels differ only by
        # their base offsets
        off = (r.height - 1) / 2 + (r.width - 1) / 2
        for m in (r.mean_r, r.mean_g, r.mean_b):
            assert off <= m <= 127 + off
            assert float(m - off).is_integer(), (m, off)


def test_decode_ppm_real_parser():
    import numpy as np
    import pytest as pt

    from skills_vectors_spark.operators.multimodal import _plant_ppm, decode_ppm

    # roundtrip: planted payload decodes to the planted raster
    img = decode_ppm(_plant_ppm("hello multimodal"))
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    # hand-built PPM with comments and multi-whitespace per the spec
    raster = bytes(range(2 * 3 * 3))
    payload = b"P6 # comment\n# full line\n 3\n\t2 # dims\n255\n" + raster
    img2 = decode_ppm(payload)
    assert img2.shape == (2, 3, 3)
    assert img2.tobytes() == raster
    with pt.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pt.raises(ValueError, match="truncated PPM raster"):
        decode_ppm(b"P6\n3 2\n255\n" + raster[:-1])
    with pt.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_mm_frame_sample_fanout(spark, sf_dir):
    import hashlib

    from skills_vectors_spark import sources
    from skills_vectors_spark.operators.multimodal import FRAME_BYTES

    rows = multimodal.mm_frame_sample(spark, sf_dir).collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, frames in by_media.items():
        idxs = sorted(f.frame_idx for f in frames)
        assert idxs == list(range(len(frames)))
        assert all(f.n_frames == len(frames) for f in frames)
    # the hashes come from genuinely parsed Y4M rasters; check a few
    # against the source text's chunks end-to-end
    docs = {
        r.doc_id: r.text
        for r in sources.load(spark, sf_dir, "documents")
        .filter("doc_id % 3 = 2")
        .limit(5)
        .collect()
    }
    for mid, text in docs.items():
        raw = text.encode("utf-8")
        want = [
            hashlib.md5(raw[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]).hexdigest()[:16]
            for i in range(len(raw) // FRAME_BYTES)
        ]
        got = [f.frame_hash for f in sorted(by_media.get(mid, []), key=lambda f: f.frame_idx)]
        assert got == want, mid


def test_decode_y4m_real_parser():
    import pytest as pt

    from skills_vectors_spark.operators.multimodal import _plant_y4m, decode_y4m

    # roundtrip: planted payload decodes to the text's full chunks
    text = "x" * 100 + "y" * 100  # 3 full 64-byte frames, 8-byte tail dropped
    w, h, frames = decode_y4m(_plant_y4m(text))
    assert w * h == 64
    assert len(frames) == 3
    assert b"".join(frames) == text.encode()[:192]
    # hand-built stream per the spec: C444 chroma, frame-level params,
    # X extension tokens — all legal and parsed/skipped correctly
    f0, f1 = bytes(range(12)), bytes(range(100, 112))
    payload = (
        b"YUV4MPEG2 W2 H2 F30000:1001 Ip A128:117 C444 XYSCSS=444\n"
        + b"FRAME Xtimecode=00:00\n" + f0
        + b"FRAME\n" + f1
    )
    assert decode_y4m(payload) == (2, 2, [f0, f1])
    # spec default chroma is 420jpeg -> 6 bytes per 2x2 frame
    assert decode_y4m(b"YUV4MPEG2 W2 H2\nFRAME\n\x00\x01\x02\x03\x04\x05")[2] == [
        b"\x00\x01\x02\x03\x04\x05"
    ]
    with pt.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"YUV4MPEG3 W2 H2\nFRAME\n" + f0)
    with pt.raises(ValueError, match="missing W/H"):
        decode_y4m(b"YUV4MPEG2 W2\nFRAME\n" + f0)
    with pt.raises(ValueError, match="unsupported y4m chroma"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C410\nFRAME\n" + f0)
    with pt.raises(ValueError, match="bad FRAME marker"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C444\nFRAME\n" + f0 + b"JUNK!\n" + f1)
    with pt.raises(ValueError, match="truncated frame raster"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C444\nFRAME\n" + f0[:-1])
    with pt.raises(ValueError, match="truncated FRAME header"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C444\nFRAME")


def test_plant_y4m_rejects_non_ascii_text():
    """The mm_frame_sample oracle frames payloads by CHARACTER offsets
    (length/substr) while the planter chunks utf-8 BYTES; a non-ASCII
    document must fail loudly at planting time, not desynchronize the
    frame count silently (advisor r7). _plant_ppm/_plant_wav stay
    ascii-agnostic on purpose: their oracles are md5-only, and md5 is
    computed over the same utf-8 bytes in both engines for any text."""
    import pytest as pt

    from skills_vectors_spark.operators.multimodal import (
        _plant_ppm,
        _plant_wav,
        _plant_y4m,
    )

    non_ascii = "café " * 40  # 200 chars, 240 utf-8 bytes
    with pt.raises(ValueError, match="requires ASCII"):
        _plant_y4m(non_ascii)
    # the md5-coupled planters accept any text — byte-identical hashing
    assert _plant_ppm(non_ascii)[:2] == b"P6"
    assert _plant_wav(non_ascii)[:4] == b"RIFF"
    # and ASCII text still plants frames
    assert _plant_y4m("a" * 64).count(b"FRAME\n") == 1


def test_decode_y4m_property_round_trip():
    """Property: any frame list written through a y4m header round
    trips exactly through decode_y4m (builder here is independent of
    the fixture planter)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from skills_vectors_spark.operators.multimodal import decode_y4m

    @settings(max_examples=50, deadline=None)
    @given(
        st.integers(1, 8),
        st.integers(1, 8),
        st.sampled_from(["mono", "444"]),
        st.data(),
    )
    def check(w, h, chroma, data):
        fsz = w * h if chroma == "mono" else 3 * w * h
        frames = data.draw(
            st.lists(st.binary(min_size=fsz, max_size=fsz), min_size=0, max_size=5)
        )
        payload = f"YUV4MPEG2 W{w} H{h} F25:1 C{chroma}\n".encode() + b"".join(
            b"FRAME\n" + f for f in frames
        )
        assert decode_y4m(payload) == (w, h, frames)

    check()


def test_decode_ppm_property_round_trip():
    """Property: any (h, w, 3) uint8 raster written through a P6
    header — with arbitrary comments and whitespace — is recovered
    exactly by decode_ppm (advisor-arc parity with the WAV and Y4M
    parsers)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from skills_vectors_spark.operators.multimodal import decode_ppm

    @settings(max_examples=50, deadline=None)
    @given(
        st.integers(1, 8),
        st.integers(1, 8),
        st.sampled_from([b"\n", b" ", b"\t", b" # c\n \n"]),
        st.data(),
    )
    def check(h, w, sep, data):
        raster = bytes(data.draw(st.binary(min_size=h * w * 3, max_size=h * w * 3)))
        payload = b"P6" + sep + f"{w}".encode() + sep + f"{h}".encode() + sep + b"255\n" + raster
        img = decode_ppm(payload)
        assert img.shape == (h, w, 3)
        assert img.tobytes() == raster
        assert np.array_equal(img, np.frombuffer(raster, np.uint8).reshape(h, w, 3))

    check()


def test_mm_audio_features_deterministic(spark, sf_dir):
    from skills_vectors_spark.operators.multimodal import mm_audio_features

    rows = sorted(map(tuple, mm_audio_features(spark, sf_dir).collect()))
    assert rows, "audio subset must be non-empty"
    assert rows == sorted(map(tuple, mm_audio_features(spark, sf_dir).collect()))
    for r in rows:
        _, n, dur, rms, peak, zcr = r
        assert 8000 <= n <= 32000 and 0.5 <= dur <= 2.0
        # square-wave fixture: rms equals peak, both in the planted
        # amplitude range; zcr ~ 1/p for half-periods p in [2, 16)
        assert rms == peak
        assert 1000 / 32768 - 1e-6 <= peak <= 16000 / 32768 + 1e-6
        assert 1 / 16 - 1e-3 <= zcr <= 1 / 2 + 1e-3


def test_decode_wav_round_trip_and_malformed():
    import numpy as np
    import pytest as pt

    from skills_vectors_spark.operators.multimodal import (
        AUDIO_SR,
        _plant_wav,
        decode_wav,
    )

    payload = _plant_wav("some document text")
    sr, w = decode_wav(payload)
    assert sr == AUDIO_SR
    assert w.dtype == np.float64 and len(w) >= 8000
    assert np.all(np.isin(np.abs(w), np.abs(w[:1])))  # square wave: |s| constant
    with pt.raises(ValueError):
        decode_wav(b"RIFX" + payload[4:])  # bad magic
    with pt.raises(ValueError):
        decode_wav(payload[:-10])  # truncated data chunk
    with pt.raises(ValueError):
        decode_wav(payload[:12])  # no chunks at all


def test_embed_with_status_surfaces_errors(spark, sf_dir):
    from pyspark.sql import functions as F

    from skills_vectors_spark import sources
    from skills_vectors_spark.operators.embed import embed_with_status

    out = embed_with_status(spark, sf_dir)
    n_docs = sources.load(spark, sf_dir, "documents").count()
    assert out.count() == n_docs, "every input row must come out, ok or error"
    ok = out.filter(F.col("status") == "ok")
    err = out.filter(F.col("status") == "error")
    assert ok.filter(F.col("dim").isNull()).count() == 0
    assert err.filter(F.col("dim").isNotNull()).count() == 0
    assert err.filter(F.col("error").isNull()).count() == 0
    assert ok.count() > 0


def test_embed_provider_switch_dims(spark, sf_dir):
    from skills_vectors_spark.operators.embed import PROVIDERS, embed_provider_switch

    rows = {r.provider: r for r in embed_provider_switch(spark, sf_dir).collect()}
    assert set(rows) == {"mock-openai", "mock-gemini"}
    for p, r in rows.items():
        assert r.dim == PROVIDERS[p]
        assert r.n_docs > 0


def test_decode_wav_property_round_trip():
    """Property: any int16 mono waveform written through a RIFF/WAVE
    header is recovered exactly by decode_wav (builder and parser are
    independent code paths)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from skills_vectors_spark.operators.multimodal import decode_wav

    def build(samples: np.ndarray, sr: int) -> bytes:
        data = samples.astype("<i2").tobytes()
        return (
            b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + sr.to_bytes(4, "little") + (sr * 2).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
            + b"data" + len(data).to_bytes(4, "little") + data
        )

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
        st.sampled_from([8000, 16000, 44100]),
    )
    def check(vals, sr):
        samples = np.array(vals, dtype=np.int16)
        got_sr, w = decode_wav(build(samples, sr))
        assert got_sr == sr
        assert np.array_equal((w * 32768.0).astype(np.int16), samples)

    check()
