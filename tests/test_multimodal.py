"""Multimodal binary-column operators: oracle checks + plumbing goldens."""

from __future__ import annotations

import pytest

from guagua_spark.operators.multimodal import (
    FRAME_STEP,
    ORACLE_SQL,
    QUERIES,
    _decode,
    _dims,
    _encode,
    decode_with_real_codec,
    media_assets,
)

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_multimodal_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, ORACLE_SQL[name], rtol=1e-6)


def test_fake_codec_roundtrip():
    for doc_id in (0, 1, 7, 123, 4999):
        w, h, nf, px = _decode(_encode(doc_id))
        ew, eh, enf, enb = _dims(doc_id)
        assert (w, h, nf, len(px)) == (ew, eh, enf, enb)
        assert px[0] == (doc_id * 31) % 256


def test_assets_schema_and_metadata_consistent(spark, sf_dir):
    assets = media_assets(spark, sf_dir)
    assert [f.name for f in assets.schema.fields] == ["doc_id", "media", "meta"]
    assert dict(assets.dtypes)["media"] == "binary"
    # meta struct agrees with what the binary header says
    row = assets.filter("doc_id = 3").collect()[0]
    w, h, _, _ = _decode(bytes(row.media))
    assert (row.meta.width, row.meta.height) == (w, h)


def test_resize_deterministic_golden(spark, sf_dir):
    rows = (
        QUERIES["multimodal_resize"](spark, sf_dir)
        .filter("doc_id in (0, 1)")
        .collect()
    )
    want = []
    for doc_id in (0, 1):
        _, _, _, px = _decode(_encode(doc_id))
        idx = [j * (len(px) - 1) // 63 for j in range(64)]
        want.append(int(px[idx].sum()))
    assert [r.checksum for r in rows] == want
    assert all((r.width, r.height) == (8, 8) for r in rows)


def test_frame_sample_stride(spark, sf_dir):
    rows = QUERIES["multimodal_frame_sample"](spark, sf_dir).collect()
    assert all(r.frame_idx % FRAME_STEP == 0 for r in rows)


def test_real_codec_seam_is_marked():
    with pytest.raises(NotImplementedError):
        decode_with_real_codec(b"\x89PNG")


# -- real PNG codec path ----------------------------------------------------


def _png_encode(arr, filter_type=0):
    """Tiny test-side PNG encoder (8-bit, non-interlaced) applying ONE
    chosen scanline filter everywhere — lets each decoder filter path
    be exercised against ground-truth pixels."""
    import struct
    import zlib

    import numpy as np

    h, w = arr.shape[:2]
    nch = arr.shape[2] if arr.ndim == 3 else 1
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    px = arr.reshape(h, w * nch).astype(np.int32)
    stride = w * nch
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = px[y]
        enc = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            a = int(cur[x - nch]) if x >= nch else 0
            b = int(prev[x])
            c = int(prev[x - nch]) if x >= nch else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([filter_type]) + bytes(enc.astype(np.uint8)))
        prev = cur
    raw = zlib.compress(b"".join(lines))

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", raw)
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("nch", [1, 3, 4])
def test_png_roundtrip_all_filters(filter_type, nch):
    import numpy as np

    from guagua_spark.operators.multimodal import decode_with_real_codec

    rng = np.random.default_rng(41 * nch + filter_type)
    arr = rng.integers(0, 256, size=(13, 9, nch), dtype=np.uint8)
    decoded = decode_with_real_codec(_png_encode(arr, filter_type))
    assert decoded.shape == arr.shape
    assert (decoded == arr).all()


def test_decode_image_batch_real_codec(spark):
    import numpy as np

    from guagua_spark.operators.multimodal import decode_image_batch

    imgs = []
    for i in range(8):
        rng = np.random.default_rng(i)
        arr = rng.integers(0, 256, size=(4 + i, 6, 3), dtype=np.uint8)
        imgs.append((i, _png_encode(arr, filter_type=i % 5), float(arr.mean())))
    df = spark.createDataFrame(
        [(i, m) for i, m, _ in imgs], "doc_id long, media binary"
    )
    rows = {r.doc_id: r for r in decode_image_batch(df).collect()}
    assert len(rows) == 8
    for i, _, mean in imgs:
        r = rows[i]
        assert (r.height, r.width, r.channels) == (4 + i, 6, 3)
        assert abs(r.mean_value - mean) < 1e-9


def test_non_png_payload_is_honest():
    import pytest as _pytest

    from guagua_spark.operators.multimodal import decode_with_real_codec

    with _pytest.raises(NotImplementedError):
        decode_with_real_codec(b"\xff\xd8\xff\xe0 not a png")


# -- optional-dependency codec breadth (PIL / ffmpeg) -----------------------


def test_decode_image_batch_palette_png_and_jpeg_with_pil(spark):
    """Palette PNG and JPEG are exactly what the stdlib PNG path can't
    decode — with PIL installed, decode_image_batch must handle both;
    without it, the seam stays honest (skip)."""
    PIL_Image = pytest.importorskip("PIL.Image", reason="PIL not installed")
    import io

    import numpy as np

    from guagua_spark.operators.multimodal import decode_image_batch

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    pal_buf, jpg_buf = io.BytesIO(), io.BytesIO()
    # palette PNG: quantize to 16 colors, save as PNG (color type 3)
    PIL_Image.fromarray(rgb).quantize(colors=16).save(pal_buf, format="PNG")
    PIL_Image.fromarray(rgb).save(jpg_buf, format="JPEG", quality=90)
    df = spark.createDataFrame(
        [(0, pal_buf.getvalue()), (1, jpg_buf.getvalue())],
        "doc_id long, media binary",
    )
    rows = {r.doc_id: r for r in decode_image_batch(df).collect()}
    assert rows[0].height == 12 and rows[0].width == 10
    assert rows[1].height == 12 and rows[1].width == 10
    assert rows[1].channels == 3
    # JPEG is lossy: mean within a loose band of the source mean
    assert abs(rows[1].mean_value - float(rgb.mean())) < 16.0


def test_ffmpeg_seam_honest_without_binary(monkeypatch):
    """Without an ffmpeg binary the video seam must raise, never fake."""
    import shutil as _shutil

    from guagua_spark.operators import multimodal as mm

    monkeypatch.setattr(_shutil, "which", lambda _: None)
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        mm.sample_frames_with_real_codec(b"\x00\x00\x00\x18ftypisom", 4)


def test_frame_sample_batch_real_video(spark):
    """With ffmpeg present: synthesize an 8-frame test video, sample
    every 4th frame through the deployment twin, check fan-out shape."""
    import shutil
    import subprocess

    if shutil.which("ffmpeg") is None:
        pytest.skip("ffmpeg not installed")
    from guagua_spark.operators.multimodal import frame_sample_batch

    proc = subprocess.run(
        [
            "ffmpeg", "-v", "error", "-f", "lavfi",
            "-i", "testsrc=size=32x24:rate=4:duration=2",
            "-f", "mpegts", "-vcodec", "mpeg2video", "pipe:1",
        ],
        stdout=subprocess.PIPE,
        check=True,
    )
    df = spark.createDataFrame(
        [(0, proc.stdout)], "doc_id long, media binary"
    )
    rows = frame_sample_batch(df, every_n=4).collect()
    assert [r.frame_idx for r in rows] == [0, 4]
    assert all((r.height, r.width) == (24, 32) for r in rows)


# -- real audio codec path (stdlib wave) ------------------------------------


def _wav_encode(samples, rate, nch, width=2):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def test_wav_roundtrip_and_features(spark):
    """Real PCM WAV bytes through the stdlib decode + the Spark
    feature twin: decoded samples must round-trip exactly and the
    features must match an independent numpy computation."""
    import numpy as np

    from guagua_spark.operators.multimodal import (
        audio_features_batch,
        decode_audio_with_real_codec,
    )

    rate = 8000
    t = np.arange(rate)  # 1 s
    sine = (10000 * np.sin(2 * np.pi * 440 * t / rate)).astype("<i2")
    stereo = np.column_stack([sine, -sine]).astype("<i2")
    mono_wav = _wav_encode(sine, rate, 1)
    stereo_wav = _wav_encode(stereo.reshape(-1), rate, 2)

    r, ch, s = decode_audio_with_real_codec(mono_wav)
    assert (r, ch) == (rate, 1) and (s[:, 0] == sine.astype(np.int32)).all()

    df = spark.createDataFrame(
        [(0, mono_wav), (1, stereo_wav)], "doc_id long, media binary"
    )
    rows = {r.doc_id: r for r in audio_features_batch(df).collect()}
    mono = sine.astype(np.float64)
    want_rms = round(float(np.sqrt(np.mean(mono**2))), 6)
    zc = float(
        np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))
    ) / (rate - 1)
    r0 = rows[0]
    assert (r0.sample_rate, r0.n_channels, r0.n_samples) == (rate, 1, rate)
    assert abs(r0.duration_s - 1.0) < 1e-9
    assert abs(r0.rms - want_rms) < 1e-6
    assert abs(r0.zero_cross_rate - round(zc, 6)) < 1e-6
    # stereo: L = -R, so the mono mix is 0 everywhere → rms 0
    assert rows[1].n_channels == 2 and rows[1].rms == 0.0


def test_audio_codec_seam_is_honest():
    import pytest as _pytest

    from guagua_spark.operators.multimodal import (
        decode_audio_with_real_codec,
    )

    with _pytest.raises(NotImplementedError, match="audio"):
        decode_audio_with_real_codec(b"ID3\x04 not a wav")


def test_png_stream_split_survives_magic_inside_chunk():
    """The frame splitter must walk chunks, not scan for the 8-byte
    signature: a frame carrying the PNG magic INSIDE a chunk payload
    (here an ancillary tEXt chunk; compressed IDAT can do the same)
    must not be split mid-frame."""
    import struct
    import zlib

    import numpy as np

    from guagua_spark.operators.multimodal import (
        _split_png_stream,
        decode_with_real_codec,
    )

    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    b = rng.integers(0, 256, size=(6, 3, 3), dtype=np.uint8)
    png_a, png_b = _png_encode(a), _png_encode(b)

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    # inject a tEXt chunk CONTAINING the magic before IEND of frame A
    trap = chunk(b"tEXt", b"comment\x00" + b"\x89PNG\r\n\x1a\n" + b"!")
    iend = chunk(b"IEND", b"")
    assert png_a.endswith(iend)
    png_a_trapped = png_a[: -len(iend)] + trap + iend

    parts = _split_png_stream(png_a_trapped + png_b)
    assert len(parts) == 2
    assert (decode_with_real_codec(parts[0]) == a).all()
    assert (decode_with_real_codec(parts[1]) == b).all()


def test_png_stream_split_rejects_truncation():
    """A truncated encoder stream (killed ffmpeg, broken pipe) must
    fail AT THE SPLITTER with a clear error, not surface downstream as
    a confusing half-frame decode error or a wrong frame."""
    import numpy as np
    import pytest

    from guagua_spark.operators.multimodal import _split_png_stream

    rng = np.random.default_rng(7)
    png = _png_encode(rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8))
    # cut inside the final IEND chunk → last frame never closes
    with pytest.raises(ValueError, match="truncated"):
        _split_png_stream(png + png[:-5])
    # a few trailing junk bytes after the last complete frame
    with pytest.raises(ValueError, match="trailing"):
        _split_png_stream(png + b"\x00\x01\x02")
    # intact stream still splits
    assert len(_split_png_stream(png + png)) == 2
