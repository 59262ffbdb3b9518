"""Multimodal plumbing (Arrow batch shapes, stubbed decode) and the
checkpoint/resume ledger (kill-resume without recompute)."""

from __future__ import annotations

import struct
import tempfile

import pytest
from pyspark.sql import functions as F

from jema_js_spark.operators.multimodal import (
    attach_media_metadata,
    decode_image_features,
    resize_images,
    sample_video_frames,
)
from jema_js_spark.runtime.checkpoint import CheckpointLedger, run_partitioned


def _png(w, h, tail=b"", color_type=2):
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
            + tail)


def _gif(w, h, tail=b""):
    """Positive-size GIFs are built FULLY valid (real palette + LZW
    pixel data, solid fill derived from tail[0]) so they run the real
    decode path; other shapes stay header-only."""
    if w <= 0 or h <= 0:
        return b"GIF89a" + struct.pack("<HH", w & 0xFFFF, h & 0xFFFF) + tail
    import numpy as np
    from jema_js_spark.operators.multimodal import gif_bytes

    fill = (tail[:1] or b"\0")[0]
    color = [fill, (fill * 3) % 256, (fill * 7) % 256]
    return gif_bytes(np.full((h, w, 3), color, dtype=np.uint8))


def _bmp(w, h, tail=b"", bits=24):
    """24-bit positive-size BMPs are built FULLY valid (real pixel data,
    solid fill from tail[0]) so they run the real numpy decode path;
    other shapes stay header-only for the header-parse edge tests."""
    if bits != 24 or w <= 0 or h == 0:
        return (b"BM" + struct.pack("<I", 54) + b"\x00\x00\x00\x00"
                + struct.pack("<I", 54) + struct.pack("<I", 40)
                + struct.pack("<ii", w, h) + struct.pack("<H", 1)
                + struct.pack("<H", bits) + tail)
    stride = (w * 3 + 3) & ~3
    pix = (tail[:1] or b"\x00") * (stride * abs(h))
    return (b"BM" + struct.pack("<I", 54 + len(pix)) + b"\x00\x00\x00\x00"
            + struct.pack("<I", 54) + struct.pack("<I", 40)
            + struct.pack("<ii", w, h) + struct.pack("<HH", 1, bits)
            + struct.pack("<II", 0, len(pix)) + b"\x00" * 16 + pix)


def _dims(i):
    return 32 + i, 32 + (i * 3) % 40


@pytest.fixture(scope="module")
def media(spark):
    makers = [_png, _gif, _bmp]
    rows = []
    for i in range(20):
        w, h = _dims(i)
        rows.append((i, makers[i % 3](w, h, bytes([i % 251] * (100 + i * 7)))))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    return attach_media_metadata(df)


def test_header_parse_exact(media):
    """Real container-header parsing: the Catalyst byte-slicing
    expressions must recover the exact dimensions written by the
    struct.pack producers for all three formats."""
    got = {r["media_id"]: r["meta"] for r in media.collect()}
    for i in range(20):
        w, h = _dims(i)
        m = got[i]
        assert (m["width"], m["height"]) == (w, h), (i, m)
        assert m["channels"] == 3  # PNG ct=2, GIF, and 24-bit BMP → RGB
    # unknown magic → NULL meta fields, not fabricated dims
    unk = attach_media_metadata(
        media.sparkSession.createDataFrame(
            [(99, b"not an image at all")], "media_id long, payload binary"))
    m = unk.collect()[0]["meta"]
    assert m["width"] is None and m["height"] is None


def test_header_parse_topdown_bmp_and_corrupt_headers(spark):
    """Round-2 review find: a top-down BMP stores biHeight as a negative
    i32 (u32 ~4.29e9), which a plain ANSI int cast turned into a
    CAST_OVERFLOW task kill.  Corrupt headers must degrade to NULL
    fields, never an exception."""
    rows = [(0, _bmp(40, -32)),                      # top-down BMP
            (1, _png(0xFFFFFFFF, 10)),               # corrupt huge width
            (2, _bmp(-1, -1))]                       # nonsense dims
    out = {r["media_id"]: r["meta"] for r in attach_media_metadata(
        spark.createDataFrame(rows, "media_id long, payload binary")).collect()}
    assert (out[0]["width"], out[0]["height"]) == (40, 32)
    assert out[1]["width"] is None and out[1]["height"] == 10
    assert out[2]["width"] == 1 and out[2]["height"] == 1  # abs(i32 -1)


def test_header_parse_channel_variants(spark):
    rows = [(0, _png(10, 11, color_type=6)),   # RGBA
            (1, _png(12, 13, color_type=0)),   # gray
            (2, _bmp(14, 15, bits=8))]         # palette
    out = {r["media_id"]: r["meta"] for r in attach_media_metadata(
        spark.createDataFrame(rows, "media_id long, payload binary")).collect()}
    assert out[0]["channels"] == 4
    assert out[1]["channels"] == 1
    assert out[2]["channels"] == 1


def _full_bmp(arr, top_down=False):
    """Reference BMP writer for the decoder differential: arbitrary
    pixel content, bottom-up or top-down row order."""
    import numpy as np
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    src = arr if top_down else arr[::-1]
    pix = b"".join(src[y][..., ::-1].tobytes().ljust(stride, b"\0")
                   for y in range(h))
    bih = struct.pack("<IiiHHIIiiII", 40, w, (-h if top_down else h),
                      1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54) + bih + pix


def test_bmp_pixel_decode_vs_numpy_reference():
    """The built-in numpy BMP decoder must reproduce arbitrary pixel
    arrays exactly — padding widths, bottom-up and top-down order."""
    import numpy as np
    from jema_js_spark.operators.multimodal import _decode_bmp

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (2, 3), (5, 4), (3, 7), (8, 8), (2, 16)]:
        for top_down in (False, True):
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            got = _decode_bmp(_full_bmp(arr, top_down=top_down))
            assert got.shape == arr.shape and (got == arr).all(), \
                (h, w, top_down)


def test_bmp_pixel_decode_rejects_unsupported():
    import numpy as np
    from jema_js_spark.operators.multimodal import _decode_bmp

    with pytest.raises(ValueError):
        _decode_bmp(b"XX" + b"\0" * 60)
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    bad = bytearray(_full_bmp(arr))
    bad[28:30] = struct.pack("<H", 8)           # 8bpp palette
    with pytest.raises(NotImplementedError):
        _decode_bmp(bytes(bad))
    with pytest.raises(ValueError):
        _decode_bmp(_full_bmp(arr)[:-5])        # truncated pixel data


def test_synthesize_bmp_spark_roundtrip(spark):
    """Catalyst-built BMP payloads → real header parse → real numpy
    pixel decode: dims and channel means must equal the generating
    formula exactly (solid color)."""
    from jema_js_spark.operators.multimodal import synthesize_bmp

    df = spark.range(24).select(
        F.col("id").alias("media_id"),
        synthesize_bmp(F.pmod(F.col("id"), F.lit(5)) + 1, F.lit(3),
                       F.pmod(F.col("id") * 13, F.lit(256)),
                       F.pmod(F.col("id") * 7, F.lit(256)),
                       F.pmod(F.col("id"), F.lit(256))).alias("payload"))
    out = decode_image_features(attach_media_metadata(df)).collect()
    assert len(out) == 24
    for r in out:
        i = r["media_id"]
        assert r["decode_error"] is None, (i, r["decode_error"])
        assert (r["width"], r["height"]) == (i % 5 + 1, 3)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == \
            (float(i * 13 % 256), float(i * 7 % 256), float(i % 256))


def test_png_pixel_decode_roundtrip_all_filters():
    """stdlib-zlib PNG decoder must reproduce arbitrary pixel arrays
    exactly through every scanline filter type and channel count."""
    import numpy as np
    from jema_js_spark.operators.multimodal import _decode_png, png_bytes

    rng = np.random.default_rng(11)
    for h, w, c in [(1, 1, 3), (3, 5, 3), (4, 4, 1), (5, 3, 4), (6, 2, 2)]:
        arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        for filters in (None, [1] * h, [2] * h, [3] * h, [4] * h,
                        [y % 5 for y in range(h)]):
            got = _decode_png(png_bytes(arr, filters))
            assert got.shape == arr.shape and (got == arr).all(), \
                (h, w, c, filters)


def test_png_header_only_falls_back_corrupt_raises(spark):
    """A header-only PNG (the media_features fixture shape) must fall
    back to the fake decoder — NOT error — while corrupt IDAT bytes
    yield a per-row decode error."""
    import numpy as np
    from jema_js_spark.operators.multimodal import png_bytes

    good = png_bytes(np.full((2, 3, 3), [9, 8, 7], dtype=np.uint8))
    idx = good.find(b"IDAT") + 8
    corrupt = good[:idx] + b"\x00\x01\x02\x03" + good[idx + 4:]
    hdr_only = _png(6, 4, b"no pixel chunks here")
    df = spark.createDataFrame(
        [(1, good), (2, corrupt), (3, hdr_only)],
        "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           decode_image_features(attach_media_metadata(df)).collect()}
    assert out[1]["decode_error"] is None
    assert (out[1]["mean_r"], out[1]["mean_g"], out[1]["mean_b"]) == \
        (9.0, 8.0, 7.0)
    assert out[2]["decode_error"] is not None          # corrupt → loud
    assert out[3]["decode_error"] is None              # fake fallback
    assert (out[3]["width"], out[3]["height"]) == (6, 4)


def test_png_hidden_idat_is_loud(spark):
    """A corrupted chunk LENGTH that makes the walker skip IDAT must be
    a loud error, never a fake-decoder fallback (review finding: the
    corruption would otherwise fabricate clean-looking features)."""
    import numpy as np
    from jema_js_spark.operators.multimodal import png_bytes

    good = bytearray(png_bytes(np.full((3, 3, 3), [1, 2, 3],
                                       dtype=np.uint8)))
    # IHDR length field at offset 8..12 — inflate it so the walk
    # swallows the IDAT chunk as IHDR payload
    good[8:12] = (10_000).to_bytes(4, "big")
    df = spark.createDataFrame([(1, bytes(good))],
                               "media_id long, payload binary")
    out = decode_image_features(attach_media_metadata(df)).collect()
    assert out[0]["decode_error"] is not None
    assert "corrupted" in out[0]["decode_error"]


def test_gif_pixel_decode_roundtrip():
    """Pure-python GIF LZW decoder must reproduce palette images
    exactly — multi-color palettes, multi-sub-block streams."""
    import numpy as np
    from jema_js_spark.operators.multimodal import _decode_gif, gif_bytes

    rng = np.random.default_rng(5)
    for h, w, ncol in [(1, 1, 1), (3, 5, 4), (4, 4, 2), (7, 3, 16),
                       (8, 8, 200), (2, 300, 250), (40, 40, 16)]:
        colors = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        arr = colors[rng.integers(0, ncol, size=(h, w))]
        got = _decode_gif(gif_bytes(arr))
        assert got.shape == arr.shape and (got == arr).all(), (h, w, ncol)


def test_jpeg_solid_plants_roundtrip_exact():
    """Baseline JPEG codec (round 5): DC-only blocks under the flat
    q=16 tables round-trip EXACTLY for even channel values — the
    property the media_pixels oracle stands on — in 4:4:4, 4:2:0, with
    and without restart markers, gray and color."""
    import numpy as np
    from jema_js_spark.operators.multimodal import _decode_jpeg, jpeg_bytes

    def expected_rgb(y, cb, cr):
        r = np.floor(y + 1.402 * (cr - 128) + 0.5)
        g = np.floor(y - 0.344136 * (cb - 128)
                     - 0.714136 * (cr - 128) + 0.5)
        b = np.floor(y + 1.772 * (cb - 128) + 0.5)
        return [int(np.clip(x, 0, 255)) for x in (r, g, b)]

    for v in (0, 2, 64, 128, 254):
        arr = np.full((10, 13, 1), v, dtype=np.uint8)
        got = _decode_jpeg(jpeg_bytes(arr))
        assert got.shape == (10, 13, 1) and (got == v).all(), v
    for (y, cb, cr) in [(128, 128, 128), (100, 120, 140), (200, 64, 90),
                        (0, 128, 128), (254, 2, 250)]:
        for sub, ri in [("444", 0), ("420", 0), ("444", 2), ("420", 1)]:
            arr = np.full((9, 11, 3), [y, cb, cr], dtype=np.uint8)
            got = _decode_jpeg(jpeg_bytes(arr, ycbcr=True, subsampling=sub,
                                          restart_interval=ri))
            exp = expected_rgb(y, cb, cr)
            assert got.shape == (9, 11, 3), (sub, ri)
            assert (got.reshape(-1, 3) == exp).all(), ((y, cb, cr), sub, ri)


def test_jpeg_lossy_roundtrip_and_guards():
    """Non-uniform content: bounded reconstruction error (flat q=16),
    restart markers bit-identical to the plain stream; progressive /
    truncated / desynced payloads raise the documented exceptions."""
    import numpy as np
    import pytest as _pytest

    from jema_js_spark.operators.multimodal import _decode_jpeg, jpeg_bytes

    xs = np.linspace(0, 255, 37)
    grad = np.tile(xs, (19, 1)).astype(np.uint8)[..., None]
    plain = _decode_jpeg(jpeg_bytes(grad))
    assert np.abs(plain.astype(int)[..., 0]
                  - grad[..., 0].astype(int)).mean() < 2.0
    assert (plain == _decode_jpeg(jpeg_bytes(grad, restart_interval=2))).all()

    rgb = np.full((8, 8, 3), [200, 100, 50], dtype=np.uint8)
    assert np.abs(_decode_jpeg(jpeg_bytes(rgb)).astype(int)
                  - rgb.astype(int)).max() <= 2   # RGB colorspace path

    payload = jpeg_bytes(grad)
    with _pytest.raises(ValueError):
        _decode_jpeg(payload[:40])                # truncated pre-SOS
    with _pytest.raises(ValueError):
        _decode_jpeg(payload[:len(payload) // 2])  # truncated entropy
    with _pytest.raises(NotImplementedError):     # arithmetic SOF9
        _decode_jpeg(b"\xff\xd8\xff\xc9\x00\x0b"
                     b"\x08\x00\x10\x00\x10\x01\x01\x11\x00")
    with _pytest.raises(ValueError):
        _decode_jpeg(b"\xff\xd8\x00\x00")         # marker desync
    # truncated table segments (ADVICE r5): the documented structural
    # ValueError, not a numpy shape error deep in the decode loop
    with _pytest.raises(ValueError, match="truncated JPEG DQT"):
        _decode_jpeg(b"\xff\xd8\xff\xdb\x00\x04\x00\x11")
    with _pytest.raises(ValueError, match="truncated JPEG DHT"):
        _decode_jpeg(b"\xff\xd8\xff\xc4\x00\x05\x00\x01\x02")


def test_gif_decode_edge_paths(spark):
    """Header-only GIFs fall back to the fake decoder; corrupt LZW data
    and interlaced images are loud per-row errors."""
    import numpy as np
    from jema_js_spark.operators.multimodal import gif_bytes

    good = gif_bytes(np.full((5, 5, 3), [9, 8, 7], dtype=np.uint8))
    corrupt = good[:-8] + b"\xff" * 7 + b"\x3B"
    interlaced = bytearray(good)
    interlaced[bytes(interlaced).find(b"\x2C") + 9] |= 0x40
    hdr_only = b"GIF89a" + struct.pack("<HH", 6, 4) + bytes([7] * 60)
    df = spark.createDataFrame(
        [(1, good), (2, corrupt), (3, bytes(interlaced)), (4, hdr_only)],
        "media_id long, payload binary")
    out = {r["media_id"]: r for r in
           decode_image_features(attach_media_metadata(df)).collect()}
    assert out[1]["decode_error"] is None
    assert (out[1]["mean_r"], out[1]["mean_g"], out[1]["mean_b"]) == \
        (9.0, 8.0, 7.0)
    assert out[2]["decode_error"] is not None
    assert "interlaced" in (out[3]["decode_error"] or "")
    assert out[4]["decode_error"] is None          # fake fallback
    assert (out[4]["width"], out[4]["height"]) == (6, 4)


def test_synthesize_bmp_out_of_range_is_loud(spark):
    """Dimensions whose header fields overflow u32 must yield a NULL
    payload (→ per-row decode error), never a silently corrupt header."""
    from jema_js_spark.operators.multimodal import synthesize_bmp

    df = spark.range(1).select(
        F.col("id").alias("media_id"),
        synthesize_bmp(F.lit(50_000_000), F.lit(29),
                       F.lit(1), F.lit(2), F.lit(3)).alias("payload"))
    out = decode_image_features(
        attach_media_metadata(df)).collect()
    assert len(out) == 1 and out[0]["decode_error"] is not None


def test_decode_features(media):
    out = decode_image_features(media).collect()
    assert len(out) == 20
    ok = [r for r in out if r["decode_error"] is None]
    assert len(ok) == 20
    for r in ok:
        assert r["width"] >= 32 and r["height"] >= 32
        assert 0 <= r["mean_r"] <= 255


def test_decode_determinism(media):
    a = {r["media_id"]: r["mean_r"] for r in decode_image_features(media).collect()}
    b = {r["media_id"]: r["mean_r"] for r in
         decode_image_features(media.repartition(7)).collect()}
    assert a == b


def test_decode_error_isolated(spark):
    # a row with no metadata must yield a per-row error, not a task crash
    df = spark.createDataFrame(
        [(1, b"xx")], "media_id long, payload binary"
    ).withColumn("kind", F.lit("image")).withColumn(
        "meta", F.lit(None).cast(
            "struct<width:int,height:int,channels:int,sample_rate:int,"
            "n_frames:int,duration_ms:int>"))
    out = decode_image_features(df).collect()
    assert len(out) == 1 and out[0]["decode_error"] is not None


def test_resize(media):
    out = resize_images(media, target=16).collect()
    assert len(out) == 20
    for r in out:
        assert r["meta"]["width"] == 16 and r["meta"]["height"] == 16
        assert len(bytes(r["payload"])) == 16 * 16 * 3


def test_video_frame_sampling(spark):
    df = spark.createDataFrame(
        [(1, 100, 4000), (2, 10, 400)],
        "media_id long, n_frames int, duration_ms int"
    ).select("media_id", F.struct(
        F.lit(64).alias("width"), F.lit(64).alias("height"),
        F.lit(3).alias("channels"), F.lit(None).cast("int").alias("sample_rate"),
        F.col("n_frames"), F.col("duration_ms")).alias("meta"))
    out = sample_video_frames(df, every_ms=1000).collect()
    per_id = {}
    for r in out:
        per_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    # 100 frames / 4000ms at 1 frame/s → every 25th frame
    assert per_id[1][:3] == [0, 25, 50]
    assert len(per_id[2]) >= 1


def test_animated_gif_frame_roundtrip():
    import numpy as np
    from jema_js_spark.operators.multimodal import _iter_gif_frames, gif_bytes

    frames = np.stack([
        np.full((3, 4, 3), [f * 50, 255 - f * 40, f * 13], dtype=np.uint8)
        for f in range(5)])
    payload = gif_bytes(frames, delay_cs=7)
    got = dict(_iter_gif_frames(payload))
    assert sorted(got) == [0, 1, 2, 3, 4]
    for f in range(5):
        assert np.array_equal(got[f], frames[f]), f
    # want-predicate: unsampled frames skip LZW but are still counted
    sampled = dict(_iter_gif_frames(payload, want=lambda i: i % 2 == 0))
    assert sampled[1] is None and sampled[3] is None
    assert np.array_equal(sampled[4], frames[4])


def test_gif_partial_frame_video_vs_image_paths():
    # review pin (round 4): the full-screen-frame restriction belongs to
    # the VIDEO path only — an optimized still GIF whose first frame is
    # smaller than the logical screen must keep decoding standalone,
    # exactly as the pre-round-4 single-frame decoder did
    import numpy as np
    from jema_js_spark.operators.multimodal import (
        _decode_gif, _iter_gif_frames, gif_bytes)

    payload = bytearray(gif_bytes(np.full((2, 2, 3), 9, dtype=np.uint8)))
    payload[6:8] = (3).to_bytes(2, "little")  # screen wider than frame
    arr = _decode_gif(bytes(payload))         # image path: still decodes
    assert arr.shape == (2, 2, 3) and int(arr[0, 0, 0]) == 9
    with pytest.raises(NotImplementedError, match="compositing"):
        list(_iter_gif_frames(bytes(payload), full_frames_only=True))


def test_video_frames_bad_knobs_rejected(spark):
    from jema_js_spark.operators.multimodal import decode_video_frames

    df = spark.createDataFrame([(1, b"x")], "media_id long, payload binary")
    with pytest.raises(ValueError, match="every_n"):
        decode_video_frames(df, every_n=0)
    with pytest.raises(ValueError, match="max_frames"):
        decode_video_frames(df, every_n=1, max_frames=0)


def test_wav_truncated_data_is_loud():
    import numpy as np
    from jema_js_spark.operators.multimodal import _decode_wav, wav_bytes

    good = wav_bytes(np.ones(200, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="truncated"):
        _decode_wav(good[:-100])   # data chunk shorter than declared


def test_non_wav_payload_gets_no_duration(spark):
    # review pin (round 4): duration must be gated on the WAV magic —
    # a payload whose bytes happen to spell 'data' at the canonical
    # offset must not get a fabricated duration
    fake = bytearray(b"GIF89a" + bytes(60))
    fake[24:28] = (8000).to_bytes(4, "little")   # plausible "rate"
    fake[22:24] = (1).to_bytes(2, "little")      # plausible "channels"
    fake[34:36] = (16).to_bytes(2, "little")     # plausible "bits"
    fake[36:40] = b"data"
    fake[40:44] = (16000).to_bytes(4, "little")
    df = spark.createDataFrame([(1, bytes(fake))],
                               "media_id long, payload binary")
    meta = attach_media_metadata(df).collect()[0]["meta"]
    assert meta["duration_ms"] is None and meta["sample_rate"] is None


def test_decode_video_frames_spark(spark):
    import numpy as np
    from jema_js_spark.operators.multimodal import (
        decode_video_frames, gif_bytes)

    rows = []
    for i in range(6):
        n = i % 3 + 1          # 1..3 frames
        frames = np.stack([
            np.full((2, 2, 3), [(i * 9 + f * 5) % 256, f, i], dtype=np.uint8)
            for f in range(n)])
        rows.append((i, bytearray(gif_bytes(frames))))
    rows.append((99, bytearray(b"not a video")))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = decode_video_frames(df, every_n=2).collect()
    errs = [r for r in out if r["decode_error"] is not None]
    assert [r["media_id"] for r in errs] == [99]
    by_key = {(r["media_id"], r["frame_idx"]): r for r in out
              if r["decode_error"] is None}
    for i in range(6):
        n = i % 3 + 1
        for f in range(0, n, 2):
            r = by_key.pop((i, f))
            assert r["n_frames"] == n
            assert (r["mean_r"], r["mean_g"], r["mean_b"]) == \
                ((i * 9 + f * 5) % 256, f, i)
    assert not by_key      # no extra (odd-frame) rows leaked
    # max_frames cap is honored
    capped = decode_video_frames(df, every_n=1, max_frames=2).collect()
    per_id = {}
    for r in capped:
        if r["decode_error"] is None:
            per_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert per_id[2] == [0, 1]   # 3 frames, capped at 2


def test_wav_roundtrip_and_guards():
    import numpy as np
    from jema_js_spark.operators.multimodal import _decode_wav, wav_bytes

    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32768, size=500, dtype=np.int16)
    samples, rate = _decode_wav(wav_bytes(mono, 12000))
    assert rate == 12000 and np.array_equal(samples[:, 0], mono)
    stereo = rng.integers(-32768, 32768, size=(300, 2), dtype=np.int16)
    samples2, _ = _decode_wav(wav_bytes(stereo, 8000))
    assert np.array_equal(samples2, stereo)
    with pytest.raises(ValueError, match="RIFF"):
        _decode_wav(b"nope")
    # non-PCM format byte → loud NotImplementedError
    bad = bytearray(wav_bytes(mono, 8000))
    bad[20:22] = (3).to_bytes(2, "little")  # IEEE float format
    with pytest.raises(NotImplementedError, match="PCM"):
        _decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="fmt/data"):
        _decode_wav(b"RIFF\x00\x00\x00\x00WAVE")


def test_decode_audio_features_vs_numpy(spark):
    import numpy as np
    from jema_js_spark.operators.multimodal import (
        decode_audio_features, wav_bytes)

    rng = np.random.default_rng(11)
    rows, expect = [], {}
    for i in range(8):
        s = rng.integers(-20000, 20000, size=64 + i * 16, dtype=np.int16)
        rows.append((i, bytearray(wav_bytes(s, 8000 + i * 1000))))
        f = s.astype(np.float64)
        expect[i] = (len(s), int(np.abs(f).max()),
                     float(np.sqrt(np.mean(f * f))), float(f.mean()))
    rows.append((99, bytearray(b"RIFFxxxxWAVE")))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_audio_features(df).collect()}
    assert out[99]["decode_error"] is not None
    for i in range(8):
        r = out[i]
        assert r["decode_error"] is None
        assert r["sample_rate"] == 8000 + i * 1000
        n, peak, rms, mean = expect[i]
        assert r["n_samples"] == n and r["peak"] == peak
        assert r["rms"] == pytest.approx(rms, abs=0)
        assert r["mean_amp"] == pytest.approx(mean, abs=0)
        assert r["duration_ms"] == pytest.approx(n * 1000 / r["sample_rate"])


def test_stereo_and_8bit_wav_decode_features(spark):
    """Round-5 decoder extensions (VERDICT r4 #6/#7): stereo per-channel
    RMS, 8-bit centered decode, zero-crossing rate, and FFT dominant
    frequency — all against closed-form planted waveforms."""
    import numpy as np
    from jema_js_spark.operators.multimodal import (
        _decode_wav, decode_audio_features, wav_bytes)

    # 8-bit round-trip: centered contract
    vals = np.array([-128, -1, 0, 1, 127, 64, -64], dtype=np.int16)
    samples, rate = _decode_wav(wav_bytes(vals, 8000, bits=8))
    assert rate == 8000 and (samples[:, 0] == vals).all()
    with pytest.raises(ValueError):
        wav_bytes(np.array([300]), bits=8)
    # unsupported bit depth stays a loud NotImplementedError
    import struct
    hdr24 = (b"RIFF" + struct.pack("<I", 40) + b"WAVE"
             + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                     8000 * 3, 3, 24)
             + b"data" + struct.pack("<I", 3) + b"\x00\x00\x00")
    with pytest.raises(NotImplementedError):
        _decode_wav(hdr24)

    # stereo square L=(a,-a), R=(b,b): closed-form per-channel features
    n_pairs, a, b_ = 40, 12000, 5000
    left = np.tile([a, -a], n_pairs)
    right = np.tile([b_, b_], n_pairs)
    stereo = np.stack([left, right], axis=1).astype(np.int16)
    mono8 = np.tile([60, -60], 30).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(wav_bytes(stereo, 16000))),
         (2, bytearray(wav_bytes(mono8, 8000, bits=8)))],
        "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_audio_features(df).collect()}

    st = out[1]
    assert st["decode_error"] is None and st["n_channels"] == 2
    assert st["n_samples"] == 2 * n_pairs
    assert st["rms_left"] == float(a)            # |±a| rms exactly a
    assert st["rms_right"] == float(b_)
    assert st["zcr"] == 1.0                      # ch0 alternates sign
    assert st["dominant_hz"] == 16000 / 2        # Nyquist exactly
    assert st["peak"] == a
    # flat overall rms = sqrt((a²+b²)/2) over interleaved samples
    assert st["rms"] == pytest.approx(
        float(np.sqrt((a * a + b_ * b_) / 2.0)), abs=0)

    m8 = out[2]
    assert m8["decode_error"] is None and m8["n_channels"] == 1
    assert m8["rms"] == 60.0 and m8["peak"] == 60
    assert m8["zcr"] == 1.0 and m8["dominant_hz"] == 8000 / 2
    assert m8["rms_right"] is None

    # constant wave: zcr 0, flat spectrum reports 0.0 (not FFT noise)
    const = np.full(50, 900, dtype=np.int16)
    dfc = spark.createDataFrame([(3, bytearray(wav_bytes(const, 8000)))],
                                "media_id long, payload binary")
    rc = decode_audio_features(dfc).collect()[0]
    assert rc["zcr"] == 0.0 and rc["dominant_hz"] == 0.0


def test_synthesize_wav_matches_python_writer(spark):
    import numpy as np
    from jema_js_spark.operators.multimodal import synthesize_wav, wav_bytes

    df = spark.range(1).select(synthesize_wav(
        F.lit(12), F.lit(16000), F.lit(-15000), F.lit(9999)).alias("payload"))
    got = bytes(df.collect()[0]["payload"])
    want = wav_bytes(np.tile(np.array([-15000, 9999], np.int16), 12), 16000)
    assert got == want
    # out-of-range knobs → NULL payload (loud downstream), never overflow
    bad = spark.range(1).select(synthesize_wav(
        F.lit(0), F.lit(16000), F.lit(1), F.lit(2)).alias("p")).collect()
    assert bad[0]["p"] is None
    bad2 = spark.range(1).select(synthesize_wav(
        F.lit(4), F.lit(8000), F.lit(40000), F.lit(0)).alias("p")).collect()
    assert bad2[0]["p"] is None


def test_attach_media_metadata_wav(spark):
    import numpy as np
    from jema_js_spark.operators.multimodal import wav_bytes

    s = np.zeros(16000, dtype=np.int16)   # 1 s at 16 kHz mono
    df = spark.createDataFrame(
        [(1, bytearray(wav_bytes(s, 16000)))],
        "media_id long, payload binary")
    meta = attach_media_metadata(df, kind="audio").collect()[0]["meta"]
    assert meta["sample_rate"] == 16000
    assert meta["channels"] == 1
    assert meta["duration_ms"] == 1000
    assert meta["width"] is None and meta["n_frames"] is None


def _fuzz_prefixes():
    return [b"", b"BM", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a",
            b"RIFF", b"RIFF\x10\x00\x00\x00WAVEfmt ", b"\xff\xd8",
            b"\xff\xd8\xff\xdb\x00\x43\x00" + b"\x10" * 64]


def test_codec_fuzz_no_hangs_and_wellformed_success():
    """Adversarial-bytes pin for every built-in decoder: anything may
    raise (the mapInPandas wrappers catch per-row), but decode must
    TERMINATE, and when it succeeds the result must be well-formed —
    the properties that keep a corrupt blob from wedging a 2 GB task."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from jema_js_spark.operators.multimodal import (
        _decode_bmp, _decode_gif, _decode_jpeg, _decode_png, _decode_wav)

    @settings(max_examples=250, deadline=None)
    @given(prefix=st.sampled_from(_fuzz_prefixes()),
           junk=st.binary(max_size=400))
    def run(prefix, junk):
        payload = prefix + junk
        for fn in (_decode_bmp, _decode_png, _decode_gif, _decode_jpeg):
            try:
                arr = fn(payload)
            except Exception:
                continue
            assert isinstance(arr, np.ndarray) and arr.dtype == np.uint8
            assert arr.ndim == 3 and arr.size > 0
        try:
            samples, rate = _decode_wav(payload)
        except Exception:
            return
        assert rate > 0 and samples.ndim == 2 and len(samples) > 0

    run()


def test_checkpoint_resume(spark):
    df = spark.range(100).withColumn("day", F.pmod(F.col("id"), F.lit(5)))
    with tempfile.TemporaryDirectory() as tmp:
        ledger = CheckpointLedger(spark, f"{tmp}/ledger", run_id="r1")
        calls = []

        def work(part, key):
            calls.append(key)
            return {"n": part.count()}

        r1 = run_partitioned(spark, df, "day", ledger, work)
        assert len(calls) == 5 and all(m["n"] == 20 for m in r1.values())

        # simulated crash-resume: second run must skip all completed work
        calls.clear()
        r2 = run_partitioned(spark, df, "day", ledger, work)
        assert calls == []
        assert all(m.get("skipped") for m in r2.values())

        # partial ledger: wipe two keys under a new run id → only those rerun
        ledger2 = CheckpointLedger(spark, f"{tmp}/ledger", run_id="r2")
        ledger2.mark_done("0", {})
        ledger2.mark_done("1", {})
        calls.clear()
        run_partitioned(spark, df, "day", ledger2, work)
        assert sorted(calls) == ["2", "3", "4"]


def test_checkpoint_key_provider_paths(spark):
    """Round 6 (VERDICT r5 #7): the planner accepts a metadata key
    provider — hive directory listing yields the same todo list as the
    distinct scan, resume skips through it identically, and the
    Iceberg provider fails loudly on a catalog-less session instead of
    silently planning nothing."""
    from jema_js_spark.runtime.checkpoint import (hive_partition_keys,
                                                  iceberg_partition_keys)

    df = spark.range(60).withColumn(
        "day", F.concat(F.lit("d"), F.pmod(F.col("id"), F.lit(4))))
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/tbl"
        df.write.partitionBy("day").parquet(path)
        provider = hive_partition_keys(spark, path, "day")
        assert provider() == ["d0", "d1", "d2", "d3"]

        src = spark.read.parquet(path)
        ledger = CheckpointLedger(spark, f"{tmp}/ledger", run_id="h1")
        calls = []

        def work(part, key):
            calls.append(key)
            return {"n": part.count()}

        r1 = run_partitioned(spark, src, "day", ledger, work,
                             key_provider=provider)
        assert sorted(calls) == ["d0", "d1", "d2", "d3"]
        assert all(m["n"] == 15 for m in r1.values())
        calls.clear()
        r2 = run_partitioned(spark, src, "day", ledger, work,
                             key_provider=provider)
        assert calls == [] and all(m.get("skipped") for m in r2.values())

    import pytest as _pytest
    with _pytest.raises(Exception):
        iceberg_partition_keys(spark, "nosuch.catalog.tbl", "day")()


def test_checkpoint_hive_keys_unescape_and_null_partition(spark):
    """Round-6 review find: hive directory names carry %xx escaping
    and nulls land in __HIVE_DEFAULT_PARTITION__ — filtering on the
    raw directory name would process ZERO rows and still mark the key
    done.  The provider must unescape, and both planner paths must
    route the null partition through an isNull filter."""
    from jema_js_spark.runtime.checkpoint import (NULL_KEY,
                                                  hive_partition_keys)

    df = spark.createDataFrame(
        [(1, "a:b"), (2, "a:b"), (3, "plain"), (4, None), (5, None)],
        "id long, day string")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/tbl"
        df.write.partitionBy("day").parquet(path)
        provider = hive_partition_keys(spark, path, "day")
        # providers return the RAW null (None sorts last); the planner
        # owns the sentinel mapping so it can also detect collisions
        assert provider() == ["a:b", "plain", None]

        src = spark.read.parquet(path)
        counts = {}

        def work(part, key):
            counts[key] = part.count()
            return {"n": counts[key]}

        for kp in (provider, None):        # both planner paths
            counts.clear()
            ledger = CheckpointLedger(spark, f"{tmp}/ledger_{kp is None}",
                                      run_id="e1")
            run_partitioned(spark, src, "day", ledger, work,
                            key_provider=kp)
            assert counts == {"a:b": 2, "plain": 1, NULL_KEY: 2}, counts


def test_checkpoint_iceberg_provider_keeps_raw_null(spark):
    """ADVICE r6 (medium): the Iceberg provider used to str() every
    value, turning a NULL partition into the string 'None' — the
    planner's col=='None' filter then processed ZERO rows and the
    ledger marked the day done (silent skip).  The provider must
    return the raw None so run_partitioned's NULL_KEY mapping and
    isNull filter fire.  Mirrors the `.partitions` metadata-table
    shape with a real database table."""
    from jema_js_spark.runtime.checkpoint import (NULL_KEY,
                                                  iceberg_partition_keys)

    spark.sql("CREATE DATABASE IF NOT EXISTS ice_meta_t")
    try:
        (spark.createDataFrame([("d1",), ("d2",), (None,)], "day string")
         .select(F.struct(F.col("day")).alias("partition"))
         .write.mode("overwrite").saveAsTable("ice_meta_t.partitions"))
        keys = iceberg_partition_keys(spark, "ice_meta_t", "day")()
        assert keys == ["d1", "d2", None]

        df = spark.createDataFrame(
            [(1, "d1"), (2, None), (3, None)], "id long, day string")
        counts = {}

        def work(part, key):
            counts[key] = part.count()
            return {"n": counts[key]}

        with tempfile.TemporaryDirectory() as tmp:
            ledger = CheckpointLedger(spark, f"{tmp}/ledger", run_id="i1")
            run_partitioned(spark, df, "day", ledger, work,
                            key_provider=lambda: ["d1", None])
        assert counts == {"d1": 1, NULL_KEY: 2}, counts
    finally:
        spark.sql("DROP TABLE IF EXISTS ice_meta_t.partitions")
        spark.sql("DROP DATABASE IF EXISTS ice_meta_t")


def test_checkpoint_sentinel_collision_raises(spark):
    """ADVICE r6 (low): a GENUINE partition value equal to the null
    sentinel would be filtered isNull → zero rows, ledger done.  The
    planner refuses loudly instead, on both planning paths."""
    from jema_js_spark.runtime.checkpoint import NULL_KEY

    df = spark.createDataFrame(
        [(1, NULL_KEY), (2, "ok")], "id long, day string")
    with tempfile.TemporaryDirectory() as tmp:
        ledger = CheckpointLedger(spark, f"{tmp}/ledger", run_id="c1")
        for kp in (lambda: [NULL_KEY, "ok"], None):
            with pytest.raises(ValueError, match="null sentinel"):
                run_partitioned(spark, df, "day", ledger,
                                lambda part, key: {}, key_provider=kp)


def test_checkpoint_typed_keys_filter_on_raw_value(spark):
    """Round-7 review find: filtering with cast(col as string)==str(k)
    silently skips types where Python str() and Spark CAST disagree —
    str(True) is 'True' but CAST renders 'true', so a boolean
    partition processed ZERO rows and was marked done.  The filter now
    compares the raw typed value; stringification collisions between
    distinct raw values refuse loudly."""
    df = spark.createDataFrame(
        [(1, True), (2, False), (3, True)], "id long, flag boolean")
    counts = {}

    def work(part, key):
        counts[key] = part.count()
        return {"n": counts[key]}

    with tempfile.TemporaryDirectory() as tmp:
        ledger = CheckpointLedger(spark, f"{tmp}/ledger", run_id="b1")
        run_partitioned(spark, df, "flag", ledger, work,
                        key_provider=lambda: [True, False])
    assert counts == {"True": 2, "False": 1}, counts

    # distinct raw values stringifying to one ledger key: loud
    with tempfile.TemporaryDirectory() as tmp:
        ledger = CheckpointLedger(spark, f"{tmp}/ledger", run_id="b2")
        with pytest.raises(ValueError, match="stringify"):
            run_partitioned(spark, df, "flag", ledger, work,
                            key_provider=lambda: [True, "True"])


def test_custom_audio_decoder_accepts_1d_mono(spark):
    # round-5 review find: the per-channel refactor broke 1-D mono
    # arrays from set_decoder plugins (accepted pre-round-5)
    import numpy as np
    from jema_js_spark.operators.multimodal import (
        _DECODERS, decode_audio_features, set_decoder)

    set_decoder("audio", lambda payload, meta: (
        np.array([5, -5, 5, -5], dtype=np.int16), 4000))
    try:
        df = spark.createDataFrame([(1, bytearray(b"anything"))],
                                   "media_id long, payload binary")
        r = decode_audio_features(df).collect()[0]
        assert r["decode_error"] is None
        assert r["n_channels"] == 1 and r["n_samples"] == 4
        assert r["rms"] == 5.0 and r["zcr"] == 1.0
    finally:
        _DECODERS.pop("audio", None)


def test_jpeg_uncovered_components_are_loud():
    # round-5 review find, generalized in round 6: a 3-component SOF
    # whose scans only ever cover component 1 must not silently decode
    # the other two as flat mid-gray planes (multi-scan sequential
    # baseline itself is now SUPPORTED — see
    # test_progressive_jpeg_matches_baseline)
    import struct

    import pytest as _pytest

    from jema_js_spark.operators.multimodal import _decode_jpeg, jpeg_bytes
    import numpy as np

    payload = bytearray(jpeg_bytes(
        np.full((8, 8, 3), [100, 120, 140], dtype=np.uint8), ycbcr=True))
    # rewrite the SOS header to a single-component scan
    i = payload.find(b"\xff\xda")
    assert i > 0
    (old_len,) = struct.unpack(">H", payload[i + 2:i + 4])
    new_sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00" \
        + b"\x00\x3f\x00"
    payload[i:i + 2 + old_len] = new_sos
    with _pytest.raises(ValueError, match="never cover"):
        _decode_jpeg(bytes(payload))


def test_progressive_jpeg_matches_baseline():
    """The progressive (SOF2) decode path must deliver EXACTLY the
    coefficients the baseline encoding of the same pixels carries —
    pixel-for-pixel equality between decoding jpeg_progressive_bytes
    and jpeg_bytes output, across grayscale/RGB/YCbCr, 4:4:4 and
    4:2:0, spectral-selection-only and full successive approximation
    (all four progressive block decoders + EOB runs + correction
    bits)."""
    import numpy as np

    from jema_js_spark.operators.multimodal import (
        _decode_jpeg, jpeg_bytes, jpeg_progressive_bytes)

    rng = np.random.default_rng(606)
    xs = np.linspace(0, 255, 37)
    grad = np.tile(xs, (19, 1)).astype(np.uint8)[..., None]
    noisy = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    solid = np.full((16, 16, 3), [88, 120, 160], dtype=np.uint8)
    cases = [
        (grad, {}),                          # grayscale gradient
        (noisy, {}),                         # RGB noise (dense AC)
        (noisy, {"subsampling": "420"}),     # chroma subsampling
        (solid, {"ycbcr": True}),            # solid: EOB-run-only ACs
        (np.full((40, 40, 1), 50, np.uint8), {}),   # many all-zero
    ]
    for arr, kw in cases:
        want = _decode_jpeg(jpeg_bytes(arr, **kw))
        for successive in (False, True):
            got = _decode_jpeg(jpeg_progressive_bytes(
                arr, successive=successive, **kw))
            assert got.shape == want.shape, (kw, successive)
            assert (got == want).all(), (
                kw, successive,
                int(np.abs(got.astype(int) - want.astype(int)).max()))


def test_progressive_jpeg_solid_plants_exact():
    """Solid even-valued YCbCr plants stay DC-only-exact through the
    progressive path — the property the media_pixels oracle rows rely
    on."""
    import numpy as np

    from jema_js_spark.operators.multimodal import (
        _decode_jpeg, jpeg_progressive_bytes)

    for y, cb, cr in [(90, 120, 140), (16, 128, 128), (250, 100, 200)]:
        arr = np.full((12, 20, 3), [y, cb, cr], dtype=np.uint8)
        got = _decode_jpeg(jpeg_progressive_bytes(arr, ycbcr=True))
        r = min(max(int(np.floor(y + 1.402 * (cr - 128.0) + 0.5)), 0), 255)
        g = min(max(int(np.floor(y - 0.344136 * (cb - 128.0)
                                 - 0.714136 * (cr - 128.0) + 0.5)), 0), 255)
        b = min(max(int(np.floor(y + 1.772 * (cb - 128.0) + 0.5)), 0), 255)
        assert (got == np.array([r, g, b])).all(), (y, cb, cr)


def test_sequential_baseline_multiscan_jpeg():
    """Round 6 claims multi-scan SEQUENTIAL baseline decode (one scan
    per component, SOF0, full spectrum).  Build such a file from the
    encoder's shared pieces and pin pixel-equality with the interleaved
    baseline encoding of the same data."""
    import struct

    import numpy as np

    from jema_js_spark.operators.multimodal import (
        _decode_jpeg, _jpeg_coeff_blocks, _jpeg_planes, _JpegBitWriter,
        jpeg_bytes)

    rng = np.random.default_rng(77)
    arr = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    h, w, nc, planes3, sub = _jpeg_planes(arr, False, "444")
    q = np.full(64, 16, dtype=np.int64)
    coeffs = _jpeg_coeff_blocks(planes3, q, 1, 1, -(-w // 8), -(-h // 8))

    dc_values = list(range(12))
    dc_counts = [0] * 16
    dc_counts[3] = 12
    ac_values = [0x00, 0xF0] + [(r << 4) | s
                                for r in range(16) for s in range(1, 11)]
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_values)
    dc_code = {v: (i, 4) for i, v in enumerate(dc_values)}
    ac_code = {v: (i, 8) for i, v in enumerate(ac_values)}

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) \
        + bytes(int(x) for x in q)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid in (1, 2, 3):
        out += bytes([cid, 0x11, 0])
    for tc, counts, values in ((0, dc_counts, dc_values),
                               (1, ac_counts, ac_values)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) \
            + bytes([tc << 4]) + bytes(counts) + bytes(values)

    def emit_block(wtr, zz, pred):
        diff = int(zz[0]) - pred
        s = int(abs(diff)).bit_length()
        c, ln = dc_code[s]
        wtr.put(c, ln)
        if s:
            wtr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        k = 1
        while k < 64:
            run = 0
            while k < 64 and zz[k] == 0:
                run += 1
                k += 1
            if k == 64:
                c, ln = ac_code[0x00]
                wtr.put(c, ln)
                break
            while run > 15:
                c, ln = ac_code[0xF0]
                wtr.put(c, ln)
                run -= 16
            v = int(zz[k])
            s = int(abs(v)).bit_length()
            c, ln = ac_code[(run << 4) | s]
            wtr.put(c, ln)
            wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
            k += 1
        return int(zz[0])

    for ci, cid in enumerate((1, 2, 3)):     # one full-band scan each
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([cid, 0]) \
            + b"\x00\x3f\x00"
        wtr = _JpegBitWriter()
        pred = 0
        bh, bw, _ = coeffs[ci].shape
        for by in range(bh):
            for bx in range(bw):
                pred = emit_block(wtr, coeffs[ci][by, bx], pred)
        wtr.align()
        out += wtr.out
    out += b"\xff\xd9"

    got = _decode_jpeg(bytes(out))
    want = _decode_jpeg(jpeg_bytes(arr))
    assert got.shape == want.shape
    assert (got == want).all(), \
        int(np.abs(got.astype(int) - want.astype(int)).max())


def test_progressive_jpeg_with_restart_markers():
    """Restart markers inside progressive scans must reset the DC
    predictor AND the EOB run at each interval (T.81 G.1.1) — pinned
    by a hand-built SOF2 stream with DRI in both scan types, decoding
    pixel-equal to the baseline encoding."""
    import struct

    import numpy as np

    from jema_js_spark.operators.multimodal import (
        _decode_jpeg, _jpeg_coeff_blocks, _jpeg_planes, _JpegBitWriter,
        jpeg_bytes)

    xs = np.linspace(0, 250, 29)
    arr = np.tile(xs, (17, 1)).astype(np.uint8)[..., None]
    h, w, nc, planes3, sub = _jpeg_planes(arr, False, "444")
    q = np.full(64, 16, dtype=np.int64)
    bw_, bh_ = -(-w // 8), -(-h // 8)
    coeffs = _jpeg_coeff_blocks(planes3, q, 1, 1, bw_, bh_)[0]

    dc_values = list(range(12))
    dc_counts = [0] * 16
    dc_counts[3] = 12
    ac_values = [(r << 4) | s for r in range(16) for s in range(11)]
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_values)
    dc_code = {v: (i, 4) for i, v in enumerate(dc_values)}
    ac_code = {v: (i, 8) for i, v in enumerate(ac_values)}

    interval = 3
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) \
        + bytes(int(x) for x in q)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1) \
        + bytes([1, 0x11, 0])
    for tc, counts, values in ((0, dc_counts, dc_values),
                               (1, ac_counts, ac_values)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) \
            + bytes([tc << 4]) + bytes(counts) + bytes(values)
    out += b"\xff\xdd" + struct.pack(">HH", 4, interval)

    # DC-first scan with restarts: predictor resets per interval
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00" \
        + b"\x00\x00\x00"
    wtr = _JpegBitWriter()
    pred, unit, rst = 0, 0, 0
    blocks = [coeffs[by, bx] for by in range(bh_) for bx in range(bw_)]
    body = bytearray()
    for zz in blocks:
        if unit and unit % interval == 0:
            wtr.align()
            body += wtr.out + bytes([0xFF, 0xD0 + rst % 8])
            wtr = _JpegBitWriter()
            rst += 1
            pred = 0
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s = int(abs(diff)).bit_length()
        c, ln = dc_code[s]
        wtr.put(c, ln)
        if s:
            wtr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        unit += 1
    wtr.align()
    body += wtr.out
    out += body

    # AC-first scan (1..63) with restarts: EOB run must flush at each
    def emit_ac(wtr, zz, eobrun):
        ts = [int(zz[k]) for k in range(1, 64)]
        if not any(ts):
            eobrun += 1
            return eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            c, ln = ac_code[nb << 4]
            wtr.put(c, ln)
            if nb:
                wtr.put(eobrun & ((1 << nb) - 1), nb)
            eobrun = 0
        r = 0
        for t in ts:
            if t == 0:
                r += 1
                continue
            while r > 15:
                c, ln = ac_code[0xF0]
                wtr.put(c, ln)
                r -= 16
            s = int(abs(t)).bit_length()
            c, ln = ac_code[(r << 4) | s]
            wtr.put(c, ln)
            wtr.put(t if t >= 0 else t + (1 << s) - 1, s)
            r = 0
        if r:
            eobrun += 1
        return eobrun

    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00" \
        + b"\x01\x3f\x00"
    wtr = _JpegBitWriter()
    eobrun, unit = 0, 0
    body = bytearray()
    for zz in blocks:
        if unit and unit % interval == 0:
            if eobrun:                    # flush before the marker
                nb = eobrun.bit_length() - 1
                c, ln = ac_code[nb << 4]
                wtr.put(c, ln)
                if nb:
                    wtr.put(eobrun & ((1 << nb) - 1), nb)
                eobrun = 0
            wtr.align()
            body += wtr.out + bytes([0xFF, 0xD0 + rst % 8])
            wtr = _JpegBitWriter()
            rst += 1
        eobrun = emit_ac(wtr, zz, eobrun)
        unit += 1
    if eobrun:
        nb = eobrun.bit_length() - 1
        c, ln = ac_code[nb << 4]
        wtr.put(c, ln)
        if nb:
            wtr.put(eobrun & ((1 << nb) - 1), nb)
    wtr.align()
    body += wtr.out
    out += body + b"\xff\xd9"

    got = _decode_jpeg(bytes(out))
    want = _decode_jpeg(jpeg_bytes(arr))
    assert got.shape == want.shape
    assert (got == want).all(), \
        int(np.abs(got.astype(int) - want.astype(int)).max())
