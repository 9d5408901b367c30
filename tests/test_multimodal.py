"""Multimodal binary-column plumbing: header parsing, stub features,
frame sampling (real decode paths raise NotImplementedError by design)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from nrt_ray.stages import multimodal as mm


def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x06"
            + b"\x00" * 32)


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") \
        + b"\x00" * 16


def _jpeg(w, h):
    # SOI + APP0 stub + SOF0 with dims
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof = b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08" \
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    return b"\xff\xd8" + app0 + sof + b"\x00" * 8


def test_parse_image_headers():
    assert mm.parse_image_header(_png(640, 480)) == ("png", 640, 480)
    assert mm.parse_image_header(_gif(32, 16)) == ("gif", 32, 16)
    assert mm.parse_image_header(_jpeg(1024, 768)) == ("jpeg", 1024, 768)
    assert mm.parse_image_header(b"garbage") == (None, 0, 0)


def test_image_meta_batch():
    batch = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([_png(10, 20), _jpeg(30, 40), b"x"],
                            pa.binary()),
    })
    out = mm.ImageMeta()(batch)
    assert out.column("img_format").to_pylist() == ["png", "jpeg", None]
    assert out.column("img_width").to_pylist() == [10, 30, 0]
    assert out.column("img_height").to_pylist() == [20, 40, 0]


def test_stub_features_deterministic_unit_norm():
    stage = mm.ImageFeatures(dim=64)
    batch = pa.table({"id": pa.array([1, 2], pa.int64()),
                      "payload": pa.array([b"abc", b"abc"], pa.binary())})
    out = stage(batch)
    f = np.array(out.column("features").to_pylist())
    assert f.shape == (2, 64)
    np.testing.assert_array_equal(f[0], f[1])
    np.testing.assert_allclose(np.linalg.norm(f, axis=1), 1.0, rtol=1e-5)
    assert "payload" not in out.column_names


def test_real_decode_raises_for_library_formats():
    # BMP/PNG/JPEG/GIF real decode works (tested below); unknown formats
    # raise at the per-payload plug-in point; chunked video "demux" at
    # the ctor (real container demux lives in AviFrameSampler)
    stage = mm.ImageFeatures(decode="real")
    batch = pa.table({"id": pa.array([1], pa.int64()),
                      "payload": pa.array([b"unknown-bytes"],
                                          pa.binary())})
    with pytest.raises(NotImplementedError):
        stage(batch)
    with pytest.raises(NotImplementedError):
        mm.FrameSampler(decode="real")


def test_real_features_from_jpeg_pixels():
    # even-constant blocks decode pixel-exact, so JPEG real features
    # must equal the BMP features of the same image
    vb = np.array([[20, 144, 128]], np.uint8)   # even values: exact
    img = np.kron(vb, np.ones((8, 8), np.uint8))
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    fj = mm.ImageFeatures(dim=16, decode="real")(pa.table({
        "id": pa.array([1], pa.int64()),
        "payload": pa.array([mm.encode_jpeg(img)], pa.binary())}))
    fb = mm.ImageFeatures(dim=16, decode="real")(pa.table({
        "id": pa.array([1], pa.int64()),
        "payload": pa.array([mm.encode_bmp(rgb)], pa.binary())}))
    a = np.array(fj.column("features").to_pylist())
    b = np.array(fb.column("features").to_pylist())
    np.testing.assert_array_equal(a, b)


def test_real_features_from_decoded_pixels():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    batch = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([mm.encode_bmp(img),
                             mm.encode_png(img)], pa.binary()),
    })
    out = mm.ImageFeatures(dim=32, decode="real")(batch)
    f = np.array(out.column("features").to_pylist())
    assert f.shape == (2, 32)
    # same pixels through BMP and PNG → identical real features
    np.testing.assert_array_equal(f[0], f[1])
    np.testing.assert_allclose(np.linalg.norm(f, axis=1), 1.0, rtol=1e-5)
    # and they reflect the pixels, not the bytes: a brighter image shifts
    # mass to higher histogram bins
    bright = mm.encode_png(np.full((9, 7, 3), 250, np.uint8))
    fb = np.array(mm.ImageFeatures(dim=32, decode="real")(
        pa.table({"id": pa.array([1], pa.int64()),
                  "payload": pa.array([bright], pa.binary())})
    ).column("features").to_pylist())[0]
    assert fb[-1] == 1.0


def test_png_roundtrip_every_filter_and_shape():
    rng = np.random.default_rng(42)
    for w, h in [(1, 1), (1, 7), (7, 1), (4, 5), (16, 11), (33, 9)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for mode in ("none", "cycle"):
            out = mm.decode_png(mm.encode_png(img, filter_mode=mode))
            np.testing.assert_array_equal(out, img)
    # grayscale color type 0
    g = rng.integers(0, 256, (6, 10), dtype=np.uint8)
    np.testing.assert_array_equal(mm.decode_png(mm.encode_png(g)), g)


def test_png_gradient_exercises_filter_inverses():
    # smooth gradients make Sub/Up/Average/Paeth produce long zero runs —
    # the filters genuinely transform the data (encoded ≠ raw) and the
    # decoder must invert each type to reproduce the image
    y, x = np.mgrid[0:10, 0:8]
    img = np.stack([(y * 11) % 256, (x * 23) % 256, (y * 3 + x * 5) % 256],
                   axis=-1).astype(np.uint8)
    np.testing.assert_array_equal(
        mm.decode_png(mm.encode_png(img, filter_mode="cycle")), img)


def test_png_header_and_crc_validation():
    img = np.zeros((3, 3, 3), np.uint8)
    good = bytearray(mm.encode_png(img))
    with pytest.raises(ValueError, match="not a PNG"):
        mm.decode_png(b"BM" + bytes(good))
    corrupt = bytes(good[:40]) + bytes([good[40] ^ 0xFF]) + bytes(good[41:])
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_png(corrupt)


def test_png_stats_stage_matches_bmp_stats():
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
            for _ in range(4)]
    ids = pa.array([1, 2, 3, 4], pa.int64())
    png_out = mm.PngStats()(pa.table({
        "doc_id": ids,
        "payload": pa.array([mm.encode_png(i, "cycle") for i in imgs],
                            pa.binary())}))
    bmp_out = mm.BmpStats()(pa.table({
        "doc_id": ids,
        "payload": pa.array([mm.encode_bmp(i) for i in imgs],
                            pa.binary())}))
    assert png_out.equals(bmp_out)


def test_frame_sampler_fanout():
    video = bytes(range(256)) * 640  # 160 KiB → 40 chunks of 4096
    batch = pa.table({"id": pa.array(["v1"], pa.string()),
                      "payload": pa.array([video], pa.binary())})
    out = mm.FrameSampler(frame_bytes=4096, stride=10)(batch)
    assert out.num_rows == 4  # frames 0, 10, 20, 30
    assert out.column("frame_no").to_pylist() == [0, 10, 20, 30]
    assert all(len(f) == 4096 for f in out.column("frame").to_pylist())


def test_bmp_roundtrip_all_pad_widths():
    """Row padding covers all four stride remainders (w%4 ∈ {0..3})."""
    rng = np.random.default_rng(7)
    for w in (1, 2, 3, 4, 5, 8):
        for h in (1, 2, 5):
            a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert np.array_equal(mm.decode_bmp(mm.encode_bmp(a)), a)


def test_bmp_topdown_negative_height():
    import struct
    rng = np.random.default_rng(8)
    a = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    # flip rows at encode time, then mark the header top-down: decode
    # must NOT re-flip, yielding the flipped array back
    b = bytearray(mm.encode_bmp(a))
    struct.pack_into("<i", b, 22, -4)
    assert np.array_equal(mm.decode_bmp(bytes(b)), a[::-1])


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        mm.decode_bmp(b"notabmp")
    import struct
    b = bytearray(mm.encode_bmp(np.zeros((2, 2, 3), np.uint8)))
    struct.pack_into("<H", b, 28, 8)  # bpp=8
    with pytest.raises(ValueError):
        mm.decode_bmp(bytes(b))


def test_wav_roundtrip_and_extra_chunk():
    rng = np.random.default_rng(9)
    s = rng.integers(-32768, 32768, 321).astype(np.int16)
    payload = mm.encode_wav(s, 44100)
    rate, out = mm.decode_wav(payload)
    assert rate == 44100 and np.array_equal(out, s)
    # tolerate an extra LIST chunk before fmt/data (odd size → padding)
    import struct
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    body = payload[12:]
    patched = b"RIFF" + struct.pack("<I", 4 + len(extra) + len(body)) \
        + b"WAVE" + extra + body
    rate2, out2 = mm.decode_wav(patched)
    assert rate2 == 44100 and np.array_equal(out2, s)
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFFxxxxNOPE")


def test_bmp_stats_stage():
    a = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    batch = pa.table({"doc_id": pa.array([9], pa.int64()),
                      "payload": pa.array([mm.encode_bmp(a)], pa.binary())})
    out = mm.BmpStats()(batch)
    assert out.column("img_width").to_pylist() == [4]
    assert out.column("img_height").to_pylist() == [2]
    assert out.column("px_sum_r").to_pylist() == [int(a[:, :, 0].sum())]
    assert out.column("px_sum_b").to_pylist() == [int(a[:, :, 2].sum())]


def test_wav_stats_stage():
    s = np.array([-3, 0, 5], dtype=np.int16)
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "payload": pa.array([mm.encode_wav(s, 8000)],
                                          pa.binary())})
    out = mm.WavStats()(batch)
    assert out.column("n_samples").to_pylist() == [3]
    assert out.column("amp_sum").to_pylist() == [2]
    assert out.column("energy").to_pylist() == [9 + 25]


def test_distributed_feature_stage(ray_session):
    import ray.data
    rows = [{"id": i, "payload": bytes([i] * 100)} for i in range(50)]
    ds = ray.data.from_items(rows)
    out = ds.map_batches(mm.ImageFeatures,
                         fn_constructor_kwargs={"dim": 16},
                         batch_size=mm.BINARY_BATCH_SIZE,
                         batch_format="pyarrow", concurrency=2)
    t = out.to_pandas()
    assert len(t) == 50
    assert len(t["features"].iloc[0]) == 16


def test_resize_nn_identity_and_downsample():
    from nrt_ray.stages.multimodal import resize_nn
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    # identity resize returns the same pixels
    assert np.array_equal(resize_nn(img, 8, 6), img)
    # 2x downsample picks every second row/col (floor index map)
    half = resize_nn(img, 4, 3)
    assert np.array_equal(half, img[::2, ::2])


def test_bmp_resize_stats_stage():
    from nrt_ray.pipelines.mmops import synth_image
    from nrt_ray.stages.multimodal import (BmpResizeStats, decode_bmp,
                                           resize_nn)
    ids = [0, 3, 11, 40]
    batch = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "payload": pa.array([synth_image(i) for i in ids], pa.binary()),
    })
    out = BmpResizeStats()(batch)
    assert out.column_names == ["doc_id", "out_width", "out_height",
                                "px_sum_r", "px_sum_g", "px_sum_b"]
    for row, i in zip(out.to_pylist(), ids):
        small = resize_nn(decode_bmp(synth_image(i)), 8, 6) \
            .astype(np.int64)
        s = small.sum(axis=(0, 1))
        assert (row["px_sum_r"], row["px_sum_g"], row["px_sum_b"]) \
            == (int(s[0]), int(s[1]), int(s[2]))


def test_resample_nn_and_stage():
    from nrt_ray.pipelines.mmops import synth_audio
    from nrt_ray.stages.multimodal import (WavResampleStats, decode_wav,
                                           resample_nn)
    s = np.arange(100, dtype=np.int16)
    # factor-2 decimation picks every second sample
    assert np.array_equal(resample_nn(s, 8000, 4000), s[::2])
    ids = [0, 7, 63, 200]
    batch = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "payload": pa.array([synth_audio(i) for i in ids], pa.binary()),
    })
    out = WavResampleStats()(batch)
    for row, i in zip(out.to_pylist(), ids):
        _, src = decode_wav(synth_audio(i))
        r = resample_nn(src, 8000, 3000).astype(np.int64)
        assert row["n_samples"] == len(r)
        assert row["amp_sum"] == int(r.sum())
        assert row["energy"] == int((r * r).sum())


# ---------------------------------------------------------------- JPEG

def test_jpeg_exact_on_even_constant_blocks():
    # even-valued constant 8x8 blocks -> DC-only spectrum with integer
    # half-quotients: the lossy pipeline is exactly invertible
    rng = np.random.default_rng(7)
    vb = (2 * rng.integers(0, 128, (2, 3))).astype(np.uint8)
    img = np.kron(vb, np.ones((8, 8), np.uint8))
    out = mm.decode_jpeg(mm.encode_jpeg(img))
    np.testing.assert_array_equal(out, img)


def test_jpeg_gray_gradient_quantization_bounded():
    y, x = np.mgrid[0:16, 0:24]
    g = ((y * 5 + x * 3) % 200 + 20).astype(np.uint8)
    out = mm.decode_jpeg(mm.encode_jpeg(g)).astype(np.int64)
    err = np.abs(out - g.astype(np.int64))
    assert out.shape == g.shape
    assert err.max() <= 8           # Annex-K quantization loss bound
    assert err.mean() < 3.0


def test_jpeg_color_roundtrip_bounded():
    y, x = np.mgrid[0:16, 0:16]
    rgb = np.stack([(y * 4 + x) % 180 + 30,
                    (y + x * 4) % 180 + 40,
                    (y * 2 + x * 2) % 180 + 50],
                   axis=-1).astype(np.uint8)
    out = mm.decode_jpeg(mm.encode_jpeg(rgb)).astype(np.int64)
    err = np.abs(out - rgb.astype(np.int64))
    assert out.shape == rgb.shape
    assert err.max() <= 20          # chroma quantization is coarser
    assert err.mean() < 5.0


def test_jpeg_deterministic_and_compressed():
    y, x = np.mgrid[0:64, 0:64]
    g = ((y * 2 + x) % 256).astype(np.uint8)
    b1, b2 = mm.encode_jpeg(g), mm.encode_jpeg(g)
    assert b1 == b2
    assert b1[:2] == b"\xff\xd8" and b1[-2:] == b"\xff\xd9"
    assert len(b1) < g.size          # actually compresses (4096 raw)


def test_jpeg_rejects_unsupported():
    import pytest
    with pytest.raises(ValueError):
        mm.decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        mm.encode_jpeg(np.zeros((7, 8), np.uint8))   # not block-aligned
    # progressive marker (SOF2) is rejected at the plug-in point
    body = b"\xff\xd8\xff\xc2\x00\x05\x08\x00\x08"
    with pytest.raises(ValueError):
        mm.decode_jpeg(body + b"\xff\xd9")


def test_jpeg_stats_stage(ray_session):
    import ray.data
    from nrt_ray.pipelines.mmops import synth_jpeg
    ids = [1, 2, 3, 10, 47]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "payload": pa.array([synth_jpeg(i) for i in ids], pa.binary()),
    }))
    out = ds.map_batches(mm.JpegStats, batch_format="pyarrow",
                         concurrency=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for _, r in out.iterrows():
        did = int(r["doc_id"])
        w, h = 8 * (1 + did % 3), 8 * (1 + did % 2)
        b = np.arange((w // 8) * (h // 8), dtype=np.int64)
        expect = int((64 * 2 * ((did * 7 + b * 13) % 128)).sum())
        assert (r["img_width"], r["img_height"]) == (w, h)
        assert r["px_sum"] == expect


# ----------------------------------------------------------------- AVI

def test_avi_roundtrip_with_row_padding():
    rng = np.random.default_rng(3)
    # odd width (7*3=21 bytes/row -> padded to 24) exercises alignment
    fr = rng.integers(0, 256, (5, 6, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(mm.demux_avi(mm.encode_avi(fr)), fr)
    fr2 = rng.integers(0, 256, (1, 4, 4, 3), dtype=np.uint8)
    np.testing.assert_array_equal(mm.demux_avi(mm.encode_avi(fr2)), fr2)


def test_avi_rejects_bad_input():
    import pytest
    with pytest.raises(ValueError):
        mm.demux_avi(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        mm.demux_avi(b"nope")


def test_avi_frame_sampler_stage(ray_session):
    import ray.data
    from nrt_ray.pipelines.mmops import synth_avi
    ids = [1, 4, 9]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "payload": pa.array([synth_avi(i) for i in ids], pa.binary()),
    }))
    sampler = mm.AviFrameSampler(id_col="doc_id", stride=2)
    out = ds.map_batches(sampler, batch_format="pyarrow") \
        .to_pandas().sort_values(["doc_id", "frame_no"]) \
        .reset_index(drop=True)
    for _, r in out.iterrows():
        did, fno = int(r["doc_id"]), int(r["frame_no"])
        assert fno % 2 == 0
        w, h = 3 + did % 4, 2 + did % 3
        i = np.arange(h * w, dtype=np.int64)
        px = (did * 11 + fno * 5 + i[:, None] * 13
              + np.array([0, 29, 58], dtype=np.int64)) % 256
        assert (r["frame_w"], r["frame_h"]) == (w, h)
        assert r["px_sum"] == int(px.sum())
    # sampled-frame counts per doc: ceil(nf/2)
    for did in ids:
        nf = 2 + did % 5
        assert (out["doc_id"] == did).sum() == (nf + 1) // 2


# ----------------------------------------------------------------- GIF

def test_gif_roundtrip_single_anim_and_reset():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    np.testing.assert_array_equal(mm.decode_gif(mm.encode_gif(img)), img)
    anim = rng.integers(0, 256, (4, 9, 11), dtype=np.uint8)
    np.testing.assert_array_equal(mm.decode_gif(mm.encode_gif(anim)),
                                  anim)
    # 6400 random pixels force LZW width growth to 12 bits + dict reset
    big = rng.integers(0, 256, (80, 80), dtype=np.uint8)
    np.testing.assert_array_equal(mm.decode_gif(mm.encode_gif(big)), big)


def test_gif_compresses_smooth_content():
    grad = np.tile(np.arange(64, dtype=np.uint8), (64, 1))
    assert len(mm.encode_gif(grad)) < grad.size // 2 + 800


def test_gif_rejects_unsupported():
    with pytest.raises(ValueError):
        mm.decode_gif(b"JIF89a")
    good = bytearray(mm.encode_gif(np.zeros((4, 4), np.uint8)))
    corrupt = good.copy()
    # image descriptor sits right after the 13-byte header + 768-byte
    # global palette; flip its interlace bit
    idx = 13 + 768
    assert corrupt[idx] == 0x2C
    corrupt[idx + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        mm.decode_gif(bytes(corrupt))


def test_gif_real_features_match_bmp():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    fg = mm.ImageFeatures(dim=16, decode="real")(pa.table({
        "id": pa.array([1], pa.int64()),
        "payload": pa.array([mm.encode_gif(g)], pa.binary())}))
    fb = mm.ImageFeatures(dim=16, decode="real")(pa.table({
        "id": pa.array([1], pa.int64()),
        "payload": pa.array([mm.encode_bmp(rgb)], pa.binary())}))
    np.testing.assert_array_equal(
        np.array(fg.column("features").to_pylist()),
        np.array(fb.column("features").to_pylist()))


def test_gif_stats_stage(ray_session):
    import ray.data
    from nrt_ray.pipelines.mmops import synth_gif
    ids = [1, 2, 7]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "payload": pa.array([synth_gif(i) for i in ids], pa.binary()),
    }))
    out = ds.map_batches(mm.GifStats, batch_format="pyarrow",
                         concurrency=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for _, r in out.iterrows():
        did = int(r["doc_id"])
        nf, w, h = 1 + did % 3, 5 + did % 6, 4 + did % 5
        j = np.arange(nf * w * h, dtype=np.int64)
        expect = int(((did * 13 + (j // (w * h)) * 7
                       + (j % (w * h)) * 3) % 256).sum())
        assert (r["n_frames"], r["img_width"], r["img_height"]) \
            == (nf, w, h)
        assert r["px_sum"] == expect


# ------------------------------------------------- codec property tests

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2 ** 31))
def test_gif_roundtrip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    np.testing.assert_array_equal(mm.decode_gif(mm.encode_gif(img)), img)


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 4), st.integers(1, 9), st.integers(1, 9),
       st.integers(0, 2 ** 31))
def test_avi_roundtrip_property(n, w, h, seed):
    rng = np.random.default_rng(seed)
    fr = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(mm.demux_avi(mm.encode_avi(fr)), fr)


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 3), st.integers(1, 3), st.integers(0, 2 ** 31))
def test_jpeg_exact_property_on_even_blocks(bw, bh, seed):
    rng = np.random.default_rng(seed)
    vb = (2 * rng.integers(0, 128, (bh, bw))).astype(np.uint8)
    img = np.kron(vb, np.ones((8, 8), np.uint8))
    np.testing.assert_array_equal(mm.decode_jpeg(mm.encode_jpeg(img)),
                                  img)


@settings(max_examples=12, deadline=None)
@given(st.integers(1, 3), st.integers(1, 3), st.integers(0, 2 ** 31))
def test_jpeg_loss_bound_property(bw, bh, seed):
    # arbitrary uint8 content: decode must stay within the worst-case
    # Annex-K quantization loss envelope (empirically < 128 by far; we
    # assert a conservative structural bound plus shape/type)
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (8 * bh, 8 * bw), dtype=np.uint8)
    out = mm.decode_jpeg(mm.encode_jpeg(img))
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(np.int64) - img.astype(np.int64))
    assert err.max() <= 160      # random noise quantizes hard but bounded
