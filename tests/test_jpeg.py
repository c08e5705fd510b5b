"""Tests for the REAL stdlib baseline JPEG codec (raycrawl/ops/jpeg.py) —
the round-3 verdict's item 6, closing the last declared codec stand-in.

Validation strategy (no PIL, no third-party JPEGs offline):
1. **Coefficient identity** — decode(return_coeffs=True) must recover,
   bit-for-bit, the quantized coefficients the encoder produced for
   arbitrary random images. This pins the whole entropy layer (Huffman
   tables, bit packing, byte stuffing, DC prediction, ZRL/EOB runs)
   with no reference decoder needed.
2. **Constant-block closed form** — piecewise-constant images round-trip
   to an exactly computable value (only the integer-quantized DC
   survives), the property the SQL oracle replicates.
3. **Behavioral sanity** — near-lossless on smooth gradients, lossy on
   noise, deterministic bytes, marker/garbage rejection, restart-marker
   framing, 4:2:0 vs 4:4:4, odd sizes.
"""

import numpy as np
import pytest

from raycrawl.ops.jpeg import (JpegCodec, JpegDecoder, JpegFeatureStage,
                               _quantize_block, _synth_block_gray,
                               jpeg_decode, jpeg_encode, jpeg_features,
                               quality_quant_tables, synth_jpeg_batch)


def _coeff_identity(img: np.ndarray, quality: int, **enc_kw) -> None:
    data = jpeg_encode(img, quality=quality, **enc_kw)
    coefs, qts, (h, w) = jpeg_decode(data, return_coeffs=True)
    qlum, qchrom = quality_quant_tables(quality)
    assert (qts[0] == qlum).all()
    gray = img.ndim == 2
    if gray:
        planes = [img]
    else:
        from raycrawl.ops.jpeg import _downsample_420, _rgb_to_ycbcr

        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., c] for c in range(3)]
        if enc_kw.get("subsampling") == "420":
            planes = [planes[0], _downsample_420(planes[1]),
                      _downsample_420(planes[2])]
        assert (qts[1] == qchrom).all() and (qts[2] == qchrom).all()
    for ci, p in enumerate(planes):
        got = coefs[ci]
        bh, bw = got.shape[0] // 8, got.shape[1] // 8
        from raycrawl.ops.jpeg import _pad_plane

        pad = _pad_plane(p, bh, bw)
        q = qlum if ci == 0 else qchrom
        for by in range(bh):
            for bx in range(bw):
                exp = _quantize_block(pad[by * 8:by * 8 + 8,
                                          bx * 8:bx * 8 + 8], q)
                assert (exp == got[by * 8:by * 8 + 8,
                                   bx * 8:bx * 8 + 8]).all(), (ci, by, bx)


@pytest.mark.parametrize("quality", [10, 50, 75, 95])
def test_gray_coefficient_identity(quality):
    rng = np.random.RandomState(quality)
    img = rng.randint(0, 256, size=(37, 51), dtype=np.uint8)
    _coeff_identity(img, quality)


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_color_coefficient_identity(subsampling):
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(29, 43, 3), dtype=np.uint8)
    _coeff_identity(img, 75, subsampling=subsampling)


def test_restart_interval_coefficient_identity():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(40, 56, 3), dtype=np.uint8)
    base = jpeg_decode(jpeg_encode(img, quality=75, subsampling="420"))
    for ri in (1, 2, 5):
        d = jpeg_decode(jpeg_encode(img, quality=75, subsampling="420",
                                    restart_interval=ri))
        assert (d == base).all()
    _coeff_identity(img, 75, subsampling="420", restart_interval=2)


def test_constant_block_closed_form():
    """The SQL-oracle property: every 8×8-constant block of color c
    decodes to clamp(2·round_half_away((c-128)/2) + 128) at quality 50
    (Q00 = 16, so dequantized-DC/8 = 2·DCq)."""
    for i in (0, 5, 42, 201):
        bw = 2 + (i * 3) % 6
        bh = 2 + (i * 5) % 5
        img = _synth_block_gray(i, bw, bh)
        dec = jpeg_decode(jpeg_encode(img, quality=50))
        assert dec.shape == (bh * 8, bw * 8)
        for by in range(bh):
            for bx in range(bw):
                c = int(img[by * 8, bx * 8])
                x = c - 128
                dcq = (1 if x >= 0 else -1) * ((128 * abs(x) + 128) // 256)
                exp = min(255, max(0, 2 * dcq + 128))
                assert (dec[by * 8:by * 8 + 8,
                            bx * 8:bx * 8 + 8] == exp).all()


def test_smooth_content_near_lossless_noise_lossy():
    y, x = np.mgrid[0:64, 0:64]
    grad = ((x + y) * 2).clip(0, 255).astype(np.uint8)
    err_g = np.abs(jpeg_decode(jpeg_encode(grad, quality=90)).astype(int)
                   - grad.astype(int)).mean()
    assert err_g < 1.0
    rng = np.random.RandomState(0)
    noise = rng.randint(0, 256, size=(64, 64), dtype=np.uint8)
    err_n = np.abs(jpeg_decode(jpeg_encode(noise, quality=50)).astype(int)
                   - noise.astype(int)).mean()
    assert err_n > err_g  # genuinely lossy where a fake codec wouldn't be


def test_encode_deterministic_and_quality_sizes():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(48, 48, 3), dtype=np.uint8)
    a = jpeg_encode(img, quality=75)
    b = jpeg_encode(img, quality=75)
    assert a == b
    # lower quality → smaller file (noise content)
    assert len(jpeg_encode(img, quality=10)) < len(jpeg_encode(img, quality=90))


def test_decode_rejects_garbage_and_progressive():
    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg")
    # craft an SOF2 (progressive) header: SOI + minimal SOF2 segment
    import struct

    sof2 = (b"\xFF\xD8" + b"\xFF\xC2"
            + struct.pack(">H", 2 + 6 + 3)
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="SOF"):
        jpeg_decode(sof2)


def test_odd_sizes_and_edge_shapes():
    rng = np.random.RandomState(9)
    for shape in [(1, 1), (7, 7), (8, 9), (17, 8), (9, 23, 3)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        dec = jpeg_decode(jpeg_encode(img, quality=85))
        assert dec.shape == img.shape


def test_synth_batch_and_feature_stage_exact():
    t = synth_jpeg_batch(range(9))
    out = JpegFeatureStage()(t).to_pandas().set_index("image_id")
    for i in range(9):
        bw = 2 + (i * 3) % 6
        bh = 2 + (i * 5) % 5
        img = _synth_block_gray(i, bw, bh)
        # expected decode: the closed form per block
        exp_sum = 0
        exp_vals = []
        for by in range(bh):
            for bx in range(bw):
                c = int(img[by * 8, bx * 8])
                x = c - 128
                dcq = (1 if x >= 0 else -1) * ((128 * abs(x) + 128) // 256)
                v = min(255, max(0, 2 * dcq + 128))
                exp_sum += 64 * v
                exp_vals.append(v)
        row = out.loc[i]
        assert row["width"] == bw * 8 and row["height"] == bh * 8
        assert row["sum_px"] == exp_sum
        assert row["min_px"] == min(exp_vals)
        assert row["max_px"] == max(exp_vals)


def test_jpeg_features_ray_pipeline():
    import ray.data as rd

    t = synth_jpeg_batch(range(30))
    got = (jpeg_features(rd.from_arrow(t), concurrency=2, batch_size=8)
           .to_pandas().sort_values("image_id").reset_index(drop=True))
    exp = JpegFeatureStage()(t).to_pandas().sort_values(
        "image_id").reset_index(drop=True)
    assert got.equals(exp)


def test_encode_image_real_jpeg_codec():
    """The reference KB-budget hook (file_utils.py:38-75) with BOTH legs
    real: JPEG encode via this codec, decode via JpegDecoder."""
    import base64

    from raycrawl.ops.multimodal import encode_image

    y, x = np.mgrid[0:48, 0:64]
    img = np.stack([((x + y) * 2) % 256, (x * 3) % 256, (y * 5) % 256],
                   -1).astype(np.uint8)
    payload = jpeg_encode(img, quality=90)
    uri = encode_image(payload, 64, 48, format="JPEG",
                       decoder=JpegDecoder(), codec=JpegCodec(quality=90))
    assert uri is not None and uri.startswith("data:image/jpeg;base64,")
    decoded = jpeg_decode(base64.b64decode(uri.split(",", 1)[1]))
    assert decoded.shape == img.shape
    # under budget → no resize; two q90 passes stay visually faithful
    assert np.abs(decoded.astype(int) - img.astype(int)).mean() < 4.0


def test_encode_image_budget_resizes_real_jpeg():
    import base64

    from raycrawl.ops.multimodal import encode_image

    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, size=(120, 160, 3), dtype=np.uint8)
    payload = jpeg_encode(img, quality=95)  # noise at q95: big
    kb = len(payload) / 1024
    budget = max(1, int(kb // 4))
    uri = encode_image(payload, 160, 120, max_size_kb=budget,
                       format="JPEG", decoder=JpegDecoder(),
                       codec=JpegCodec(quality=75))
    assert uri is not None
    decoded = jpeg_decode(base64.b64decode(uri.split(",", 1)[1]))
    scale = (budget / kb) ** 0.5
    assert decoded.shape == (int(120 * scale), int(160 * scale), 3)
