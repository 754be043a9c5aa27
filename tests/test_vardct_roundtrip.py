"""VarDCT end-to-end round-trip: encode with tools/encoder_vardct.py,
decode with the full pipeline (host entropy stage + device transforms),
and check PSNR against the source image.

This exercises LfGlobal(VarDCT), LfCoeff, HfMetadata, HfGlobal (default
dequant matrices), HfPass (natural order), the HF coefficient context
modeling, LF/HF chroma-from-luma, and the batched IDCT path.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from jxl_oxide_tpu.headers.image import ImageHeader
from jxl_oxide_tpu.io.bitstream import Bitstream
from jxl_oxide_tpu.render.frame import Frame
from jxl_oxide_tpu.render.vardct import decode_vardct_frame


def decode(data: bytes):
    bs = Bitstream(data)
    ih = ImageHeader.parse(bs)
    frame = Frame(ih, bs)
    end = frame.start_byte + frame.total_bytes
    frame.feed_bytes(data[frame.start_byte + frame.data_start : end])
    return decode_vardct_frame(frame)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(1.0 / mse) if mse > 0 else np.inf


def _smooth_image(h, w, seed=0):
    """Smooth-ish random image (bandlimited) + some structure."""
    rng = np.random.default_rng(seed)
    small = rng.random((h // 8 + 1, w // 8 + 1, 3)).astype(np.float32)
    img = np.kron(small, np.ones((8, 8, 1), dtype=np.float32))[:h, :w]
    yy, xx = np.mgrid[:h, :w]
    img[:, :, 0] = 0.5 * img[:, :, 0] + 0.5 * (xx / w).astype(np.float32)
    img[:, :, 1] = 0.5 * img[:, :, 1] + 0.5 * (yy / h).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


@pytest.mark.parametrize("size", [(64, 64), (56, 40), (128, 96)])
def test_vardct_roundtrip_psnr(size):
    from encoder_vardct import encode_jxl_vardct

    h, w = size
    img = _smooth_image(h, w, seed=h + w)
    data = encode_jxl_vardct(img, global_scale=512)
    (x, y, b), extra = decode(data)
    assert x.shape == (h, w)
    assert not extra
    got = np.stack([x, y, b], axis=-1)
    p = psnr(np.clip(got, 0, 1), img)
    assert p > 35.0, f"PSNR too low: {p:.2f} dB"


def test_vardct_roundtrip_flat():
    """A constant image must decode near-exactly (only LF quantization)."""
    from encoder_vardct import encode_jxl_vardct

    img = np.full((32, 32, 3), 0.5, dtype=np.float32)
    data = encode_jxl_vardct(img, global_scale=512)
    (x, y, b), _ = decode(data)
    for plane in (x, y, b):
        np.testing.assert_allclose(plane, 0.5, atol=0.01)


def test_vardct_high_quality():
    from encoder_vardct import encode_jxl_vardct

    img = _smooth_image(48, 48, seed=9)
    # larger global_scale -> finer quantization -> higher PSNR
    fine = encode_jxl_vardct(img, global_scale=32768)
    coarse = encode_jxl_vardct(img, global_scale=256)
    (xl, yl, bl), _ = decode(fine)
    (xh, yh, bh_), _ = decode(coarse)
    p_fine = psnr(np.clip(np.stack([xl, yl, bl], -1), 0, 1), img)
    p_coarse = psnr(np.clip(np.stack([xh, yh, bh_], -1), 0, 1), img)
    assert p_fine > p_coarse + 3.0
    assert p_fine > 45.0, f"fine-quant PSNR too low: {p_fine:.2f}"


def test_vardct_multigroup_roundtrip():
    """Multi-group frame (separate TOC sections per 256x256 group)."""
    from encoder_vardct import encode_jxl_vardct

    img = _smooth_image(300, 520, seed=21)
    data = encode_jxl_vardct(img, global_scale=8192)
    (x, y, b), _ = decode(data)
    assert x.shape == (300, 520)
    got = np.stack([x, y, b], axis=-1)
    p = psnr(np.clip(got, 0, 1), img)
    assert p > 45.0, f"PSNR too low: {p:.2f} dB"


def test_vardct_filters_fused_matches_separate():
    """The fused pipeline's in-graph gaborish/EPF must match applying the
    standalone filter ops to the unfiltered decode."""
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu.headers.frame import EpfParams
    from jxl_oxide_tpu.ops.filters import apply_epf, apply_gabor
    from jxl_oxide_tpu.headers.frame import GABOR_DEFAULT_WEIGHTS

    img = _smooth_image(64, 64, seed=33)
    plain = encode_jxl_vardct(img, global_scale=4096)
    filtered = encode_jxl_vardct(img, global_scale=4096, gabor=True,
                                 epf_iters=2)
    (x0, y0, b0), _ = decode(plain)
    (x1, y1, b1), _ = decode(filtered)

    # reproduce: gabor then EPF (sigma = quant_mul*65536/gs/hf_mul * lut[0]?
    # sharpness zero -> lut[0] = 0 -> sigma 0 -> EPF passthrough)
    g = [np.asarray(p) for p in apply_gabor([x0, y0, b0],
                                            GABOR_DEFAULT_WEIGHTS)]
    sigma = np.zeros_like(x0)
    out = np.asarray(apply_epf(g, sigma, EpfParams(iters=2)))
    np.testing.assert_allclose(
        np.stack([x1, y1, b1]), out, atol=2e-4
    )


def test_vardct_roundtrip_with_filters_smoke():
    from encoder_vardct import encode_jxl_vardct

    img = _smooth_image(96, 80, seed=34)
    data = encode_jxl_vardct(img, global_scale=8192, gabor=True, epf_iters=3)
    (x, y, b), _ = decode(data)
    got = np.stack([x, y, b], -1)
    p = psnr(np.clip(got, 0, 1), img)
    assert p > 28.0, f"PSNR too low with filters: {p:.2f}"


def test_vardct_lf_frame_roundtrip():
    """LF (DC) frame + main frame with use_lf_frame: the DC comes from the
    separately-coded 1/8-scale frame (render/lib.rs LF slots)."""
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu import JxlImage

    img = _smooth_image(128, 96, seed=41)
    data = encode_jxl_vardct(img, global_scale=65536, use_lf_frame=True)
    jxl = JxlImage.from_bytes(data)
    assert jxl.num_frames == 2
    r = jxl.render_frame(0)
    got = np.stack(r.image_planar(), axis=-1)
    assert got.shape == (128, 96, 3)
    p = psnr(np.clip(got, 0, 1), img)
    # DC carried through the separately-quantized LF frame: lossier than a
    # plain encode, but must still reconstruct the image structurally
    assert p > 30.0, f"PSNR too low with LF frame: {p:.2f} dB"
    plain = encode_jxl_vardct(img, global_scale=65536)
    r2 = JxlImage.from_bytes(plain).render_frame(0)
    got2 = np.stack(r2.image_planar(), axis=-1)
    p2 = psnr(np.clip(got2, 0, 1), img)
    assert p2 >= p


def test_lf_frame_chain_two_levels():
    """lf_level chains: a level-2 LF frame feeds a level-1 LF frame that
    feeds the main frame (header.rs lf_level, render/lib.rs LF slots)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu import JxlImage

    h = w = 256
    rng = np.random.default_rng(7)
    small = rng.random((h // 8 + 1, w // 8 + 1, 3)).astype(np.float32)
    img = np.kron(small, np.ones((8, 8, 1), dtype=np.float32))[:h, :w]
    data = encode_jxl_vardct(
        img, global_scale=65536, use_lf_frame=True, lf_levels=2
    )
    jx = JxlImage.from_bytes(data)
    assert jx.num_frames == 3 and jx.num_keyframes == 1
    out = np.stack(jx.render_frame(0).image_planar(), -1)
    mse = float(np.mean((out - np.clip(img, 0, 1)) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 28.0, psnr


def test_two_pass_progressive_accumulation():
    """Progressive passes: coefficients accumulate across passes
    (hf_coeff.rs:228-236); 2-pass decode is identical to 1-pass, and the
    pass-0 prefix renders a coarse preview."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu import JxlImage

    h = w = 128
    rng = np.random.default_rng(9)
    small = rng.random((h // 8 + 1, w // 8 + 1, 3)).astype(np.float32)
    img = np.kron(small, np.ones((8, 8, 1), dtype=np.float32))[:h, :w]
    d1 = encode_jxl_vardct(img, global_scale=4096, num_passes=1)
    d2 = encode_jxl_vardct(img, global_scale=4096, num_passes=2)
    o1 = np.stack(JxlImage.from_bytes(d1).render_frame(0).image_planar(), -1)
    o2 = np.stack(JxlImage.from_bytes(d2).render_frame(0).image_planar(), -1)
    np.testing.assert_allclose(o1, o2, atol=1e-6)

    # truncate before the last pass section: loading render still works
    imgp = JxlImage()
    imgp.feed_bytes(d2[: len(d2) * 3 // 4])
    r = imgp.render_loading_frame()
    assert np.stack(r.image_planar(), -1).shape == (h, w, 3)


def test_custom_dequant_dct_params():
    """Non-default dequant matrix set: DCT8 encoded via the "DCT params"
    mode (dequant.rs encoding 6, distance-band interpolation); decoder must
    reproduce the encoder's quantization model."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu import JxlImage

    h = w = 64
    rng = np.random.default_rng(11)
    small = rng.random((h // 8 + 1, w // 8 + 1, 3)).astype(np.float32)
    img = np.kron(small, np.ones((8, 8, 1), dtype=np.float32))[:h, :w]
    params = [[2816.0, -1.0], [1024.0, -0.5], [256.0, -0.75]]
    data = encode_jxl_vardct(img, global_scale=4096, dct8_params=params)
    out = np.stack(
        JxlImage.from_bytes(data).render_frame(0).image_planar(), -1
    )
    mse = float(np.mean((out - np.clip(img, 0, 1)) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 45.0, psnr


def test_mixed_transform_types_end_to_end():
    """Varblocks of many transform types (DCT16, Hornuss, DCT2, DCT4,
    AFV0, DCT8) through the real bitstream + fused pipeline, validated
    against an independent per-block reconstruction using the spec-tested
    inverse transforms (generic/transform.rs:14-258 parity)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct_mixed

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.models.vardct import DequantMatrixSet, TransformType
    from jxl_oxide_tpu.ops.varblock import inverse_varblock_batch

    h = w = 32
    bh = bw = 4
    T = TransformType
    sel_grid = np.full((bh, bw), -1, dtype=np.int64)
    sel_grid[0, 0] = T.DCT16          # covers 2x2
    sel_grid[0, 2] = T.HORNUSS
    sel_grid[0, 3] = T.DCT2
    sel_grid[1, 2] = T.DCT4
    sel_grid[1, 3] = T.AFV0
    for y in (2, 3):
        for x in range(4):
            sel_grid[y, x] = T.DCT8
    mul_grid = np.ones((bh, bw), dtype=np.int64)

    rng = np.random.default_rng(17)
    coeff = np.zeros((3, bh * 8, bw * 8), dtype=np.int64)
    # sprinkle small nonzero coefficients everywhere
    mask = rng.random((3, bh * 8, bw * 8)) < 0.15
    coeff[mask] = rng.integers(-15, 16, int(mask.sum()))
    lf_q = rng.integers(-40, 40, (3, bh, bw))

    gs = 4096
    data = encode_jxl_vardct_mixed(h, w, sel_grid, mul_grid, coeff, lf_q, gs)
    r = JxlImage.from_bytes(data).render_frame(0)
    got = np.stack([np.asarray(p) for p in r.planes])  # [3, h, w] (x, y, b)

    # independent reconstruction
    from jxl_oxide_tpu.headers.image import OpsinInverseMatrix

    opsin = OpsinInverseMatrix()
    qb = np.asarray(opsin.quant_bias, dtype=np.float64)
    qbn = opsin.quant_bias_numerator
    dms = DequantMatrixSet.default()
    m_lf = (1.0 / 32.0, 1.0 / 4.0, 1.0 / 2.0)
    lf_scale = [m * 512.0 / (gs * 16) for m in m_lf]
    lf_deq = np.stack([lf_q[c] * lf_scale[c] for c in range(3)])
    lf_deq[0] += 0.0 * lf_deq[1]
    lf_deq[2] += 1.0 * lf_deq[1]

    want = np.zeros((3, h, w), dtype=np.float64)
    for y in range(bh):
        for x in range(bw):
            sel = int(sel_grid[y, x])
            if sel < 0:
                continue
            w8, h8 = T.SELECT_SIZE[sel]
            ph, pw = h8 * 8, w8 * 8
            q = coeff[:, y * 8 : y * 8 + ph, x * 8 : x * 8 + pw].astype(
                np.float64
            )
            deq = np.zeros_like(q)
            for c in range(3):
                mat = dms.get(c, sel, T.need_transpose(sel))
                safe = np.where(q[c] == 0, 1.0, q[c])
                biased = np.where(
                    np.abs(q[c]) <= 1.0, q[c] * qb[c], q[c] - qbn / safe
                )
                deq[c] = biased * mat * (65536.0 / gs)
            deq[0] += 0.0 * deq[1]
            deq[2] += 1.0 * deq[1]
            lf_blk = lf_deq[:, y : y + h8, x : x + w8]
            pix = np.asarray(inverse_varblock_batch(
                deq.astype(np.float32),
                lf_blk.astype(np.float32),
                sel,
            ))
            want[:, y * 8 : y * 8 + ph, x * 8 : x * 8 + pw] = pix

    np.testing.assert_allclose(got, want, atol=2e-4)


def test_mixed_transform_native_python_equal():
    """C++ HF decode and the Python loop agree on mixed transform types."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct_mixed

    import jxl_oxide_tpu.native as native
    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.models.vardct import TransformType as T

    h = w = 32
    sel_grid = np.full((4, 4), -1, dtype=np.int64)
    sel_grid[0, 0] = T.DCT16
    sel_grid[0, 2] = T.AFV1
    sel_grid[0, 3] = T.DCT4X8
    sel_grid[1, 2] = T.DCT8X4
    sel_grid[1, 3] = T.HORNUSS
    for y in (2, 3):
        for x in range(4):
            sel_grid[y, x] = T.DCT8
    mul_grid = np.full((4, 4), 2, dtype=np.int64)
    rng = np.random.default_rng(19)
    coeff = np.zeros((3, 32, 32), dtype=np.int64)
    mask = rng.random((3, 32, 32)) < 0.2
    coeff[mask] = rng.integers(-10, 11, int(mask.sum()))
    lf_q = rng.integers(-20, 20, (3, 4, 4))
    data = encode_jxl_vardct_mixed(h, w, sel_grid, mul_grid, coeff, lf_q)

    r1 = JxlImage.from_bytes(data).render_frame(0)
    p1 = [np.asarray(p) for p in r1.planes]
    old = (native._lib, native._tried)
    native._lib, native._tried = None, True
    try:
        r2 = JxlImage.from_bytes(data).render_frame(0)
        p2 = [np.asarray(p) for p in r2.planes]
    finally:
        native._lib, native._tried = old
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)


def test_large_transform_types_end_to_end():
    """Large varblocks (DCT256, DCT128, DCT64, DCT32X64) through the
    bitstream, vs the spec-tested inverse transforms."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct_mixed

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.headers.image import OpsinInverseMatrix
    from jxl_oxide_tpu.models.vardct import DequantMatrixSet, TransformType as T
    from jxl_oxide_tpu.ops.varblock import inverse_varblock_batch

    h = w = 256
    bh = bw = 32
    sel_grid = np.full((bh, bw), -1, dtype=np.int64)
    sel_grid[0, 0] = T.DCT256          # 32x32 blocks
    rng = np.random.default_rng(23)
    coeff = np.zeros((3, h, w), dtype=np.int64)
    mask = rng.random((3, h, w)) < 0.02
    coeff[mask] = rng.integers(-9, 10, int(mask.sum()))
    lf_q = rng.integers(-30, 30, (3, bh, bw))
    gs = 4096
    data = encode_jxl_vardct_mixed(
        h, w, sel_grid, np.ones((bh, bw), dtype=np.int64), coeff, lf_q, gs
    )
    got = np.stack([
        np.asarray(p)
        for p in JxlImage.from_bytes(data).render_frame(0).planes
    ])

    opsin = OpsinInverseMatrix()
    qb = np.asarray(opsin.quant_bias, dtype=np.float64)
    qbn = opsin.quant_bias_numerator
    dms = DequantMatrixSet.default()
    m_lf = (1.0 / 32.0, 1.0 / 4.0, 1.0 / 2.0)
    lf_deq = np.stack([
        lf_q[c] * (m_lf[c] * 512.0 / (gs * 16)) for c in range(3)
    ])
    lf_deq[2] += lf_deq[1]
    q = coeff.astype(np.float64)
    deq = np.zeros_like(q)
    for c in range(3):
        mat = dms.get(c, T.DCT256, T.need_transpose(T.DCT256))
        safe = np.where(q[c] == 0, 1.0, q[c])
        biased = np.where(np.abs(q[c]) <= 1.0, q[c] * qb[c], q[c] - qbn / safe)
        deq[c] = biased * mat * (65536.0 / gs)
    deq[2] += deq[1]
    want = np.asarray(inverse_varblock_batch(
        deq.astype(np.float32), lf_deq.astype(np.float32), T.DCT256
    ))
    np.testing.assert_allclose(got, want, atol=4e-4)


def test_ycbcr_420_end_to_end():
    """4:2:0 do_ycbcr VarDCT stream: subsampled staged pipeline + triangle
    chroma upsampling + BT.601 conversion, vs an independent per-channel
    reconstruction (vardct/mod.rs subsampled path, filter/ycbcr.rs)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct_420

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.headers.image import OpsinInverseMatrix
    from jxl_oxide_tpu.models.vardct import DequantMatrixSet, TransformType as T
    from jxl_oxide_tpu.ops.color import ycbcr_to_rgb
    from jxl_oxide_tpu.ops.dct import idct2d
    from jxl_oxide_tpu.render.render import _upsample2x_triangle

    h = w = 64
    bh, bw = h // 8, w // 8
    rng = np.random.default_rng(53)
    # coeff[c] at channel res: y full, x/b half
    shapes = [(h // 2, w // 2), (h, w), (h // 2, w // 2)]
    coeff = []
    for sh in shapes:
        c = np.zeros(sh, dtype=np.int64)
        m = rng.random(sh) < 0.1
        c[m] = rng.integers(-12, 13, int(m.sum()))
        coeff.append(c)
    # coeff[c] indexed c in (0=x half, 1=y full, 2=b half)
    lf_q = [
        rng.integers(-30, 30, (bh // 2, bw // 2)),
        rng.integers(-30, 30, (bh, bw)),
        rng.integers(-30, 30, (bh // 2, bw // 2)),
    ]
    gs = 4096
    data = encode_jxl_vardct_420(h, w, coeff, lf_q, gs)
    r = JxlImage.from_bytes(data).render_frame(0)
    got = np.stack([np.asarray(p) for p in r.planes])

    # independent reconstruction per channel
    opsin = OpsinInverseMatrix()
    qb = np.asarray(opsin.quant_bias, dtype=np.float64)
    qbn = opsin.quant_bias_numerator
    dms = DequantMatrixSet.default()
    m_lf = (1.0 / 32.0, 1.0 / 4.0, 1.0 / 2.0)
    chans = []
    for c in range(3):
        ch_h, ch_w = coeff[c].shape
        q = coeff[c].astype(np.float64)
        mat = dms.get(c, T.DCT8, True)
        safe = np.where(q == 0, 1.0, q)
        biased = np.where(np.abs(q) <= 1.0, q * qb[c], q - qbn / safe)
        # tile the 8x8 matrix across blocks
        tiled = np.tile(mat, (ch_h // 8, ch_w // 8))
        deq = biased * tiled * (65536.0 / gs)
        lf = lf_q[c] * (m_lf[c] * 512.0 / (gs * 16))
        blocks = deq.reshape(ch_h // 8, 8, ch_w // 8, 8).transpose(0, 2, 1, 3)
        # stored layout is transposed: stored[row=u, col=v] = coeff F[u, v]
        blocks[:, :, 0, 0] = lf
        pix = idct2d(blocks)
        chans.append(
            pix.transpose(0, 2, 1, 3).reshape(ch_h, ch_w).astype(np.float32)
        )
    # chroma upsample (triangle) then ycbcr -> rgb
    for c in (0, 2):
        p = _upsample2x_triangle(chans[c], 1, w)
        chans[c] = _upsample2x_triangle(p, 0, h)
    rr, gg, bb = ycbcr_to_rgb(chans[0], chans[1], chans[2])
    want = np.stack([np.asarray(rr), np.asarray(gg), np.asarray(bb)])
    np.testing.assert_allclose(got, want, atol=3e-4)


@pytest.mark.parametrize("ups", [(0, 2, 0), (0, 3, 0)])
def test_ycbcr_asymmetric_subsampling(ups):
    """Asymmetric chroma subsampling (jpeg_upsampling 2/3): channel
    stored-plane shifts and the upsample directions must agree
    (param.rs from_jpeg_upsampling — value 2 keeps h full / v follows
    vscale, value 3 the reverse). Regression: the render-side upsample
    had the 2/3 direction mapping swapped, crashing EPF on mismatched
    plane shapes (fuzz finding modular_ycbcr_asym_subsample.fuzz)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct_420

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.headers.image import OpsinInverseMatrix
    from jxl_oxide_tpu.models.vardct import (
        DequantMatrixSet,
        TransformType as T,
        jpeg_shifts,
    )
    from jxl_oxide_tpu.ops.color import ycbcr_to_rgb
    from jxl_oxide_tpu.ops.dct import idct2d
    from jxl_oxide_tpu.render.render import _upsample2x_triangle

    h = w = 64
    bh, bw = h // 8, w // 8
    shifts = jpeg_shifts(ups)
    rng = np.random.default_rng(57)
    coeff = []
    lf_q = []
    for c in range(3):
        hs, vs = shifts[c]
        sh = (h >> vs, w >> hs)
        cplane = np.zeros(sh, dtype=np.int64)
        m = rng.random(sh) < 0.1
        cplane[m] = rng.integers(-12, 13, int(m.sum()))
        coeff.append(cplane)
        lf_q.append(rng.integers(-30, 30, (bh >> vs, bw >> hs)))
    gs = 4096
    data = encode_jxl_vardct_420(h, w, coeff, lf_q, gs, jpeg_upsampling=ups)
    r = JxlImage.from_bytes(data).render_frame(0)
    got = np.stack([np.asarray(p) for p in r.planes])
    assert got.shape == (3, h, w)

    # independent reconstruction per channel (as in the 4:2:0 test)
    opsin = OpsinInverseMatrix()
    qb = np.asarray(opsin.quant_bias, dtype=np.float64)
    qbn = opsin.quant_bias_numerator
    dms = DequantMatrixSet.default()
    m_lf = (1.0 / 32.0, 1.0 / 4.0, 1.0 / 2.0)
    chans = []
    for c in range(3):
        ch_h, ch_w = coeff[c].shape
        q = coeff[c].astype(np.float64)
        mat = dms.get(c, T.DCT8, True)
        safe = np.where(q == 0, 1.0, q)
        biased = np.where(np.abs(q) <= 1.0, q * qb[c], q - qbn / safe)
        tiled = np.tile(mat, (ch_h // 8, ch_w // 8))
        deq = biased * tiled * (65536.0 / gs)
        lf = lf_q[c] * (m_lf[c] * 512.0 / (gs * 16))
        blocks = deq.reshape(ch_h // 8, 8, ch_w // 8, 8).transpose(0, 2, 1, 3)
        blocks[:, :, 0, 0] = lf
        pix = idct2d(blocks)
        chans.append(
            pix.transpose(0, 2, 1, 3).reshape(ch_h, ch_w).astype(np.float32)
        )
    for c in range(3):
        hs, vs = shifts[c]
        if hs:
            chans[c] = _upsample2x_triangle(chans[c], 1, w)
        if vs:
            chans[c] = _upsample2x_triangle(chans[c], 0, h)
    rr, gg, bb = ycbcr_to_rgb(chans[0], chans[1], chans[2])
    want = np.stack([np.asarray(rr), np.asarray(gg), np.asarray(bb)])
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_raw_dequant_matrix_and_jpeg_quant_detection():
    """Raw (modular-coded) dequant matrix encoding (dequant.rs mode 7):
    decode uses value * denominator, and denominator 1/2040 populates
    jpeg_quant_values for JPEG reconstruction."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct_mixed

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.headers.image import OpsinInverseMatrix
    from jxl_oxide_tpu.models.vardct import TransformType as T
    from jxl_oxide_tpu.ops.dct import idct2d

    h = w = 16
    sel_grid = np.zeros((2, 2), dtype=np.int64)  # all DCT8
    mul_grid = np.ones((2, 2), dtype=np.int64)
    rng = np.random.default_rng(61)
    coeff = np.zeros((3, 16, 16), dtype=np.int64)
    m = rng.random((3, 16, 16)) < 0.2
    coeff[m] = rng.integers(-9, 10, int(m.sum()))
    lf_q = rng.integers(-20, 20, (3, 2, 2))
    qmat = rng.integers(8, 64, (3, 8, 8))
    denom = 1.0 / 2040.0
    gs = 4096
    data = encode_jxl_vardct_mixed(
        h, w, sel_grid, mul_grid, coeff, lf_q, gs,
        raw_dct8=(denom, qmat),
    )
    img = JxlImage.from_bytes(data)
    r = img.render_frame(0)
    got = np.stack([np.asarray(p) for p in r.planes])

    # jpeg quant values detected (raster order of the raw matrix)
    hf_global = img._frames[0]._hf_global
    assert hf_global.dequant_matrices.jpeg_quant_values is not None
    for c in range(3):
        assert hf_global.dequant_matrices.jpeg_quant_values[c] == list(
            qmat[c].ravel()
        )

    # independent reconstruction with matrix = qmat * denom
    opsin = OpsinInverseMatrix()
    qb = np.asarray(opsin.quant_bias, dtype=np.float64)
    qbn = opsin.quant_bias_numerator
    denom16 = float(np.float16(denom))
    m_lf = (1.0 / 32.0, 1.0 / 4.0, 1.0 / 2.0)
    want = np.zeros((3, h, w))
    for by in range(2):
        for bx in range(2):
            q = coeff[:, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                np.float64
            )
            for c in range(3):
                mat = (qmat[c] * denom16).T  # need_transpose(DCT8)
                safe = np.where(q[c] == 0, 1.0, q[c])
                biased = np.where(
                    np.abs(q[c]) <= 1.0, q[c] * qb[c], q[c] - qbn / safe
                )
                deq = biased * mat * (65536.0 / gs)
                if c == 2:
                    pass  # b CfL added after all channels below
                q[c] = deq
            q[0] += 0.0 * q[1]
            q[2] += 1.0 * q[1]
            for c in range(3):
                blk = q[c].copy()
                blk[0, 0] = lf_q[c, by, bx] * (m_lf[c] * 512.0 / (gs * 16))
                if c == 0:
                    blk[0, 0] += 0.0 * (
                        lf_q[1, by, bx] * (m_lf[1] * 512.0 / (gs * 16))
                    )
                if c == 2:
                    blk[0, 0] = (
                        lf_q[2, by, bx] * (m_lf[2] * 512.0 / (gs * 16))
                        + lf_q[1, by, bx] * (m_lf[1] * 512.0 / (gs * 16))
                    )
                want[c, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = idct2d(
                    blk.astype(np.float32)
                )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_custom_hf_block_context():
    """Non-default HfBlockContext (lf/qf thresholds + entropy-coded
    cluster map, jxl-vardct lf.rs:59-116): context classification must not
    desync the coefficient decode."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct_mixed

    from jxl_oxide_tpu import JxlImage

    h = w = 32
    sel_grid = np.zeros((4, 4), dtype=np.int64)
    mul_grid = np.ones((4, 4), dtype=np.int64)
    mul_grid[1:, 1:] = 5  # cross the qf threshold
    rng = np.random.default_rng(67)
    coeff = np.zeros((3, 32, 32), dtype=np.int64)
    m = rng.random((3, 32, 32)) < 0.15
    coeff[m] = rng.integers(-8, 9, int(m.sum()))
    lf_q = rng.integers(-25, 25, (3, 4, 4))

    base = encode_jxl_vardct_mixed(
        h, w, sel_grid, mul_grid, coeff, lf_q,
    )
    custom = encode_jxl_vardct_mixed(
        h, w, sel_grid, mul_grid, coeff, lf_q,
        hf_block_ctx=([3], ((0,), (-5, 5), ())),
    )
    assert custom != base
    p1 = [np.asarray(p)
          for p in JxlImage.from_bytes(base).render_frame(0).planes]
    p2 = [np.asarray(p)
          for p in JxlImage.from_bytes(custom).render_frame(0).planes]
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)


def test_custom_coefficient_order():
    """Lehmer-permuted HF coefficient orders (hf_pass.rs:26-95 +
    permutation.rs): a shuffled DCT8 order round-trips."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct_mixed

    from jxl_oxide_tpu import JxlImage

    h = w = 16
    sel_grid = np.zeros((2, 2), dtype=np.int64)
    mul_grid = np.ones((2, 2), dtype=np.int64)
    rng = np.random.default_rng(71)
    coeff = np.zeros((3, 16, 16), dtype=np.int64)
    m = rng.random((3, 16, 16)) < 0.3
    coeff[m] = rng.integers(-7, 8, int(m.sum()))
    lf_q = rng.integers(-15, 15, (3, 2, 2))

    base = encode_jxl_vardct_mixed(h, w, sel_grid, mul_grid, coeff, lf_q)
    # permute: keep position 0 (DC slot), shuffle the rest
    perm = [0] + list(1 + rng.permutation(63))
    shuffled = encode_jxl_vardct_mixed(
        h, w, sel_grid, mul_grid, coeff, lf_q,
        custom_orders={0: perm},
    )
    assert shuffled != base
    p1 = [np.asarray(p)
          for p in JxlImage.from_bytes(base).render_frame(0).planes]
    p2 = [np.asarray(p)
          for p in JxlImage.from_bytes(shuffled).render_frame(0).planes]
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)


def test_custom_cfl_correlations():
    """Non-default LfChannelCorrelation + per-64x64 CfL grids (lf.rs:94-111,
    hf_metadata x_from_y/b_from_y): kx/kb = base + grid/colour_factor
    applied to both LF and HF."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct_mixed

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.headers.image import OpsinInverseMatrix
    from jxl_oxide_tpu.models.vardct import DequantMatrixSet, TransformType as T
    from jxl_oxide_tpu.ops.dct import idct2d

    h = w = 64  # one 64x64 CfL tile
    bh = bw = 8
    rng = np.random.default_rng(73)
    coeff = np.zeros((3, 64, 64), dtype=np.int64)
    m = rng.random((3, 64, 64)) < 0.15
    coeff[m] = rng.integers(-8, 9, int(m.sum()))
    lf_q = rng.integers(-20, 20, (3, bh, bw))
    cf, base_x, base_b = 100, 0.25, -0.5
    xf_lf, bf_lf = 150, 100
    xg = np.array([[30]])
    bg = np.array([[-20]])
    gs = 4096
    data = encode_jxl_vardct_mixed(
        h, w, np.zeros((bh, bw), dtype=np.int64),
        np.ones((bh, bw), dtype=np.int64), coeff, lf_q, gs,
        lf_chan_corr=(cf, base_x, base_b, xf_lf, bf_lf),
        cfl_grids=(xg, bg),
    )
    got = np.stack([
        np.asarray(p)
        for p in JxlImage.from_bytes(data).render_frame(0).planes
    ])

    base_x16 = float(np.float16(base_x))
    base_b16 = float(np.float16(base_b))
    # HF CfL uses the per-tile grids; LF CfL uses x/b_factor_lf
    kx_hf = base_x16 + 30 / cf
    kb_hf = base_b16 + (-20) / cf
    kx_lf = base_x16 + (150 - 128) / cf
    kb_lf = base_b16 + (100 - 128) / cf

    opsin = OpsinInverseMatrix()
    qb = np.asarray(opsin.quant_bias, dtype=np.float64)
    qbn = opsin.quant_bias_numerator
    dms = DequantMatrixSet.default()
    m_lf = (1.0 / 32.0, 1.0 / 4.0, 1.0 / 2.0)
    lf = np.stack([lf_q[c] * (m_lf[c] * 512.0 / (gs * 16)) for c in range(3)])
    lf = np.stack([lf[0] + kx_lf * lf[1], lf[1], lf[2] + kb_lf * lf[1]])
    want = np.zeros((3, h, w))
    for by in range(bh):
        for bx in range(bw):
            q = coeff[:, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(
                np.float64
            )
            deq = np.zeros_like(q)
            for c in range(3):
                mat = dms.get(c, T.DCT8, True)
                safe = np.where(q[c] == 0, 1.0, q[c])
                biased = np.where(
                    np.abs(q[c]) <= 1.0, q[c] * qb[c], q[c] - qbn / safe
                )
                deq[c] = biased * mat * (65536.0 / gs)
            deq = np.stack([
                deq[0] + kx_hf * deq[1], deq[1], deq[2] + kb_hf * deq[1],
            ])
            for c in range(3):
                blk = deq[c].copy()
                blk[0, 0] = lf[c, by, bx]
                want[c, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = idct2d(
                    blk.astype(np.float32)
                )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_extra_precision_and_quant_lf():
    """extra_precision scales LF dequant by 2^(9-ep) and quant_lf divides
    the LF scale (lf.rs:118-182, copy_lf_dequant vardct/mod.rs:387-413)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct_mixed

    from jxl_oxide_tpu import JxlImage

    h = w = 16
    sel_grid = np.zeros((2, 2), dtype=np.int64)
    mul_grid = np.ones((2, 2), dtype=np.int64)
    coeff = np.zeros((3, 16, 16), dtype=np.int64)
    lf_q = np.full((3, 2, 2), 8)
    gs = 4096

    def dc_mean(data):
        r = JxlImage.from_bytes(data).render_frame(0)
        return float(np.asarray(r.planes[1]).mean())

    base = dc_mean(encode_jxl_vardct_mixed(
        h, w, sel_grid, mul_grid, coeff, lf_q, gs))
    # extra_precision=2: lf values carry 2 extra fraction bits -> /4
    ep = dc_mean(encode_jxl_vardct_mixed(
        h, w, sel_grid, mul_grid, coeff, lf_q, gs, extra_precision=2))
    np.testing.assert_allclose(ep, base / 4.0, rtol=1e-5)
    # quant_lf=32: LF scale halves
    ql = dc_mean(encode_jxl_vardct_mixed(
        h, w, sel_grid, mul_grid, coeff, lf_q, gs, quant_lf=32))
    np.testing.assert_allclose(ql, base / 2.0, rtol=1e-5)


def test_xyb_vardct_roundtrip():
    """xyb_encoded VarDCT (the flagship photo path): x/b_qm_scale dequant,
    device XYB->linear-sRGB (xyb.rs:34-60 + opsin matrix) and the sRGB
    transfer function. PSNR vs the source after a full encode/decode."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu import JxlImage

    h = w = 128
    rng = np.random.default_rng(81)
    small = rng.uniform(0.1, 0.9, (h // 8 + 1, w // 8 + 1, 3)).astype(
        np.float32
    )
    img = np.kron(small, np.ones((8, 8, 1), dtype=np.float32))[:h, :w]
    for xq, bq in ((3, 2), (4, 3)):
        data = encode_jxl_vardct(
            img, global_scale=2048, xyb=True, x_qm_scale=xq, b_qm_scale=bq,
        )
        jx = JxlImage.from_bytes(data)
        assert jx.image_header.metadata.xyb_encoded
        out = np.stack(jx.render_frame(0).image_planar(), -1)
        mse = float(np.mean((out - img) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 38.0, (xq, bq, psnr)


def test_fused_pipeline_cache_reuse_across_images():
    """Two DIFFERENT images with the same plane geometry and transform-type
    set reuse one compiled fused pipeline (bucket counts pad to pow2, so
    per-image varblock counts don't force recompiles — the serving-path
    warm-decode contract)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.render.vardct import VardctFrameState

    rng = np.random.default_rng(55)
    a = encode_jxl_vardct(rng.random((256, 256, 3)).astype(np.float32))
    b = encode_jxl_vardct(rng.random((256, 256, 3)).astype(np.float32))
    JxlImage.from_bytes(a).render_frame(0)
    n_after_first = len(VardctFrameState._fused_cache)
    out_b = JxlImage.from_bytes(b).render_frame(0).to_u8()
    assert len(VardctFrameState._fused_cache) == n_after_first
    assert out_b.shape == (256, 256, 3)


def test_tall_image_bucket_padding_no_wraparound():
    """Bucket pad sentinels must stay out of range on tall planes: JAX
    normalizes negative scatter indices by adding the axis size before
    mode="drop" filters, so a negative sentinel on an >8192-row image
    would wrap in range and splat garbage blocks over real pixels. With a
    single nonzero LF sample, every pixel outside its block must be 0."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct_tiled

    from jxl_oxide_tpu import JxlImage

    h, w = 8320, 128  # 1040x16 blocks: pads 16640 -> 32768 (16k sentinels)
    bh, bw = h // 8, w // 8
    sel = np.zeros((bh, bw), dtype=np.int64)  # all DCT8
    mul = np.ones((bh, bw), dtype=np.int64)
    coeff = np.zeros((3, h, w), dtype=np.int64)
    lf_q = np.zeros((3, bh, bw), dtype=np.int64)
    lf_q[:, 0, 0] = 64
    data = encode_jxl_vardct_tiled(h, w, sel, mul, coeff, lf_q)
    r = JxlImage.from_bytes(data).render_frame(0)
    planes = np.stack([np.asarray(p, dtype=np.float32) for p in r.planes])
    assert np.abs(planes[:, :8, :8]).max() > 1e-4  # block (0,0) carries LF
    rest = planes.copy()
    rest[:, :8, :8] = 0
    assert np.abs(rest).max() == 0.0, float(np.abs(rest).max())


def test_dense_plan_entry_cap_falls_back_to_staged():
    """Streams that stagger transforms across many block-offset residue
    classes must fall back to the bounded staged path (each dense-plan
    entry is a full-plane XLA pass; adversarial streams could otherwise
    explode compile time). The fallback must be pixel-identical."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct_mixed

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.models.vardct import TransformType as T
    from jxl_oxide_tpu.render import vardct as vmod

    h = w = 128
    bh = bw = 16
    rng = np.random.default_rng(17)
    sel = np.full((bh, bw), -1, dtype=np.int64)
    # staggered DCT16s (2x2 blocks) at all four residues + DCT8 filler
    sel[1, 1] = T.DCT16
    sel[1, 4] = T.DCT16
    sel[4, 1] = T.DCT16
    sel[4, 4] = T.DCT16
    covered = np.zeros((bh, bw), dtype=bool)
    for (y, x) in ((1, 1), (1, 4), (4, 1), (4, 4)):
        covered[y:y + 2, x:x + 2] = True
    sel[8, 8] = T.DCT16X8  # 1 block wide x 2 blocks tall
    covered[8:10, 8] = True
    for y in range(bh):
        for x in range(bw):
            if not covered[y, x] and sel[y, x] < 0:
                sel[y, x] = T.DCT8
    mul = np.ones((bh, bw), dtype=np.int64)
    coeff = rng.integers(-6, 7, (3, h, w)).astype(np.int64)
    coeff[np.abs(coeff) < 5] = 0
    lf_q = rng.integers(-30, 31, (3, bh, bw)).astype(np.int64)
    data = encode_jxl_vardct_mixed(h, w, sel, mul, coeff, lf_q)

    fused = JxlImage.from_bytes(data).render_frame(0).to_u8()
    old = vmod.DENSE_PLAN_MAX_ENTRIES
    vmod.DENSE_PLAN_MAX_ENTRIES = 2  # force the cap
    try:
        staged = JxlImage.from_bytes(data).render_frame(0).to_u8()
    finally:
        vmod.DENSE_PLAN_MAX_ENTRIES = old
    np.testing.assert_array_equal(fused, staged)


def test_dense_plan_cap_preserves_lf_frame_and_roi():
    """The entry-cap fallback must carry the LF-frame override into the
    staged path (it is pre-dequantized: identity scale, no LF CfL, no
    smoothing) and slice staged output to the ROI rect."""
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.render import vardct as vmod

    img = _smooth_image(128, 96, seed=43)
    data = encode_jxl_vardct(img, global_scale=65536, use_lf_frame=True)
    fused = JxlImage.from_bytes(data).render_frame(0).to_u8()
    old = vmod.DENSE_PLAN_MAX_ENTRIES
    vmod.DENSE_PLAN_MAX_ENTRIES = 0
    try:
        staged = JxlImage.from_bytes(data).render_frame(0).to_u8()
        # ROI decode through the capped path
        roi_img = JxlImage.from_bytes(data)
        roi_img.set_image_region(16, 8, 64, 48)
        roi = roi_img.render_frame(0).to_u8()
    finally:
        vmod.DENSE_PLAN_MAX_ENTRIES = old
    np.testing.assert_array_equal(fused, staged)
    np.testing.assert_array_equal(roi, fused[8 : 8 + 48, 16 : 16 + 64])


def test_multiple_hf_presets_roundtrip():
    """num_hf_presets > 1: each pass-group section selects its preset and
    the HF decode uses ctx_offset = hfp * 495 * num_block_clusters
    (hf_global.rs num_hf_presets, hf_coeff.rs context base) — previously
    untested plumbing in both the Python and native batch paths."""
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu import JxlImage

    img = _smooth_image(300, 520, seed=27)
    data1 = encode_jxl_vardct(img, global_scale=8192)
    data3 = encode_jxl_vardct(img, global_scale=8192, num_hf_presets=3)
    out1 = JxlImage.from_bytes(data1).render_frame(0).to_u8()
    out3 = JxlImage.from_bytes(data3).render_frame(0).to_u8()
    # same quantized coefficients, only the preset routing differs
    np.testing.assert_array_equal(out1, out3)


def test_custom_gabor_weights_applied():
    """Non-default gaborish weights (filter.rs Gabor::Enabled custom):
    the decode must match applying the standalone gabor op with the same
    weights to the unfiltered decode."""
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu.ops.filters import apply_gabor

    img = _smooth_image(64, 64, seed=55)
    weights = [(0.2, 0.04), (0.1, 0.08), (0.15, 0.02)]
    w16 = [tuple(np.float32(np.float16(v)) for v in pair)
           for pair in weights]  # f16 storage quantization
    plain = encode_jxl_vardct(img, global_scale=4096)
    custom = encode_jxl_vardct(img, global_scale=4096, gabor=True,
                               gabor_weights=weights)
    (x0, y0, b0), _ = decode(plain)
    (x1, y1, b1), _ = decode(custom)
    g = [np.asarray(p) for p in apply_gabor([x0, y0, b0], tuple(w16))]
    np.testing.assert_allclose(np.stack([x1, y1, b1]), np.stack(g),
                               atol=2e-4)


def test_custom_epf_params_applied():
    """Custom EPF sharp_lut + sigma params (filter.rs EpfParams custom
    branches) must change the output versus default EPF while remaining a
    faithful reconstruction."""
    from encoder_vardct import encode_jxl_vardct

    img = _smooth_image(96, 96, seed=56)
    default_epf = encode_jxl_vardct(img, global_scale=4096, epf_iters=2)
    custom = encode_jxl_vardct(
        img, global_scale=4096, epf_iters=2,
        epf_sharp_lut=[0.2] * 8,
        epf_sigma=(0.9, 1.5, 5.0, 0.5),
        epf_channel_scale=(30.0, 4.0, 1.5),
    )
    (x0, y0, b0), _ = decode(default_epf)
    (x1, y1, b1), _ = decode(custom)
    d = np.abs(np.stack([x0, y0, b0]) - np.stack([x1, y1, b1])).max()
    assert d > 1e-4, "custom EPF params had no effect"
    p = psnr(np.clip(np.stack([x1, y1, b1], -1), 0, 1), img)
    assert p > 30.0, f"custom EPF wrecked the image: {p:.2f} dB"


def test_ycbcr_420_fused_filter_tail_vs_staged(monkeypatch):
    """The fused subsampled program (per-channel transforms + triangle
    chroma upsample + gabor + EPF in ONE dispatch,
    ops/vardct_pipeline.build_fused_pipeline_subsampled) must match the
    staged reference path (per-plane dispatches + render-side upsample +
    filters) on a 4:2:0 stream with both filters enabled."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct_420

    from jxl_oxide_tpu import JxlImage

    h = w = 64
    bh, bw = h // 8, w // 8
    rng = np.random.default_rng(61)
    shapes = [(h // 2, w // 2), (h, w), (h // 2, w // 2)]
    coeff = []
    for sh in shapes:
        c = np.zeros(sh, dtype=np.int64)
        m = rng.random(sh) < 0.15
        c[m] = rng.integers(-12, 13, int(m.sum()))
        coeff.append(c)
    lf_q = [
        rng.integers(-30, 30, (bh // 2, bw // 2)),
        rng.integers(-30, 30, (bh, bw)),
        rng.integers(-30, 30, (bh // 2, bw // 2)),
    ]
    data = encode_jxl_vardct_420(h, w, coeff, lf_q, 4096,
                                 gabor=True, epf_iters=2)

    got = np.stack([
        np.asarray(p) for p in JxlImage.from_bytes(data).render_frame(0).planes
    ])
    monkeypatch.setenv("JXL_TPU_FORCE_STAGED", "1")
    want = np.stack([
        np.asarray(p) for p in JxlImage.from_bytes(data).render_frame(0).planes
    ])
    assert got.shape == want.shape == (3, h, w)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ycbcr_asym_fused_filter_tail_vs_staged(monkeypatch):
    """Same fused-vs-staged comparison for the asymmetric 4:2:2 / 4:4:0
    layouts (one-axis chroma upsample inside the fused program)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from encoder_vardct import encode_jxl_vardct_420

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.models.vardct import jpeg_shifts

    h = w = 64
    bh, bw = h // 8, w // 8
    rng = np.random.default_rng(62)
    for ups in [(0, 2, 0), (0, 3, 0)]:
        shifts = jpeg_shifts(ups)
        coeff = []
        lf_q = []
        for c in range(3):
            hs, vs = shifts[c]
            sh = (h >> vs, w >> hs)
            cp = np.zeros(sh, dtype=np.int64)
            m = rng.random(sh) < 0.15
            cp[m] = rng.integers(-12, 13, int(m.sum()))
            coeff.append(cp)
            lf_q.append(rng.integers(-30, 30, (bh >> vs, bw >> hs)))
        data = encode_jxl_vardct_420(h, w, coeff, lf_q, 4096,
                                     jpeg_upsampling=ups,
                                     gabor=True, epf_iters=3)
        got = np.stack([
            np.asarray(p)
            for p in JxlImage.from_bytes(data).render_frame(0).planes
        ])
        monkeypatch.setenv("JXL_TPU_FORCE_STAGED", "1")
        want = np.stack([
            np.asarray(p)
            for p in JxlImage.from_bytes(data).render_frame(0).planes
        ])
        monkeypatch.delenv("JXL_TPU_FORCE_STAGED")
        assert got.shape == want.shape == (3, h, w)
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=str(ups))
