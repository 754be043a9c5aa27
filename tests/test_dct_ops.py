"""DCT and varblock transform tests.

Mirrors the reference's spec-formula unit tests
(jxl-render/src/vardct/generic/dct.rs:300-430): forward DCT must match the
naive f64 cosine sum with 1/N + sqrt(2) normalization; inverse must match
the dual sum. Plus varblock inverse-transform invariants (constant LF with
zero HF must reproduce the constant for every transform type).
"""

import numpy as np
import pytest

from jxl_oxide_tpu.models.vardct import TransformType, natural_order
from jxl_oxide_tpu.ops.dct import (
    dct2d,
    dct_basis_forward,
    dct_basis_inverse,
    idct2d,
)
from jxl_oxide_tpu.ops.varblock import inverse_varblock_batch, scale_f_map


def naive_forward_1d(x):
    n = len(x)
    out = np.zeros(n)
    for k in range(n):
        acc = 0.0
        for i, v in enumerate(x):
            acc += v * np.cos(k * (2 * i + 1) / n * np.pi / 2)
        acc /= n
        if k != 0:
            acc *= np.sqrt(2.0)
        out[k] = acc
    return out


def naive_inverse_1d(f):
    n = len(f)
    out = np.zeros(n)
    for k in range(n):
        acc = f[0]
        for i in range(1, n):
            acc += np.sqrt(2.0) * f[i] * np.cos(i * (2 * k + 1) / n * np.pi / 2)
        out[k] = acc
    return out


@pytest.mark.parametrize("n", [2, 4, 8, 16, 32, 64, 128, 256])
def test_forward_matches_naive(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal(n)
    got = dct_basis_forward(n).astype(np.float64) @ x
    np.testing.assert_allclose(got, naive_forward_1d(x), atol=1e-5)


@pytest.mark.parametrize("n", [2, 4, 8, 16, 32, 64, 128, 256])
def test_inverse_matches_naive(n):
    rng = np.random.default_rng(n + 1)
    f = rng.standard_normal(n)
    got = dct_basis_inverse(n).astype(np.float64) @ f
    np.testing.assert_allclose(got, naive_inverse_1d(f), atol=1e-5)


@pytest.mark.parametrize("shape", [(8, 8), (8, 16), (32, 8), (16, 16)])
def test_roundtrip_2d(shape):
    rng = np.random.default_rng(7)
    x = rng.standard_normal(shape).astype(np.float32)
    back = idct2d(dct2d(x))
    np.testing.assert_allclose(back, x, atol=1e-4)


ALL_TYPES = list(range(TransformType.NUM_TYPES))


@pytest.mark.parametrize("sel", ALL_TYPES)
def test_constant_lf_zero_hf(sel):
    """Zero HF + constant LF v must decode to a constant-v block for every
    transform type (DC-preservation of the whole transform chain)."""
    bw, bh = TransformType.SELECT_SIZE[sel]
    h, w = bh * 8, bw * 8
    v = 0.375
    coeffs = np.zeros((2, h, w), dtype=np.float32)
    lf = np.full((2, bh, bw), v, dtype=np.float32)
    out = np.asarray(inverse_varblock_batch(coeffs, lf, sel))
    assert out.shape == (2, h, w)
    np.testing.assert_allclose(out, v, atol=1e-5)


def test_dct8_hf_roundtrip():
    """DCT8 with known coefficients equals a plain 8x8 IDCT with DC=lf."""
    rng = np.random.default_rng(3)
    coeffs = rng.standard_normal((5, 8, 8)).astype(np.float32)
    lf = rng.standard_normal((5, 1, 1)).astype(np.float32)
    out = np.asarray(inverse_varblock_batch(coeffs, lf, TransformType.DCT8))
    ref = coeffs.copy()
    ref[:, 0, 0] = lf[:, 0, 0]
    np.testing.assert_allclose(out, idct2d(ref), atol=1e-4)


def test_dct16_lf_mean_preservation():
    """For DCT16, the 2x2 LF tile's forward DCT lands in the low corner with
    scale_f compensation; with zero HF the block mean equals the LF mean."""
    rng = np.random.default_rng(4)
    lf = rng.standard_normal((3, 2, 2)).astype(np.float32)
    coeffs = np.zeros((3, 16, 16), dtype=np.float32)
    out = np.asarray(inverse_varblock_batch(coeffs, lf, TransformType.DCT16))
    np.testing.assert_allclose(
        out.mean(axis=(1, 2)), lf.mean(axis=(1, 2)), atol=1e-5
    )


def test_scale_f_map_dc():
    m = scale_f_map(2, 2)
    assert m[0, 0] == 1.0
    assert m.shape == (2, 2)
    # SCALE_F[16] for the second entry at logb = 4
    np.testing.assert_allclose(m[0, 1], 0.9017641950288744, rtol=1e-6)


@pytest.mark.parametrize("order_id", range(13))
def test_natural_order_is_permutation(order_id):
    order = natural_order(order_id)
    from jxl_oxide_tpu.models.vardct import _ORDER_BLOCK_SIZES

    bw, bh = _ORDER_BLOCK_SIZES[order_id]
    assert len(order) == bw * bh
    assert len(set(order)) == bw * bh
    xs = [x for x, _ in order]
    ys = [y for _, y in order]
    assert max(xs) == bw - 1 and max(ys) == bh - 1
    # first lbw*lbh entries are the LF corner in raster order
    lbw, lbh = bw // 8, bh // 8
    for i in range(lbw * lbh):
        assert order[i] == (i % lbw, i // lbw)


@pytest.mark.parametrize("sel", [
    TransformType.DCT2, TransformType.DCT4, TransformType.HORNUSS,
    TransformType.DCT4X8, TransformType.AFV0, TransformType.AFV1,
    TransformType.AFV2, TransformType.AFV3,
])
def test_special_lowrank_factors_reconstruct(sel):
    """The Kronecker factor sum must reproduce the tiled transform's
    64x64 linear map (incl. the LF/DC substitution in the (0,0) slot)."""
    from jxl_oxide_tpu.ops.varblock import special_lowrank_factors

    factors = special_lowrank_factors(sel, 20)
    assert factors is not None
    v, h = factors
    # reference map by impulses through the tiled path
    coeffs = np.zeros((64, 8, 8), dtype=np.float32)
    lf = np.zeros((64, 1, 1), dtype=np.float32)
    lf[0, 0, 0] = 1.0
    for k in range(1, 64):
        coeffs[k, k // 8, k % 8] = 1.0
    ref = np.asarray(inverse_varblock_batch(coeffs, lf, sel))
    for k in range(64):
        tile = np.zeros((8, 8), dtype=np.float64)
        src = np.zeros((8, 8), dtype=np.float64)
        src[k // 8, k % 8] = 1.0
        for i in range(v.shape[0]):
            tile += v[i].astype(np.float64) @ src @ h[i].astype(np.float64).T
        np.testing.assert_allclose(tile, ref[k], atol=2e-5)


def test_dct8x4_stays_tiled():
    from jxl_oxide_tpu.ops.varblock import special_lowrank_factors

    assert special_lowrank_factors(TransformType.DCT8X4, 20) is None
