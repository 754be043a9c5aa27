"""Independent spec oracles: naive float64 scalar implementations of the
inverse transforms and filters, written as direct loop translations of the
spec formulas (jxl-render/src/vardct/generic/transform.rs,
filter/{gabor.rs,epf.rs}, features/upsampling.rs, vardct generic/mod.rs
adaptive LF smoothing) — deliberately NOT sharing code with the
vectorized jnp kernels in ops/. Catches vectorization/layout bugs the
encoder<->decoder round-trip tests cannot see (both could share a spec
misreading of the batched formulation)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")

from jxl_oxide_tpu.models.vardct import TransformType as T
from jxl_oxide_tpu.ops.varblock import AFV_BASIS, inverse_varblock_batch


def naive_idct_1d(f):
    """x[k] = F[0] + sqrt(2) * sum_{n>=1} F[n] cos(pi n (2k+1) / 2N)."""
    n = len(f)
    out = np.zeros(n, dtype=np.float64)
    for k in range(n):
        v = f[0]
        for m in range(1, n):
            v += np.sqrt(2.0) * f[m] * np.cos(np.pi * m * (2 * k + 1) / (2 * n))
        out[k] = v
    return out


def naive_idct_2d(coeffs):
    h, w = coeffs.shape
    tmp = np.zeros((h, w), dtype=np.float64)
    for x in range(w):
        tmp[:, x] = naive_idct_1d(coeffs[:, x].astype(np.float64))
    out = np.zeros((h, w), dtype=np.float64)
    for y in range(h):
        out[y, :] = naive_idct_1d(tmp[y, :])
    return out


def naive_aux_idct2(c, size):
    """aux_idct2_in_place<SIZE> (transform.rs:26-49): butterfly on the
    top-left size x size corner."""
    c = c.copy()
    n2 = size // 2
    block = np.zeros((size, size), dtype=np.float64)
    for y in range(n2):
        for x in range(n2):
            a = c[y, x]
            b = c[y, x + n2]
            d = c[y + n2, x]
            e = c[y + n2, x + n2]
            block[2 * y, 2 * x] = a + b + d + e
            block[2 * y, 2 * x + 1] = a + b - d - e
            block[2 * y + 1, 2 * x] = a - b + d - e
            block[2 * y + 1, 2 * x + 1] = a - b - d + e
    c[:size, :size] = block
    return c


def naive_dct2(c):
    c = naive_aux_idct2(c, 2)
    c = naive_aux_idct2(c, 4)
    return naive_aux_idct2(c, 8)


def naive_dct4(c):
    c = naive_aux_idct2(c, 2)
    out = np.zeros((8, 8), dtype=np.float64)
    for qy in range(2):
        for qx in range(2):
            t = c[qy::2, qx::2]
            s = naive_idct_2d(t).T  # transposed placement (transform.rs:56-82)
            out[qy * 4 : qy * 4 + 4, qx * 4 : qx * 4 + 4] = s
    return out


def naive_hornuss(c):
    c = naive_aux_idct2(c, 2)
    out = np.zeros((8, 8), dtype=np.float64)
    for qy in range(2):
        for qx in range(2):
            t = c[qy::2, qx::2].copy()
            residual_sum = t.sum() - t[0, 0]
            avg = t[0, 0] - residual_sum / 16.0
            t[0, 0] = t[1, 1]
            t[1, 1] = 0.0
            t = t + avg
            out[qy * 4 : qy * 4 + 4, qx * 4 : qx * 4 + 4] = t
    return out


def naive_dct4x8(c, transpose):
    c = c.copy()
    c0, c1 = c[0, 0], c[1, 0]
    c[0, 0] = c0 + c1
    c[1, 0] = c0 - c1
    halves = [naive_idct_2d(c[idx::2, :]) for idx in range(2)]
    m = np.concatenate(halves, axis=0)
    return m.T if transpose else m


def naive_afv(c, variant):
    flip_x, flip_y = variant % 2, variant // 2
    coeff_afv = np.zeros(16, dtype=np.float64)
    for iy in range(4):
        for ix in range(4):
            coeff_afv[iy * 4 + ix] = c[2 * iy, 2 * ix]
    coeff_afv[0] = (c[0, 0] + c[0, 1] + c[1, 0]) * 4.0
    samples = np.zeros(16, dtype=np.float64)
    for j in range(16):
        for k in range(16):
            samples[j] += coeff_afv[k] * float(AFV_BASIS[k, j])
    samples = samples.reshape(4, 4)
    if flip_y:
        samples = samples[::-1, :]
    if flip_x:
        samples = samples[:, ::-1]

    s44 = np.zeros((4, 4), dtype=np.float64)
    for iy in range(4):
        for ix in range(4):
            s44[ix, iy] = c[2 * iy, 2 * ix + 1]
    s44[0, 0] = c[0, 0] - c[0, 1] + c[1, 0]
    s44 = naive_idct_2d(s44)

    s48 = c[1::2, :].astype(np.float64).copy()
    s48[0, 0] = c[0, 0] - c[1, 0]
    s48 = naive_idct_2d(s48)

    out = np.zeros((8, 8), dtype=np.float64)
    ys, xs = flip_y * 4, flip_x * 4
    out[ys : ys + 4, xs : xs + 4] = samples
    x44 = (1 - flip_x) * 4
    out[ys : ys + 4, x44 : x44 + 4] = s44
    y48 = (1 - flip_y) * 4
    out[y48 : y48 + 4, :] = s48
    return out


NAIVE_1X1 = {
    T.DCT2: naive_dct2,
    T.DCT4: naive_dct4,
    T.HORNUSS: naive_hornuss,
    T.DCT4X8: lambda c: naive_dct4x8(c, False),
    T.DCT8X4: lambda c: naive_dct4x8(c, True),
    T.AFV0: lambda c: naive_afv(c, 0),
    T.AFV1: lambda c: naive_afv(c, 1),
    T.AFV2: lambda c: naive_afv(c, 2),
    T.AFV3: lambda c: naive_afv(c, 3),
}


@pytest.mark.parametrize("sel", sorted(NAIVE_1X1))
def test_special_transforms_match_naive(sel):
    """DCT2/DCT4/Hornuss/DCT4x8/AFV0-3 vs scalar float64 spec loops."""
    rng = np.random.default_rng(1000 + sel)
    n = 5
    coeffs = rng.standard_normal((n, 8, 8)).astype(np.float32)
    lf = rng.standard_normal((n, 1, 1)).astype(np.float32)
    got = np.asarray(inverse_varblock_batch(coeffs, lf, sel))
    fn = NAIVE_1X1[sel]
    for i in range(n):
        c = coeffs[i].astype(np.float64).copy()
        c[0, 0] = lf[i, 0, 0]  # 1x1 blocks take LF as DC directly
        np.testing.assert_allclose(got[i], fn(c), atol=2e-4,
                                   err_msg=f"sel={sel} block={i}")


def test_gabor_matches_naive():
    """3x3 self-correlation smoothing (gabor.rs:8-121): scalar loops with
    clamp-to-edge boundary."""
    from jxl_oxide_tpu.ops.filters import gabor

    rng = np.random.default_rng(7)
    h, w = 13, 17
    x = rng.standard_normal((h, w)).astype(np.float32)
    w0, w1 = 0.115169525, 0.061248592
    got = np.asarray(gabor(x, (w0, w1)))
    want = np.zeros((h, w), dtype=np.float64)
    norm = 1.0 / (1.0 + 4 * w0 + 4 * w1)
    xp = x.astype(np.float64)
    for y in range(h):
        for xx in range(w):
            def at(dy, dx):
                return xp[min(max(y + dy, 0), h - 1),
                          min(max(xx + dx, 0), w - 1)]
            side = at(-1, 0) + at(1, 0) + at(0, -1) + at(0, 1)
            diag = at(-1, -1) + at(-1, 1) + at(1, -1) + at(1, 1)
            want[y, xx] = (at(0, 0) + side * w0 + diag * w1) * norm
    np.testing.assert_allclose(got, want, atol=1e-5)


def _mirror(v, n):
    """Symmetric mirror indexing (util.rs:376-386)."""
    while v < 0 or v >= n:
        if v < 0:
            v = -v - 1
        else:
            v = 2 * n - v - 1
    return v


@pytest.mark.parametrize("step,mult", [(0, 0.9), (1, 1.0), (2, 6.5)])
def test_epf_step_matches_naive(step, mult):
    """One EPF pass vs scalar loops implementing the SAD-weighted cross
    kernel with border multipliers (filter/epf.rs + impls/generic/epf.rs)."""
    from jxl_oxide_tpu.ops.filters import epf_step

    kernels = {
        0: [(0, -2), (-1, -1), (0, -1), (1, -1), (-2, 0), (-1, 0), (1, 0),
            (2, 0), (-1, 1), (0, 1), (1, 1), (0, 2)],
        1: [(0, -1), (0, 1), (-1, 0), (1, 0)],
        2: [(0, -1), (0, 1), (-1, 0), (1, 0)],
    }
    dists = {
        0: [(0, -1), (1, 0), (0, 0), (-1, 0), (0, 1)],
        1: [(0, -1), (0, 0), (0, 1), (-1, 0), (1, 0)],
        2: [(0, 0)],
    }
    rng = np.random.default_rng(31)
    h, w = 16, 24
    planes = rng.standard_normal((3, h, w)).astype(np.float32)
    sigma = (0.2 + rng.random((h, w)) * 2.0).astype(np.float32)
    cs = (40.0, 5.0, 3.5)
    bsm = 2.0 / 3.0
    got = np.asarray(epf_step(planes, sigma, step, cs, mult, bsm))

    p = planes.astype(np.float64)
    want = np.zeros_like(p)
    for y in range(h):
        for x in range(w):
            if sigma[y, x] < 0.3:
                want[:, y, x] = p[:, y, x]
                continue
            border = (y % 8 in (0, 7)) or (x % 8 in (0, 7))
            sm = mult * bsm if border else mult
            inv_sigma = 6.6 * (1.0 / np.sqrt(2.0) - 1.0) / sigma[y, x] * sm

            def at(c, dy, dx):
                return p[c, _mirror(y + dy, h), _mirror(x + dx, w)]

            sw = 1.0
            sc = [p[c, y, x] for c in range(3)]
            for kx, ky in kernels[step]:
                dist = 0.0
                for c in range(3):
                    acc = 0.0
                    for ix, iy in dists[step]:
                        acc += abs(at(c, ky + iy, kx + ix) - at(c, iy, ix))
                    dist += cs[c] * acc
                weight = max(1.0 + dist * inv_sigma, 0.0)
                sw += weight
                for c in range(3):
                    sc[c] += weight * at(c, ky, kx)
            for c in range(3):
                want[c, y, x] = sc[c] / sw
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_adaptive_lf_smoothing_matches_naive():
    """Self-guided LF smoothing (generic/mod.rs:10-105): scalar loops;
    borders keep the input value."""
    from jxl_oxide_tpu.ops.vardct_pipeline import adaptive_lf_smoothing

    rng = np.random.default_rng(41)
    h, w = 11, 14
    planes = rng.standard_normal((3, h, w)).astype(np.float32)
    scale = (0.7, 1.3, 2.1)
    got = np.stack([
        np.asarray(a)
        for a in adaptive_lf_smoothing(planes[0], planes[1], planes[2],
                                       tuple(np.float32(s) for s in scale))
    ])
    p = planes.astype(np.float64)
    s_self, s_side, s_diag = 0.052262735, 0.2034514, 0.03348292
    want = p.copy()
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            wa = []
            for c in range(3):
                side = (p[c, y, x - 1] + p[c, y, x + 1]
                        + p[c, y - 1, x] + p[c, y + 1, x])
                diag = (p[c, y - 1, x - 1] + p[c, y - 1, x + 1]
                        + p[c, y + 1, x - 1] + p[c, y + 1, x + 1])
                wa.append(p[c, y, x] * s_self + side * s_side + diag * s_diag)
            gap = 0.5
            for c in range(3):
                gap = max(gap, abs(wa[c] - p[c, y, x]) / scale[c])
            gs = max(3.0 - 4.0 * gap, 0.0)
            for c in range(3):
                want[c, y, x] = (wa[c] - p[c, y, x]) * gs + p[c, y, x]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_upsample2x_matches_naive():
    """Non-separable 2x upsampling (features/upsampling.rs:6-132): per
    output phase a 5x5 kernel from the triangular table with flip
    symmetry, symmetric edge mirroring, clamped to the local 5x5 range."""
    from jxl_oxide_tpu.ops.upsample import D_UP2, upsample_nonseparable

    class Meta:
        up2_weight = None
        up4_weight = None
        up8_weight = None

    rng = np.random.default_rng(51)
    h, w = 9, 12
    x = rng.standard_normal((h, w)).astype(np.float32)
    got = np.asarray(upsample_nonseparable(x, 2, Meta()))

    # expand the 15 triangular weights into the [2, 2, 5, 5] phase kernels
    quarter = np.zeros((25,), dtype=np.float64)
    idx = 0
    for yy in range(5):
        for xx in range(yy, 5):
            v = D_UP2[idx]
            idx += 1
            quarter[yy * 5 + xx] = v
            quarter[xx * 5 + yy] = v
    base = quarter.reshape(5, 5)
    kernels = np.zeros((2, 2, 5, 5), dtype=np.float64)
    for py in range(2):
        for px in range(2):
            ker = base.copy()
            if py >= 1:
                ker = ker[::-1, :]
            if px >= 1:
                ker = ker[:, ::-1]
            kernels[py, px] = ker

    xp = x.astype(np.float64)
    want = np.zeros((h * 2, w * 2), dtype=np.float64)
    for y in range(h):
        for xx in range(w):
            window = np.array([
                [xp[_mirror(y + dy, h), _mirror(xx + dx, w)]
                 for dx in range(-2, 3)]
                for dy in range(-2, 3)
            ])
            for py in range(2):
                for px in range(2):
                    v = float((kernels[py, px] * window).sum())
                    v = min(max(v, window.min()), window.max())
                    want[y * 2 + py, xx * 2 + px] = v
    np.testing.assert_allclose(got, want, atol=1e-5)
