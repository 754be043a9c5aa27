"""Batched varblock inverse transforms on device.

Behavioral parity: jxl-render/src/vardct/generic/transform.rs and
transform_common.rs (transform_varblocks_inner). The reference walks
varblocks one at a time on the CPU; here varblocks are bucketed by transform
type on the host and each bucket runs as ONE batched jax op ([n, H, W]
tensors), so the DCTs become MXU matmuls and the special transforms become
vectorized VPU code. Gather/scatter between the per-frame coefficient planes
and the buckets uses precomputed index arrays.

Index conventions: the reference's `grid.get(x, y)` is (col, row); all
arrays here are [row, col] ([y, x]); the mappings below were derived
statement-by-statement from the Rust code.
"""

from __future__ import annotations

import functools

import numpy as np

from .dct import dct_basis_forward, dct_basis_inverse

__all__ = [
    "SCALE_F",
    "AFV_BASIS",
    "scale_f_map",
    "inverse_varblock_batch",
]

# scale_f(c, logb): SCALE_F[c << logb], precomputed for c = 0..32, b = 256
# (dct_common.rs:77-115; spec constant table for LF band rescaling).
SCALE_F = np.array([
    1.0000000000000000, 0.9996047255830407, 0.9984194528776054,
    0.9964458326264695, 0.9936866130906366, 0.9901456355893141,
    0.9858278282666936, 0.9807391980963174, 0.9748868211368796,
    0.9682788310563117, 0.9609244059440204, 0.9528337534340876,
    0.9440180941651672, 0.9344896436056892, 0.9242615922757944,
    0.9133480844001980, 0.9017641950288744, 0.8895259056651056,
    0.8766500784429904, 0.8631544288990163, 0.8490574973847023,
    0.8343786191696513, 0.8191378932865928, 0.8033561501721485,
    0.7870549181591013, 0.7702563888779096, 0.7529833816270532,
    0.7352593067735488, 0.7171081282466044, 0.6985543251889097,
    0.6796228528314652, 0.6603391026591464,
], dtype=np.float32)

# AFV basis: samples[j] = sum_k coeff[k] * AFV_BASIS[k, j]
# (transform_common.rs AFV_BASIS; spec constant table, 16 coefficients x
# 16 samples in afv_y*4+afv_x layout).
_SQ2 = float(np.sqrt(0.5))
AFV_BASIS = np.array([
    [0.25] * 16,
    [0.876902929799142, 0.2206518106944235, -0.10140050393753763,
     -0.1014005039375375, 0.2206518106944236, -0.10140050393753777,
     -0.10140050393753772, -0.10140050393753763, -0.10140050393753758,
     -0.10140050393753769, -0.1014005039375375, -0.10140050393753768,
     -0.10140050393753768, -0.10140050393753759, -0.10140050393753763,
     -0.10140050393753741],
    [0.0, 0.0, 0.40670075830260755, 0.44444816619734445, 0.0, 0.0,
     0.19574399372042936, 0.2929100136981264, -0.40670075830260716,
     -0.19574399372042872, 0.0, 0.11379074460448091, -0.44444816619734384,
     -0.29291001369812636, -0.1137907446044814, 0.0],
    [0.0, 0.0, -0.21255748058288748, 0.3085497062849767, 0.0,
     0.4706702258572536, -0.1621205195722993, 0.0, -0.21255748058287047,
     -0.16212051957228327, -0.47067022585725277, -0.1464291867126764,
     0.3085497062849487, 0.0, -0.14642918671266536, 0.4251149611657548],
    [0.0, -0.7071067811865474, 0.0, 0.0, _SQ2, 0.0, 0.0, 0.0,
     0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    [-0.4105377591765233, 0.6235485373547691, -0.06435071657946274,
     -0.06435071657946266, 0.6235485373547694, -0.06435071657946284,
     -0.0643507165794628, -0.06435071657946274, -0.06435071657946272,
     -0.06435071657946279, -0.06435071657946266, -0.06435071657946277,
     -0.06435071657946277, -0.06435071657946273, -0.06435071657946274,
     -0.0643507165794626],
    [0.0, 0.0, -0.4517556589999482, 0.15854503551840063, 0.0,
     -0.04038515160822202, 0.0074182263792423875, 0.39351034269210167,
     -0.45175565899994635, 0.007418226379244351, 0.1107416575309343,
     0.08298163094882051, 0.15854503551839705, 0.3935103426921022,
     0.0829816309488214, -0.45175565899994796],
    [0.0, 0.0, -0.304684750724869, 0.5112616136591823, 0.0, 0.0,
     -0.290480129728998, -0.06578701549142804, 0.304684750724884,
     0.2904801297290076, 0.0, -0.23889773523344604, -0.5112616136592012,
     0.06578701549142545, 0.23889773523345467, 0.0],
    [0.0, 0.0, 0.3017929516615495, 0.25792362796341184, 0.0,
     0.16272340142866204, 0.09520022653475037, 0.0, 0.3017929516615503,
     0.09520022653475055, -0.16272340142866173, -0.35312385449816297,
     0.25792362796341295, 0.0, -0.3531238544981624, -0.6035859033230976],
    [0.0, 0.0, 0.40824829046386274, 0.0, 0.0, 0.0, 0.0,
     -0.4082482904638628, -0.4082482904638635, 0.0, 0.0,
     -0.40824829046386296, 0.0, 0.4082482904638634, 0.408248290463863, 0.0],
    [0.0, 0.0, 0.1747866975480809, 0.0812611176717539, 0.0, 0.0,
     -0.3675398009862027, -0.307882213957909, -0.17478669754808135,
     0.3675398009862011, 0.0, 0.4826689115059883, -0.08126111767175039,
     0.30788221395790305, -0.48266891150598584, 0.0],
    [0.0, 0.0, -0.21105601049335784, 0.18567180916109802, 0.0, 0.0,
     0.49215859013738733, -0.38525013709251915, 0.21105601049335806,
     -0.49215859013738905, 0.0, 0.17419412659916217, -0.18567180916109904,
     0.3852501370925211, -0.1741941265991621, 0.0],
    [0.0, 0.0, -0.14266084808807264, -0.3416446842253372, 0.0,
     0.7367497537172237, 0.24627107722075148, -0.08574019035519306,
     -0.14266084808807344, 0.24627107722075137, 0.14883399227113567,
     -0.04768680350229251, -0.3416446842253373, -0.08574019035519267,
     -0.047686803502292804, -0.14266084808807242],
    [0.0, 0.0, -0.13813540350758585, 0.3302282550303788, 0.0,
     0.08755115000587084, -0.07946706605909573, -0.4613374887461511,
     -0.13813540350758294, -0.07946706605910261, 0.49724647109535086,
     0.12538059448563663, 0.3302282550303805, -0.4613374887461554,
     0.12538059448564315, -0.13813540350758452],
    [0.0, 0.0, -0.17437602599651067, 0.0702790691196284, 0.0,
     -0.2921026642334881, 0.3623817333531167, 0.0, -0.1743760259965108,
     0.36238173335311646, 0.29210266423348785, -0.4326608024727445,
     0.07027906911962818, 0.0, -0.4326608024727457, 0.34875205199302267],
    [0.0, 0.0, 0.11354987314994337, -0.07417504595810355, 0.0,
     0.19402893032594343, -0.435190496523228, 0.21918684838857466,
     0.11354987314994257, -0.4351904965232251, 0.5550443808910661,
     -0.25468277124066463, -0.07417504595810233, 0.2191868483885728,
     -0.25468277124066413, 0.1135498731499429],
], dtype=np.float32)


@functools.lru_cache(maxsize=None)
def scale_f_map(bh: int, bw: int) -> np.ndarray:
    """[bh, bw] map of scale_f(y, 5-log2 bh) * scale_f(x, 5-log2 bw)."""
    logbh = bh.bit_length() - 1
    logbw = bw.bit_length() - 1
    sy = SCALE_F[np.arange(bh) << (5 - logbh)]
    sx = SCALE_F[np.arange(bw) << (5 - logbw)]
    return (sy[:, None] * sx[None, :]).astype(np.float32)


def _idct2d(jnp, coeffs, h, w):
    b_h = jnp.asarray(dct_basis_inverse(h))
    b_w = jnp.asarray(dct_basis_inverse(w))
    return jnp.einsum("yk,nkl,xl->nyx", b_h, coeffs, b_w,
                      preferred_element_type=jnp.float32)


def _fwd2d(jnp, blocks, h, w):
    a_h = jnp.asarray(dct_basis_forward(h))
    a_w = jnp.asarray(dct_basis_forward(w))
    return jnp.einsum("ky,nyx,lx->nkl", a_h, blocks, a_w,
                      preferred_element_type=jnp.float32)


def _aux_idct2(jnp, c, size):
    """aux_idct2_in_place<SIZE> on the top-left size x size region of
    [n, 8, 8] blocks (transform.rs:26-49)."""
    n2 = size // 2
    a = c[:, :n2, :n2]
    b = c[:, :n2, n2:size]
    d = c[:, n2:size, :n2]
    e = c[:, n2:size, n2:size]
    t00 = a + b + d + e
    t01 = a + b - d - e
    t10 = a - b + d - e
    t11 = a - b - d + e
    # interleave into [n, size, size]: out[2y+ry, 2x+rx]
    quad = jnp.stack(
        [jnp.stack([t00, t01], axis=-1), jnp.stack([t10, t11], axis=-1)],
        axis=-3,
    )  # [n, n2, 2, n2, 2]
    block = quad.transpose(0, 1, 2, 3, 4).reshape(c.shape[0], size, size)
    if size == 8:
        return block
    return c.at[:, :size, :size].set(block)


def _inv_dct2(jnp, c):
    c = _aux_idct2(jnp, c, 2)
    c = _aux_idct2(jnp, c, 4)
    return _aux_idct2(jnp, c, 8)


def _inv_dct4(jnp, c):
    c = _aux_idct2(jnp, c, 2)
    out = jnp.zeros_like(c)
    for qy in range(2):
        for qx in range(2):
            t = c[:, qy::2, qx::2]  # [n, 4, 4]
            s = jnp.swapaxes(_idct2d(jnp, t, 4, 4), 1, 2)
            out = out.at[:, qy * 4 : qy * 4 + 4, qx * 4 : qx * 4 + 4].set(s)
    return out


def _inv_hornuss(jnp, c):
    c = _aux_idct2(jnp, c, 2)
    out = jnp.zeros_like(c)
    for qy in range(2):
        for qx in range(2):
            t = c[:, qy::2, qx::2]  # [n, 4, 4]
            residual_sum = jnp.sum(t, axis=(1, 2)) - t[:, 0, 0]
            avg = t[:, 0, 0] - residual_sum / 16.0
            t = t.at[:, 0, 0].set(t[:, 1, 1])
            t = t.at[:, 1, 1].set(0.0)
            t = t + avg[:, None, None]
            out = out.at[:, qy * 4 : qy * 4 + 4, qx * 4 : qx * 4 + 4].set(t)
    return out


def _inv_dct4x8(jnp, c, transpose):
    c0 = c[:, 0, 0]
    c1 = c[:, 1, 0]
    c = c.at[:, 0, 0].set(c0 + c1)
    c = c.at[:, 1, 0].set(c0 - c1)
    halves = []
    for idx in range(2):
        s = c[:, idx::2, :]  # [n, 4, 8]
        halves.append(_idct2d(jnp, s, 4, 8))
    m = jnp.concatenate(halves, axis=1)  # [n, 8, 8]
    if transpose:
        m = jnp.swapaxes(m, 1, 2)
    return m


def _inv_afv(jnp, c, variant):
    flip_x = variant % 2
    flip_y = variant // 2
    n = c.shape[0]

    coeff_afv = c[:, ::2, ::2].reshape(n, 16)  # [iy*4+ix] = C[2iy, 2ix]
    afv0 = (c[:, 0, 0] + c[:, 0, 1] + c[:, 1, 0]) * 4.0
    coeff_afv = coeff_afv.at[:, 0].set(afv0)
    basis = jnp.asarray(AFV_BASIS)
    samples = jnp.dot(coeff_afv, basis, preferred_element_type=jnp.float32)
    samples = samples.reshape(n, 4, 4)  # [afv_y, afv_x]
    if flip_y:
        samples = samples[:, ::-1, :]
    if flip_x:
        samples = samples[:, :, ::-1]

    # scratch_4x4[ix, iy] = C[2iy, 2ix+1]; [0,0] = C00 - C01 + C10
    u = c[:, ::2, 1::2]  # [n, iy, ix]
    s44 = jnp.swapaxes(u, 1, 2)
    s44 = s44.at[:, 0, 0].set(c[:, 0, 0] - c[:, 0, 1] + c[:, 1, 0])
    s44 = _idct2d(jnp, s44, 4, 4)

    # scratch_4x8[iy, ix] = C[2iy+1, ix]; [0,0] = C00 - C10
    s48 = c[:, 1::2, :]
    s48 = s48.at[:, 0, 0].set(c[:, 0, 0] - c[:, 1, 0])
    s48 = _idct2d(jnp, s48, 4, 8)

    out = jnp.zeros_like(c)
    ys, xs = flip_y * 4, flip_x * 4
    out = out.at[:, ys : ys + 4, xs : xs + 4].set(samples)
    x44 = (1 - flip_x) * 4
    out = out.at[:, ys : ys + 4, x44 : x44 + 4].set(s44)
    y48 = (1 - flip_y) * 4
    out = out.at[:, y48 : y48 + 4, :].set(s48)
    return out


@functools.lru_cache(maxsize=None)
def special_lowrank_factors(dct_select: int, max_rank: int = 12):
    """Kronecker low-rank factorization of a non-separable 8x8 special
    transform: the 64x64 linear map M (probed by impulses through
    inverse_varblock_batch, with the LF/DC substitution folded into the
    (0, 0) input slot) decomposes as M = sum_i V_i (x) H_i. Each term
    applies as a width-in-lanes separable pass over the dense plane
    (~0.018 ms/term at 1024^2 vs 0.83 ms for the batched-tile layout),
    so any type with Kronecker rank <= max_rank runs flat: DCT4x8 is
    rank 2, Hornuss 9, DCT2 10; DCT4/AFV are rank 18-19 (see max_rank
    at the call site); DCT8x4 is a per-tile-transposing map (rank 64)
    and stays on the tiled path.

    Returns (V [r, 8, 8], H [r, 8, 8]) float32, or None.
    """
    import jax

    coeffs = np.zeros((64, 8, 8), dtype=np.float32)
    lf = np.zeros((64, 1, 1), dtype=np.float32)
    lf[0, 0, 0] = 1.0
    for k in range(1, 64):
        coeffs[k, k // 8, k % 8] = 1.0
    with jax.ensure_compile_time_eval():
        out = np.asarray(inverse_varblock_batch(coeffs, lf, dct_select))
    m = out.reshape(64, 64).T.astype(np.float64)   # [(y,x), (j,l)]
    k2 = m.reshape(8, 8, 8, 8).transpose(0, 2, 1, 3).reshape(64, 64)
    u, s, vt = np.linalg.svd(k2)
    rank = int((s > s[0] * 1e-6).sum())
    if rank > max_rank:
        return None
    sq = np.sqrt(s[:rank])
    v = (u[:, :rank] * sq).T.reshape(rank, 8, 8).astype(np.float32)
    h = (vt[:rank] * sq[:, None]).reshape(rank, 8, 8).astype(np.float32)
    return v, h


def inverse_varblock_batch(coeffs, lf, dct_select: int):
    """Inverse transform for a batch of varblocks of one type.

    coeffs: [n, H, W] dequantized (+CfL) coefficients, H = bh*8, W = bw*8.
    lf:     [n, bh, bw] LF (DC) samples for the covered blocks.
    Returns [n, H, W] pixel samples.

    Follows transform_varblocks_inner (transform_common.rs:11-77): size-1
    types take the LF value as DC directly; multi-block types embed the
    forward-DCT of the LF tile (scaled by 1/scale_f) into the low corner,
    then the whole region is inverse-transformed.
    """
    import jax.numpy as jnp

    from ..models.vardct import TransformType as T

    coeffs = jnp.asarray(coeffs)
    lf = jnp.asarray(lf)
    bw, bh = T.SELECT_SIZE[dct_select]
    if (bw, bh) == (1, 1):
        c = coeffs.at[:, 0, 0].set(lf[:, 0, 0])
        if dct_select == T.DCT8:
            return _idct2d(jnp, c, 8, 8)
        if dct_select == T.HORNUSS:
            return _inv_hornuss(jnp, c)
        if dct_select == T.DCT2:
            return _inv_dct2(jnp, c)
        if dct_select == T.DCT4:
            return _inv_dct4(jnp, c)
        if dct_select == T.DCT4X8:
            return _inv_dct4x8(jnp, c, transpose=False)
        if dct_select == T.DCT8X4:
            return _inv_dct4x8(jnp, c, transpose=True)
        if T.AFV0 <= dct_select <= T.AFV3:
            return _inv_afv(jnp, c, dct_select - T.AFV0)
        raise AssertionError(dct_select)

    h, w = bh * 8, bw * 8
    lf_coeff = _fwd2d(jnp, lf, bh, bw) / jnp.asarray(scale_f_map(bh, bw))
    c = coeffs.at[:, :bh, :bw].set(lf_coeff)
    return _idct2d(jnp, c, h, w)
