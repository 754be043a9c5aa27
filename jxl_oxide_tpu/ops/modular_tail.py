"""Device (XLA) inverse modular transforms: RCT, palette, squeeze.

Behavioral parity: jxl-modular/src/transform/{rct.rs:89-140,
palette.rs:27-173, squeeze.rs:55-150} — BIT-EXACT int32 twins of the
host implementations (models/modular_transform.py), expressed as jitted
XLA programs so lossless Modular frames can run their numeric tail on
the accelerator (SURVEY §7 Phase B; VERDICT r3 item 6).

Semantics notes:
  - all arithmetic wraps at i32 (jnp int32 ops wrap two's-complement,
    like the reference's Wrapping<i32>);
  - the squeeze x-recurrence is SEQUENTIAL along the squeezed axis
    (out[2x+1] feeds the tendency at x+1) and parallel across the other
    axis: expressed as lax.scan with row/column-vector carries. The VPU
    vectorizes the cross axis; a decode mesh shards it (rows for
    horizontal squeeze), each shard scanning independently;
  - tendency's truncating divisions are computed with the
    add-sign-bit-then-arithmetic-shift identity (exact trunc toward 0).

Selection (models/modular.py finish()): automatic — engages when a
locally-attached accelerator backs dispatch (utils.options
.local_accelerator) and a transformed plane carries >= 2^20 samples (a
scan-bound device squeeze only wins when the accelerator is local and
the cross axis is wide); JXL_TPU_DEVICE_MODULAR=1/0 overrides. On-chip
throughput: tools/measure_modular_device.py, bench.py
modular_device_mpps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "inv_rct_device",
    "inv_squeeze_h_device",
    "inv_squeeze_v_device",
    "palette_lookup_device",
]


def _trunc_div2(v):
    # trunc-toward-zero division by 2 on i32: add the sign bit, then
    # arithmetic shift (exact for every value incl. INT32_MIN)
    return (v + ((v >> 31) & 1)) >> 1


def _trunc_div_i32(v, d: int):
    """Exact trunc-toward-zero division of i32 by a positive constant,
    without i64 (jax_enable_x64 is off): floor-divide, then bump
    negative inexact quotients (valid for every i32 incl. INT32_MIN)."""
    q = v // d          # floor division
    r = v - q * d
    return q + jnp.where((v < 0) & (r != 0), 1, 0).astype(v.dtype)


def _tendency(a, b, c):
    """squeeze.rs tendency_i32 on i32 vectors (wrapping mul/add; the
    /12 divisions truncate toward zero, computed in i64)."""
    two_ab = 2 * (a - b)
    two_bc = 2 * (b - c)

    num1 = 4 * a - 3 * c - b + 6
    x1 = _trunc_div_i32(num1, 12)
    x1 = jnp.where((x1 - (x1 & 1)) > two_ab, two_ab + 1, x1)
    x1 = jnp.where((x1 + (x1 & 1)) > two_bc, two_bc, x1)

    num2 = 4 * a - 3 * c - b - 6
    x2 = _trunc_div_i32(num2, 12)
    x2 = jnp.where((x2 + (x2 & 1)) < two_ab, two_ab - 1, x2)
    x2 = jnp.where((x2 - (x2 & 1)) < two_bc, two_bc, x2)

    return jnp.where(
        (a >= b) & (b >= c), x1,
        jnp.where((a <= b) & (b <= c), x2, jnp.zeros_like(a)),
    )


@jax.jit
def _inv_squeeze_h_core(avg, residu, next_cols):
    """avg [h, aw] i32, residu [h, rw], next_cols [h, rw] (= avg[:, x+1]
    clamped); returns (firsts, seconds) each [h, rw]."""

    def step(left, xs):
        a, res, nxt = xs
        diff = res + _tendency(left, a, nxt)
        half = _trunc_div2(diff)
        first = a + half
        second = first - diff
        return second, (first, second)

    left0 = avg[:, 0]
    xs = (avg[:, : residu.shape[1]].T, residu.T, next_cols.T)
    _, (firsts, seconds) = jax.lax.scan(step, left0, xs)
    return firsts.T, seconds.T


def inv_squeeze_h_device(avg, residu):
    """Horizontal un-squeeze (squeeze.rs inverse_h): avg (w+1)//2 wide,
    residu w//2 wide -> [h, w] i32 device array."""
    avg = jnp.asarray(avg, dtype=jnp.int32)
    residu = jnp.asarray(residu, dtype=jnp.int32)
    h, aw = avg.shape
    rw = residu.shape[1]
    w = aw + rw
    if rw == 0:
        return avg
    if aw > rw:
        next_cols = avg[:, 1 : rw + 1]
    else:
        next_cols = jnp.concatenate(
            [avg[:, 1:rw], avg[:, rw - 1 : rw]], axis=1
        )
    firsts, seconds = _inv_squeeze_h_core(avg, residu, next_cols)
    out = jnp.stack([firsts, seconds], axis=2).reshape(h, 2 * rw)
    if w % 2 == 1:
        out = jnp.concatenate([out, avg[:, aw - 1 : aw]], axis=1)
    return out


def inv_squeeze_v_device(avg, residu):
    """Vertical un-squeeze: the horizontal recurrence on transposed
    planes (squeeze.rs inverse_v)."""
    return inv_squeeze_h_device(
        jnp.asarray(avg).T, jnp.asarray(residu).T
    ).T


@functools.partial(jax.jit, static_argnames=("rct_type",))
def inv_rct_device(a, b, c, rct_type: int):
    """Inverse RCT (transform/rct.rs:15-201): permutation(6) x kind(7),
    wrapping i32. Returns the 3 output planes in slot order."""
    perm, ty = rct_type // 7, rct_type % 7
    a = jnp.asarray(a, dtype=jnp.int32)
    bb = jnp.asarray(b, dtype=jnp.int32)
    c = jnp.asarray(c, dtype=jnp.int32)
    if ty == 6:  # YCoCg
        tmp = a - (c >> 1)
        e = c + tmp
        f = tmp - (bb >> 1)
        d = f + bb
    else:
        d = a
        f = c + a if (ty & 1) else c
        if (ty >> 1) == 1:
            e = bb + a
        elif (ty >> 1) == 2:
            e = bb + ((a + f) >> 1)
        else:
            e = bb
    out = [d, e, f]
    # inverse permutation (rct.rs inverse_permute; identical swap
    # sequence to the host models/modular_transform.py Rct.inverse)
    if perm == 1:
        out[0], out[1] = out[1], out[0]
        out[0], out[2] = out[2], out[0]
    elif perm == 2:
        out[0], out[1] = out[1], out[0]
        out[1], out[2] = out[2], out[1]
    elif perm == 3:
        out[1], out[2] = out[2], out[1]
    elif perm == 4:
        out[0], out[1] = out[1], out[0]
    elif perm == 5:
        out[0], out[2] = out[2], out[0]
    return out[0], out[1], out[2]


@functools.partial(
    jax.jit,
    static_argnames=("num_c", "nb_colours", "nb_deltas", "bit_depth"),
)
def palette_lookup_device(palette, index_grid, delta_palette,
                          num_c: int, nb_colours: int, nb_deltas: int,
                          bit_depth: int):
    """Inverse palette WITHOUT predictor-assisted deltas (d_pred == 0:
    the Zero predictor contributes nothing, so delta entries reduce to
    the plain delta-palette lookup): in-range gather + the synthetic
    small/large palettes + kDeltaPalette (transform/palette.rs:27-173).
    Returns num_c [h, w] i32 planes."""
    idx = jnp.asarray(index_grid, dtype=jnp.int32)
    palette = jnp.asarray(palette, dtype=jnp.int32)
    in_pal = (idx >= 0) & (idx < nb_colours)
    hi = idx >= nb_colours
    neg = idx < 0
    safe_idx = jnp.clip(idx, 0, max(nb_colours - 1, 0))
    outs = []
    for c in range(num_c):
        out = jnp.where(in_pal, palette[c][safe_idx], 0)
        # synthetic palettes for indices >= nb_colours. hidx < 2^31, so
        # for channel indices whose shift / power-of-5 exceeds the i32
        # range the quotient is statically zero (jax runs without x64)
        hidx = jnp.maximum(idx - nb_colours, 0)
        small = hidx < 64
        sh = 2 * c
        shifted = (hidx >> sh) if sh <= 30 else jnp.zeros_like(hidx)
        # multiply-then-divide grouping matches the host exactly; the
        # products stay inside i32 because the device envelope caps
        # bit_depth < 28 (models/modular.py _device_tail_supported)
        vs = (shifted % 4) * ((1 << bit_depth) - 1) // 4 + (
            1 << max(0, bit_depth - 3)
        )
        hb = jnp.maximum(hidx - 64, 0)
        p5 = 5 ** c
        if p5 < (1 << 31):
            vb = ((hb // p5) % 5) * ((1 << bit_depth) - 1) // 4
        else:
            vb = jnp.zeros_like(hb)
        out = jnp.where(
            hi, jnp.where(small, vs, vb).astype(jnp.int32), out
        )
        if c < 3:
            nidx = (-(idx + 1)) % 143
            v = delta_palette[((nidx + 1) >> 1), c].astype(jnp.int32)
            v = jnp.where(nidx & 1 == 0, -v, v)
            if bit_depth > 8:
                v = v << (min(bit_depth, 24) - 8)
            out = jnp.where(neg, v, out)
        else:
            out = jnp.where(neg, 0, out)
        outs.append(out)
    return tuple(outs)
