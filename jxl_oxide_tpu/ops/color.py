"""Color conversion kernels on device.

Behavioral parity: jxl-color/src/{xyb.rs,ycbcr.rs,tf*.rs,gamut.rs}. The
reference uses per-arch SIMD with fast powf approximations; on TPU the VPU
evaluates the exact spec formulas (sRGB/BT.709/PQ/HLG per their defining
standards), which is at least as accurate as the reference's rational-poly
approximations against float ground truth.

All functions take/return [.., H, W] float32 jax arrays (planar).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "xyb_to_mixed_lms",
    "apply_matrix3",
    "ycbcr_to_rgb",
    "linear_to_srgb",
    "srgb_to_linear",
    "linear_to_bt709",
    "bt709_to_linear",
    "apply_gamma",
    "linear_to_pq",
    "pq_to_linear",
    "hlg_to_linear",
    "linear_to_hlg",
    "hlg_inverse_oo",
    "hlg_oo",
    "gamut_map",
    "tone_map_rec2408",
]


def xyb_to_mixed_lms(x, y, b, opsin_bias, intensity_target: float):
    """XYB -> scaled linear mixed-LMS (xyb.rs:34-60). A following 3x3
    matrix (opsin inverse matrix) yields linear sRGB."""
    ob = np.asarray(opsin_bias, dtype=np.float32)
    cbrt_ob = np.cbrt(ob)
    itscale = np.float32(255.0 / intensity_target)
    g_l = y + x - cbrt_ob[0]
    g_m = y - x - cbrt_ob[1]
    g_s = b - cbrt_ob[2]
    out_l = (g_l * g_l * g_l + ob[0]) * itscale
    out_m = (g_m * g_m * g_m + ob[1]) * itscale
    out_s = (g_s * g_s * g_s + ob[2]) * itscale
    return out_l, out_m, out_s


def apply_matrix3(a, b, c, mat):
    """3x3 matrix applied across three planes (convert.rs Matrix op)."""
    m = np.asarray(mat, dtype=np.float32).reshape(3, 3)
    oa = m[0, 0] * a + m[0, 1] * b + m[0, 2] * c
    ob = m[1, 0] * a + m[1, 1] * b + m[1, 2] * c
    oc = m[2, 0] * a + m[2, 1] * b + m[2, 2] * c
    return oa, ob, oc


def _ycbcr_to_rgb_impl(cb, y, cr):
    yy = y + np.float32(128.0 / 255.0)
    r = cr * np.float32(1.402) + yy
    g = (
        cb * np.float32(-0.114 * 1.772 / 0.587)
        + cr * np.float32(-0.299 * 1.402 / 0.587)
        + yy
    )
    b = cb * np.float32(1.772) + yy
    return r, g, b


_YCBCR_JIT = None


def ycbcr_to_rgb(cb, y, cr):
    """BT.601 YCbCr -> RGB with +128/255 Y offset (ycbcr.rs:40-56).
    Device planes go through ONE jitted program (eight eager dispatches
    otherwise); numpy planes stay on host."""
    if not isinstance(y, np.ndarray):
        import jax

        if isinstance(y, jax.Array):
            global _YCBCR_JIT
            if _YCBCR_JIT is None:
                _YCBCR_JIT = jax.jit(_ycbcr_to_rgb_impl)
            return _YCBCR_JIT(cb, y, cr)
    return _ycbcr_to_rgb_impl(cb, y, cr)


def _signed_pow(v, f):
    """f(|v|) with v's sign (the reference's copysign convention)."""
    return jnp.sign(v) * f(jnp.abs(v))


def linear_to_srgb(v):
    def f(a):
        small = a * 12.92
        big = 1.055 * jnp.power(jnp.maximum(a, 1e-30), 1.0 / 2.4) - 0.055
        return jnp.where(a <= 0.0031308, small, big)

    return _signed_pow(v, f)


def srgb_to_linear(v):
    def f(a):
        small = a / 12.92
        big = jnp.power((a + 0.055) / 1.055, 2.4)
        return jnp.where(a <= 0.04045, small, big)

    return _signed_pow(v, f)


def linear_to_bt709(v):
    def f(a):
        small = a * 4.5
        big = 1.099 * jnp.power(jnp.maximum(a, 1e-30), 0.45) - 0.099
        return jnp.where(a <= 0.018, small, big)

    return _signed_pow(v, f)


def bt709_to_linear(v):
    def f(a):
        small = a / 4.5
        big = jnp.power((a + 0.099) / 1.099, 1.0 / 0.45)
        return jnp.where(a < 0.081, small, big)

    return _signed_pow(v, f)


def apply_gamma(v, gamma: float):
    """v^gamma with sign preservation; ~0 below 1e-7 (tf.rs:11-98)."""
    def f(a):
        return jnp.where(a <= 1e-7, 0.0, jnp.power(jnp.maximum(a, 1e-30), gamma))

    return _signed_pow(v, f)


# SMPTE ST.2084 (PQ) exact constants
_PQ_M1 = 2610.0 / 16384.0
_PQ_M2 = 2523.0 / 4096.0 * 128.0
_PQ_C1 = 3424.0 / 4096.0
_PQ_C2 = 2413.0 / 4096.0 * 32.0
_PQ_C3 = 2392.0 / 4096.0 * 32.0


def linear_to_pq(v, intensity_target: float):
    y_mult = np.float32(intensity_target / 10000.0)

    def f(a):
        a = a * y_mult
        am1 = jnp.power(jnp.maximum(a, 1e-30), _PQ_M1)
        return jnp.power((_PQ_C1 + _PQ_C2 * am1) / (1.0 + _PQ_C3 * am1), _PQ_M2)

    return _signed_pow(v, f)


def pq_to_linear(v, intensity_target: float):
    y_mult = np.float32(10000.0 / intensity_target)

    def f(a):
        am = jnp.power(jnp.maximum(a, 1e-30), 1.0 / _PQ_M2)
        num = jnp.maximum(am - _PQ_C1, 0.0)
        den = _PQ_C2 - _PQ_C3 * am
        return jnp.power(num / den, 1.0 / _PQ_M1) * y_mult

    return _signed_pow(v, f)


# BT.2100 HLG constants
_HLG_A = 0.17883277
_HLG_B = 0.28466892
_HLG_C = 0.55991073


def hlg_to_linear(v):
    """HLG inverse OETF (scene-linear, [0,1] domain)."""
    def f(a):
        small = a * a / 3.0
        big = (jnp.exp((a - _HLG_C) / _HLG_A) + _HLG_B) / 12.0
        return jnp.where(a <= 0.5, small, big)

    return _signed_pow(v, f)


def linear_to_hlg(v):
    def f(a):
        small = jnp.sqrt(3.0 * a)
        big = _HLG_A * jnp.log(jnp.maximum(12.0 * a - _HLG_B, 1e-30)) + _HLG_C
        return jnp.where(a <= 1.0 / 12.0, small, big)

    return _signed_pow(v, f)


def hlg_inverse_oo(r, g, b, luminances, intensity_target: float):
    """HLG inverse OOTF: display-linear -> scene-linear (tf.rs:121-148)."""
    lr, lg, lb = [np.float32(x) for x in luminances]
    gamma = 1.2 * 1.111 ** np.log2(intensity_target / 1000.0)
    y = r * lr + g * lg + b * lb
    mult = jnp.power(jnp.maximum(y, 1e-30), (1.0 - gamma) / gamma)
    return r * mult, g * mult, b * mult


def hlg_oo(r, g, b, luminances, intensity_target: float):
    """HLG forward OOTF: scene-linear -> display-linear (tf.rs:150-172)."""
    lr, lg, lb = [np.float32(x) for x in luminances]
    gamma = 1.2 * 1.111 ** np.log2(intensity_target / 1000.0)
    y = r * lr + g * lg + b * lb
    mult = jnp.power(jnp.maximum(y, 1e-30), gamma - 1.0)
    return r * mult, g * mult, b * mult


def gamut_map(r, g, b, luminances, saturation_factor: float):
    """Soft gamut mapping toward the luminance axis (gamut.rs). Desaturates
    out-of-gamut colors while preserving luminance, then clips."""
    lr, lg, lb = [np.float32(x) for x in luminances]
    y = r * lr + g * lg + b * lb
    # max factor t in [0,1] such that y + t*(v-y) stays in [0,1] per channel
    def limit(v):
        d = v - y
        t_hi = jnp.where(d > 1e-9, (1.0 - y) / jnp.maximum(d, 1e-9), 1.0)
        t_lo = jnp.where(d < -1e-9, (0.0 - y) / jnp.minimum(d, -1e-9), 1.0)
        return jnp.minimum(jnp.minimum(t_hi, t_lo), 1.0)

    t = jnp.minimum(jnp.minimum(limit(r), limit(g)), limit(b))
    t = jnp.clip(t * (1.0 + saturation_factor) , 0.0, 1.0)
    rr = y + (r - y) * t
    gg = y + (g - y) * t
    bb = y + (b - y) * t
    return (jnp.clip(rr, 0.0, 1.0), jnp.clip(gg, 0.0, 1.0),
            jnp.clip(bb, 0.0, 1.0))


def _linear_to_pq_scalar(v: float, intensity_target: float) -> float:
    """Host-side scalar PQ OETF (usable inside jit traces)."""
    a = abs(v) * (intensity_target / 10000.0)
    am1 = max(a, 1e-30) ** _PQ_M1
    e = ((_PQ_C1 + _PQ_C2 * am1) / (1.0 + _PQ_C3 * am1)) ** _PQ_M2
    return float(np.copysign(e, v))


def _rec2408_eetf(y_pq, intensity_target: float, from_range, to_range):
    """BT.2408 EETF on PQ-encoded luminance (tf/rec2408.rs:4-53)."""
    lums = [
        from_range[0] / intensity_target,
        from_range[1] / intensity_target,
        to_range[0] / intensity_target,
        to_range[1] / intensity_target,
    ]
    lums = [_linear_to_pq_scalar(np.float32(v), intensity_target)
            for v in lums]
    diff = lums[1] - lums[0]
    norm = (y_pq - lums[0]) / diff
    min_lum = (lums[2] - lums[0]) / diff
    max_lum = (lums[3] - lums[0]) / diff
    ks = 1.5 * max_lum - 0.5
    one_sub_ks = 1.0 - ks
    t = (norm - ks) / one_sub_ks
    t2 = t * t
    t3 = t2 * t
    spline = (
        (2.0 * t3 - 3.0 * t2 + 1.0) * ks
        + (t3 - 2.0 * t2 + t) * one_sub_ks
        + (-2.0 * t3 + 3.0 * t2) * max_lum
    )
    compressed = jnp.where(norm < ks, norm, spline)
    x = 1.0 - compressed
    mapped = (x * x * x * x) * min_lum + compressed
    return mapped * diff + lums[0]


def tone_map_rec2408(r, g, b, luminances, intensity_target: float,
                     min_nits: float, target_display_luminance: float,
                     detect_peak: bool = False):
    """HDR->SDR luminance tone mapping (convert/tone_map.rs:9-211)."""
    lr, lg, lb = [np.float32(v) for v in luminances]
    y = r * lr + g * lg + b * lb
    if detect_peak:
        peak = float(jnp.max(y)) * intensity_target
        peak_luminance = min(intensity_target, max(peak, 1.0))
    else:
        peak_luminance = intensity_target
    from_range = (min_nits, peak_luminance)
    to_range = (0.0, target_display_luminance)
    scale = np.float32(intensity_target / target_display_luminance)
    y_pq = linear_to_pq(y, intensity_target)
    y_mapped = pq_to_linear(
        _rec2408_eetf(y_pq, intensity_target, from_range, to_range),
        intensity_target,
    )
    ratio = jnp.where(
        jnp.abs(y) <= 1e-7, y_mapped * scale,
        y_mapped / jnp.where(y == 0, 1.0, y) * scale,
    )
    return r * ratio, g * ratio, b * ratio
