"""Feature rendering tests: splines, noise synthesis, patch blending."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from jxl_oxide_tpu.render.features import (
    NoiseParameters,
    PatchBlendMode,
    QuantSpline,
    Splines,
    _erf,
    _noise_field,
    _xorshift_batches,
    render_noise,
    render_spline,
)


def test_erf_accuracy():
    import math

    xs = np.linspace(-3, 3, 61)
    got = _erf(xs)
    exact = np.array([math.erf(v) for v in xs])
    assert np.abs(got - exact).max() < 7e-4


def test_xorshift_matches_scalar():
    """Vectorized 8-lane XorShift128+ vs a direct scalar transcription of
    the generator definition (noise.rs:403-452)."""
    M = (1 << 64) - 1

    def split_mix(z):
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
        return z ^ (z >> 31)

    seed0, seed1 = 12345, 67890
    s0 = [0] * 8
    s1 = [0] * 8
    s0[0] = split_mix((seed0 + 0x9E3779B97F4A7C15) & M)
    s1[0] = split_mix((seed1 + 0x9E3779B97F4A7C15) & M)
    for i in range(1, 8):
        s0[i] = split_mix(s0[i - 1])
        s1[i] = split_mix(s1[i - 1])

    expected = []
    for _ in range(3):
        batch = []
        for i in range(8):
            t1, t0 = s0[i], s1[i]
            ret = (t1 + t0) & M
            s0[i] = t0
            t1 = (t1 ^ (t1 << 23)) & M
            s1[i] = t1 ^ (t0 ^ (t1 >> 18) ^ (t0 >> 5))
            batch.append(ret)
        for v in batch:
            expected.append(v & 0xFFFFFFFF)
            expected.append(v >> 32)

    got = _xorshift_batches(seed0, seed1, 3).reshape(-1)
    np.testing.assert_array_equal(got, np.array(expected, dtype=np.uint64))


class _FakeHeader:
    width = 40
    height = 24
    group_dim = 256


def test_noise_field_deterministic():
    f1 = _noise_field(_FakeHeader, 1, 0)
    f2 = _noise_field(_FakeHeader, 1, 0)
    np.testing.assert_array_equal(f1, f2)
    f3 = _noise_field(_FakeHeader, 2, 0)
    assert not np.array_equal(f1, f3)
    assert f1.shape == (3, 24, 40)
    assert 1.0 <= f1.min() and f1.max() < 2.0


def test_render_noise_adds_variance():
    planes = [np.full((24, 40), 0.5, dtype=np.float32) for _ in range(3)]
    lut = (1.0,) * 8
    render_noise(planes, _FakeHeader, 1, 0, None, lut)
    assert planes[1].std() > 0.001
    # deterministic
    planes2 = [np.full((24, 40), 0.5, dtype=np.float32) for _ in range(3)]
    render_noise(planes2, _FakeHeader, 1, 0, None, lut)
    np.testing.assert_array_equal(planes[1], planes2[1])


def test_render_spline_draws_blob():
    # single-point spline with constant DC color and sigma
    xyb = np.zeros((3, 32), dtype=np.int64)
    xyb[1, 0] = 100  # y channel DC
    sigma = np.zeros(32, dtype=np.int64)
    sigma[0] = 10
    qs = QuantSpline([(16, 16)], xyb, sigma)
    splines = Splines([qs], quant_adjust=0)
    planes = [np.zeros((32, 32), dtype=np.float32) for _ in range(3)]
    render_spline(planes, splines, None, 32, 32)
    y = planes[1]
    assert y.max() > 0.0
    # peak near the control point
    py, px = np.unravel_index(np.argmax(y), y.shape)
    assert abs(py - 16) <= 1 and abs(px - 16) <= 1
    # b channel gets base_correlation_b=1.0 contribution
    assert planes[2].max() > 0.0
    assert planes[0].max() == pytest.approx(0.0, abs=1e-6)


def test_reference_only_frame_and_patch_replace():
    """ReferenceOnly frame saved to a slot, patched into the visible frame
    with Replace mode (data/patch.rs + blend.rs patch machinery)."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    rng = np.random.default_rng(3)
    base = [rng.integers(0, 256, (32, 32), dtype=np.int64) for _ in range(3)]
    ref = [rng.integers(0, 256, (32, 32), dtype=np.int64) for _ in range(3)]
    spec = dict(ref_idx=0, x0=2, y0=4, width=10, height=8, x=6, y=5, mode=1)
    data = encode_jxl_modular(base, bit_depth=8, reference_patch=(ref, spec))
    img = JxlImage.from_bytes(data)
    assert img.num_frames == 2 and img.num_keyframes == 1
    out = img.render_frame(0).to_u8()
    want = np.stack([c.astype(np.uint8) for c in base], -1).copy()
    want[5:13, 6:16] = np.stack(
        [c.astype(np.uint8) for c in ref], -1
    )[4:12, 2:12]
    np.testing.assert_array_equal(out, want)


def test_patch_add_mode():
    """Patch blend mode Add: ref samples add onto the frame."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    rng = np.random.default_rng(4)
    base = [rng.integers(0, 100, (24, 24), dtype=np.int64) for _ in range(3)]
    ref = [rng.integers(0, 100, (24, 24), dtype=np.int64) for _ in range(3)]
    spec = dict(ref_idx=0, x0=0, y0=0, width=8, height=8, x=4, y=4, mode=2)
    data = encode_jxl_modular(base, bit_depth=8, reference_patch=(ref, spec))
    out = JxlImage.from_bytes(data).render_frame(0).to_u8()
    want = np.stack([c.astype(np.float32) / 255.0 for c in base], -1)
    want[4:12, 4:12] += np.stack(
        [c.astype(np.float32) / 255.0 for c in ref], -1
    )[:8, :8]
    want = np.clip(np.round(want * 255), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, want)


def test_noise_flag_end_to_end():
    """Noise flag + LUT through the bitstream (data/noise.rs): zero LUT is
    a no-op; nonzero LUT perturbs pixels deterministically."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    rng = np.random.default_rng(5)
    base = [rng.integers(60, 200, (32, 32), dtype=np.int64) for _ in range(3)]
    clean = np.stack([c.astype(np.uint8) for c in base], -1)

    data0 = encode_jxl_modular(base, bit_depth=8, noise_lut=[0.0] * 8)
    out0 = JxlImage.from_bytes(data0).render_frame(0).to_u8()
    np.testing.assert_array_equal(out0, clean)

    lut = [0.3] * 8
    data1 = encode_jxl_modular(base, bit_depth=8, noise_lut=lut)
    out1 = JxlImage.from_bytes(data1).render_frame(0).to_u8()
    assert not np.array_equal(out1, clean)
    out2 = JxlImage.from_bytes(data1).render_frame(0).to_u8()
    np.testing.assert_array_equal(out1, out2)


def test_splines_end_to_end():
    """Spline through the bitstream (data/spline.rs): decoded render equals
    base + render_spline of the same quantized spline."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.render.features import (
        QuantSpline, Splines, render_spline,
    )

    h = w = 48
    base = [np.full((h, w), 128, dtype=np.int64) for _ in range(3)]
    xyb_dct = np.zeros((3, 32), dtype=np.int64)
    xyb_dct[:, 0] = [50, 80, 60]
    sigma_dct = np.zeros(32, dtype=np.int64)
    sigma_dct[0] = 40
    spec = dict(
        points=[(10, 12), (30, 18), (38, 34)],
        xyb_dct=xyb_dct,
        sigma_dct=sigma_dct,
    )
    data = encode_jxl_modular(base, bit_depth=8,
                              splines_spec=([spec], 0))
    out = JxlImage.from_bytes(data).render_frame(0).to_u8()

    planes = [c.astype(np.float32) / 255.0 for c in base]
    sp = Splines([QuantSpline(spec["points"], xyb_dct, sigma_dct)], 0)
    render_spline(planes, sp, None, w, h)
    want = np.clip(
        np.round(np.stack(planes, -1) * 255), 0, 255
    ).astype(np.uint8)
    np.testing.assert_array_equal(out, want)


def test_spline_estimated_area_limit():
    """Level-10 conformance guard (jxl-frame/src/data/lf_global.rs:133-146):
    a crafted stream whose splines request unbounded rasterization work is
    rejected at LfGlobal parse time, before any rendering."""
    import pytest
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.utils.errors import JxlValidationError

    h = w = 48
    base = [np.full((h, w), 128, dtype=np.int64) for _ in range(3)]
    xyb_dct = np.zeros((3, 32), dtype=np.int64)
    xyb_dct[:, 0] = [50, 80, 60]
    # large sigma coefficients: weight ~ 10^3 per entry, squared, summed
    # over 32 entries and scaled by log_color * manhattan -> estimated
    # area ~2e10, far beyond min(2^42, 1024*48*48 + 2^32) ~ 4.3e9
    sigma_dct = np.full(32, 1000, dtype=np.int64)
    spec = dict(
        points=[(2, 2), (40, 40)],
        xyb_dct=xyb_dct,
        sigma_dct=sigma_dct,
    )
    data = encode_jxl_modular(base, bit_depth=8,
                              splines_spec=([spec], 0))
    with pytest.raises(JxlValidationError, match="estimated area"):
        JxlImage.from_bytes(data).render_frame(0)


def test_spline_estimate_area_values():
    """estimate_area mirrors the reference arithmetic
    (data/spline.rs:71-103) including the negative quant_adjust branch."""
    from jxl_oxide_tpu.render.features import QuantSpline, Splines

    xyb = np.zeros((3, 32), dtype=np.int64)
    xyb[0, 0] = 16
    sigma = np.zeros(32, dtype=np.int64)
    sigma[0] = 8
    qs = QuantSpline([(0, 0), (3, 4)], xyb, sigma, manhattan_distance=7)
    # qa = 0: div_ceil_qa(q) = ceil(8q/8) = q
    # color_xyb = [16, 0, 0]; log_color = ceil(log2(17)) = 5
    # weights: sigma[0] -> 1+8 = 9, others -> 1
    # width_estimate = 81*5 + 31*1*5 = 405 + 155 = 560; area = 560*7
    sp = Splines([qs], quant_adjust=0)
    assert sp.estimate_area(None) == 560 * 7
    # qa = -8: div_ceil_qa(q) = q + ceil(q*8/8) = 2q
    # color_xyb = [32,0,0]; log_color = ceil(log2(33)) = 6
    # weights: 1+16 = 17 -> 289*6; others 1*6 -> 31*6; total 2040; *7
    sp = Splines([qs], quant_adjust=-8)
    assert sp.estimate_area(None) == (289 * 6 + 31 * 6) * 7


def test_ec_upsampling_cumulative_limit():
    """Cumulative EC upsampling guard (jxl-frame/src/lib.rs:185-195):
    ec_upsampling_shift + dim_shift > 6 is rejected."""
    import pytest
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.utils.errors import JxlValidationError

    h = w = 256
    base = [np.full((h, w), 7, dtype=np.int64)]
    alpha = np.full((h >> 7, w >> 7), 255, dtype=np.int64)
    data = encode_jxl_modular(
        base + [alpha], bit_depth=8, grayscale=True,
        extra_alpha=True, alpha_dim_shift=7,
    )
    with pytest.raises(JxlValidationError, match="cumulative EC upsampling"):
        JxlImage.from_bytes(data).render_frame(0)
