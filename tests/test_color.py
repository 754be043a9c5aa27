"""Color pipeline tests: XYB inverse, transfer functions, matrices, YCbCr,
filters (gabor/EPF invariants)."""

import numpy as np
import pytest

from jxl_oxide_tpu.color.convert import (
    ColorTransform,
    PRIMARIES_SRGB,
    ILLUMINANT_D65,
    adapt_mat,
    primaries_to_xyz_mat,
    xyz_to_primaries_mat,
)
from jxl_oxide_tpu.headers.image import (
    ColourEncoding,
    ColourSpace,
    OpsinInverseMatrix,
    TransferFunction,
)
from jxl_oxide_tpu.ops import color as C


def test_srgb_tf_roundtrip():
    v = np.linspace(-0.2, 1.2, 101, dtype=np.float32)
    back = np.asarray(C.srgb_to_linear(C.linear_to_srgb(v)))
    np.testing.assert_allclose(back, v, atol=1e-5)


def test_bt709_tf_roundtrip():
    v = np.linspace(0.0, 1.0, 101, dtype=np.float32)
    back = np.asarray(C.bt709_to_linear(C.linear_to_bt709(v)))
    np.testing.assert_allclose(back, v, atol=1e-5)


def test_pq_tf_roundtrip():
    v = np.linspace(0.0, 1.0, 101, dtype=np.float32)
    back = np.asarray(C.pq_to_linear(C.linear_to_pq(v, 255.0), 255.0))
    np.testing.assert_allclose(back, v, atol=1e-4)


def test_hlg_tf_roundtrip():
    v = np.linspace(0.0, 1.0, 101, dtype=np.float32)
    back = np.asarray(C.hlg_to_linear(C.linear_to_hlg(v)))
    np.testing.assert_allclose(back, v, atol=1e-5)


def test_srgb_primaries_matrix():
    """sRGB RGB->XYZ matrix must match the well-known values."""
    mat = primaries_to_xyz_mat(PRIMARIES_SRGB, ILLUMINANT_D65)
    expected = np.array([
        [0.4124, 0.3576, 0.1805],
        [0.2126, 0.7152, 0.0722],
        [0.0193, 0.1192, 0.9505],
    ])
    np.testing.assert_allclose(mat, expected, atol=2e-3)
    # inverse consistency
    inv = xyz_to_primaries_mat(PRIMARIES_SRGB, ILLUMINANT_D65)
    np.testing.assert_allclose(inv @ mat, np.eye(3), atol=1e-6)


def test_adapt_mat_identity():
    np.testing.assert_allclose(
        adapt_mat(ILLUMINANT_D65, ILLUMINANT_D65), np.eye(3)
    )


def test_ycbcr_grey():
    """Cb=Cr=0, Y=v-128/255 must give R=G=B=v."""
    y = np.full((4, 4), 0.25, dtype=np.float32) - np.float32(128.0 / 255.0)
    z = np.zeros((4, 4), dtype=np.float32)
    r, g, b = C.ycbcr_to_rgb(z, y, z)
    np.testing.assert_allclose(np.asarray(r), 0.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), 0.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b), 0.25, atol=1e-6)


def test_xyb_neutral_grey():
    """XYB of neutral grey (x=0, b=y) maps to R=G=B in linear sRGB.

    Forward XYB: L=M=S-ish for grey; with x = (L-M)/2 = 0.  Uses the
    default opsin matrix (image.rs color.rs:613-627)."""
    oim = OpsinInverseMatrix()
    # forward opsin for grey value g: cbrt mix is equal across LMS
    g = 0.5
    bias = np.asarray(oim.opsin_bias, dtype=np.float64)
    # forward matrix is the inverse of inv_mat / 255-scaling at it=255
    inv = np.array(oim.inv_mat)
    fwd = np.linalg.inv(inv)
    lms = fwd @ np.array([g, g, g])
    mixed = np.cbrt(lms - bias) + np.cbrt(bias)
    x = (mixed[0] - mixed[1]) / 2
    y = (mixed[0] + mixed[1]) / 2
    b = mixed[2]
    xp = np.full((2, 2), x, dtype=np.float32)
    yp = np.full((2, 2), y, dtype=np.float32)
    bp = np.full((2, 2), b, dtype=np.float32)
    l, m, s = C.xyb_to_mixed_lms(xp, yp, bp, oim.opsin_bias, 255.0)
    r, gg, bb = C.apply_matrix3(l, m, s, inv)
    np.testing.assert_allclose(np.asarray(r), g, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg), g, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bb), g, atol=1e-4)


def test_color_transform_xyb_to_srgb_runs():
    src = ColourEncoding(colour_space=ColourSpace.XYB)
    dst = ColourEncoding()  # sRGB default
    tr = ColorTransform.build(src, dst, OpsinInverseMatrix())
    planes = [np.zeros((4, 4), dtype=np.float32) for _ in range(3)]
    out = tr.run(planes)
    assert len(out) == 3
    assert np.asarray(out[0]).shape == (4, 4)


def test_gabor_constant_preserved():
    from jxl_oxide_tpu.ops.filters import gabor

    p = np.full((16, 16), 0.7, dtype=np.float32)
    out = np.asarray(gabor(p, (0.115169525, 0.061248592)))
    np.testing.assert_allclose(out, 0.7, atol=1e-6)


def test_epf_constant_preserved():
    from jxl_oxide_tpu.headers.frame import EpfParams
    from jxl_oxide_tpu.ops.filters import apply_epf

    planes = [np.full((16, 16), v, dtype=np.float32) for v in (0.2, 0.5, 0.8)]
    sigma = np.full((16, 16), 1.0, dtype=np.float32)
    out = np.asarray(apply_epf(planes, sigma, EpfParams(iters=3)))
    for c, v in enumerate((0.2, 0.5, 0.8)):
        np.testing.assert_allclose(out[c], v, atol=1e-5)


def test_epf_smooths_noise():
    from jxl_oxide_tpu.headers.frame import EpfParams
    from jxl_oxide_tpu.ops.filters import apply_epf

    rng = np.random.default_rng(0)
    base = np.full((32, 32), 0.5, dtype=np.float32)
    noisy = base + rng.normal(0, 0.001, (32, 32)).astype(np.float32)
    planes = [noisy, noisy.copy(), noisy.copy()]
    sigma = np.full((32, 32), 8.0, dtype=np.float32)
    out = np.asarray(apply_epf(planes, sigma, EpfParams(iters=2)))
    assert out[0].std() < noisy.std() * 0.8


def test_epf_sigma_below_threshold_is_identity():
    from jxl_oxide_tpu.headers.frame import EpfParams
    from jxl_oxide_tpu.ops.filters import apply_epf

    rng = np.random.default_rng(1)
    planes = [rng.random((16, 16)).astype(np.float32) for _ in range(3)]
    sigma = np.full((16, 16), 0.1, dtype=np.float32)  # < 0.3
    out = np.asarray(apply_epf(planes, sigma, EpfParams(iters=3)))
    for c in range(3):
        np.testing.assert_allclose(out[c], planes[c], atol=1e-7)


def test_pallas_epf_matches_jnp():
    """The Pallas EPF kernel (interpret mode on CPU) must match the jnp
    whole-plane formulation for every step."""
    from jxl_oxide_tpu.ops.filters import epf_step
    from jxl_oxide_tpu.ops.pallas.epf import epf_step_pallas

    rng = np.random.default_rng(7)
    planes = rng.random((3, 150, 40)).astype(np.float32)  # multi-tile strips
    sigma = (rng.random((150, 40)).astype(np.float32) * 4.0) + 0.05
    cs = (40.0, 5.0, 3.5)
    for step, mult in ((0, 0.9), (1, 1.0), (2, 6.5)):
        ref = np.asarray(epf_step(planes, sigma, step, cs, mult, 2.0 / 3.0))
        got = np.asarray(
            epf_step_pallas(planes, sigma, step, cs, mult, 2.0 / 3.0,
                            interpret=True)
        )
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=f"step {step}")


def test_icc_synthesis_valid_profiles():
    """Synthesized ICC profiles must load in Little CMS and describe the
    right device space / transfer curve (synthesize.rs parity via lcms)."""
    import io

    from PIL import ImageCms

    from jxl_oxide_tpu.color.synthesize import colour_encoding_to_icc
    from jxl_oxide_tpu.headers.image import (
        ColourEncoding as CE,
        ColourSpace as CS,
        Primaries,
        TransferFunction as TF,
        WhitePoint,
    )

    # sRGB default
    icc = colour_encoding_to_icc(CE())
    prof = ImageCms.ImageCmsProfile(io.BytesIO(icc))
    assert prof.profile.xcolor_space.strip() == "RGB"

    # sRGB profile must behave like lcms' builtin sRGB: converting through
    # it to builtin sRGB is ~identity
    srgb = ImageCms.ImageCmsProfile(ImageCms.createProfile("sRGB"))
    t = ImageCms.buildTransform(prof, srgb, "RGB", "RGB")
    from PIL import Image

    ramp = np.tile(np.arange(256, dtype=np.uint8)[None, :, None], (4, 1, 3))
    img = Image.fromarray(ramp, "RGB")
    out = np.asarray(ImageCms.applyTransform(img, t))
    assert np.abs(out.astype(int) - ramp.astype(int)).max() <= 2

    # grayscale + gamma
    grey = CE(colour_space=CS.GREY,
              tf=TF("gamma", gamma=4545455, gamma_inverted=True))
    icc_g = colour_encoding_to_icc(grey)
    prof_g = ImageCms.ImageCmsProfile(io.BytesIO(icc_g))
    assert prof_g.profile.xcolor_space.strip() == "GRAY"

    # PQ / BT.2100 with cicp tag
    pq = CE(primaries=Primaries("bt2100"), tf=TF("pq"))
    icc_pq = colour_encoding_to_icc(pq)
    assert b"cicp" in icc_pq
    ImageCms.ImageCmsProfile(io.BytesIO(icc_pq))


def test_tone_map_rec2408():
    """HDR (4000-nit) content tone-mapped to SDR: in-range highlights keep
    relative structure, peaks compress into [0, 1]."""
    from jxl_oxide_tpu.ops.color import tone_map_rec2408

    lum = (0.2126, 0.7152, 0.0722)
    it = 4000.0
    # linear values relative to intensity_target: 1.0 = 4000 nits
    r = np.array([[0.001, 0.05, 0.5, 1.0]], dtype=np.float32)
    g = r.copy()
    b = r.copy()
    rr, gg, bb = tone_map_rec2408(r, g, b, lum, it, 0.0, 255.0)
    out = np.asarray(rr)[0]
    # scaled into display range: monotonic, bright end compressed
    assert np.all(np.diff(out) > 0)
    assert out[-1] <= 1.05
    # dark values are scaled roughly linearly by it/255
    assert out[0] == pytest.approx(0.001 * 4000 / 255, rel=0.3)


def test_xyb_hdr_transform_builds():
    from jxl_oxide_tpu.color.convert import ColorTransform
    from jxl_oxide_tpu.headers.image import (
        ColourEncoding, ColourSpace, OpsinInverseMatrix, ToneMapping,
    )

    src = ColourEncoding(colour_space=ColourSpace.XYB)
    dst = ColourEncoding()
    tm = ToneMapping(intensity_target=4000.0)
    tr = ColorTransform.build(src, dst, OpsinInverseMatrix(), tm)
    assert any(op.kind == "tone_map" for op in tr.ops)
    planes = [np.full((4, 4), 0.1, dtype=np.float32) for _ in range(3)]
    out = tr.run(planes)
    assert np.isfinite(np.asarray(out[0])).all()


def test_hlg_ootf_roundtrip():
    from jxl_oxide_tpu.ops.color import hlg_inverse_oo, hlg_oo

    lum = (0.2627, 0.6780, 0.0593)
    rng = np.random.default_rng(0)
    r, g, b = (rng.uniform(0.01, 1.0, (8, 8)).astype(np.float32)
               for _ in range(3))
    rr, gg, bb = hlg_oo(*hlg_inverse_oo(r, g, b, lum, 1000.0), lum, 1000.0)
    np.testing.assert_allclose(np.asarray(rr), r, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(bb), b, rtol=2e-4)


def test_pq_to_hlg_transform():
    from jxl_oxide_tpu.color.convert import ColorTransform
    from jxl_oxide_tpu.headers.image import (
        ColourEncoding, OpsinInverseMatrix, Primaries, ToneMapping,
        TransferFunction, ToneMapping as TM,
    )

    src = ColourEncoding(
        primaries=Primaries.BT2100, tf=TransferFunction.PQ,
    )
    dst = ColourEncoding(
        primaries=Primaries.BT2100, tf=TransferFunction.HLG,
    )
    tm = ToneMapping(intensity_target=4000.0)
    tr = ColorTransform.build(src, dst, OpsinInverseMatrix(), tm)
    kinds = [op.kind for op in tr.ops]
    assert "tone_map" in kinds and "hlg_inverse_oo" in kinds
    # no SDR tone mapping: target is HDR
    assert kinds.count("tone_map") == 1
    planes = [np.full((4, 4), 0.6, dtype=np.float32) for _ in range(3)]
    out = tr.run(planes)
    a = np.asarray(out[0])
    assert np.isfinite(a).all() and (a >= 0).all() and (a <= 1.01).all()


REF_ICC_DIR = "/root/reference/crates/jxl-color/src/icc/test-profiles"


def test_parse_icc_reference_profiles():
    """parse.rs test expectations on the reference's ICC fixtures."""
    import os

    from jxl_oxide_tpu.color.parse import parse_icc

    cases = {
        "srgb-rel.icc": ("RGB", "d65", "srgb", "srgb", "RELATIVE"),
        "srgb-bt709-per.icc": ("RGB", "d65", "srgb", "bt709", "PERCEPTUAL"),
        "srgb-linear-rel.icc": ("RGB", "d65", "srgb", "linear", "RELATIVE"),
        "gray-d65-srgb-rel.icc": ("GREY", "d65", "srgb", "srgb", "RELATIVE"),
        "gray-d65-linear-rel.icc": ("GREY", "d65", "srgb", "linear", "RELATIVE"),
    }
    if not os.path.isdir(REF_ICC_DIR):
        pytest.skip("reference fixtures unavailable")
    for name, (cs, wp, prim, tf, ri) in cases.items():
        with open(os.path.join(REF_ICC_DIR, name), "rb") as f:
            enc = parse_icc(f.read())
        assert (enc.colour_space.name, enc.white_point.kind,
                enc.primaries.kind, enc.tf.kind,
                enc.rendering_intent.name) == (cs, wp, prim, tf, ri), name
    # gamma: 0x23332/65536 -> ~2.2 (exponent stored inverted in ICC)
    with open(os.path.join(REF_ICC_DIR, "srgb-gamma22-rel.icc"), "rb") as f:
        enc = parse_icc(f.read())
    assert enc.tf.kind == "gamma"
    assert 21999000 <= enc.tf.gamma <= 22001000


def test_parse_icc_real_world_grayscale():
    """The reference's vendored real-world grayscale ICC
    (jxl-oxide-tests/tests/image/grayscale.icc, used by its
    grayscale-image decode tests) must parse to Grey / D65 / sRGB TF /
    relative intent."""
    import os

    from jxl_oxide_tpu.color.parse import parse_icc

    path = "/root/reference/crates/jxl-oxide-tests/tests/image/grayscale.icc"
    if not os.path.exists(path):
        pytest.skip("reference fixture unavailable")
    with open(path, "rb") as f:
        enc = parse_icc(f.read())
    assert enc.colour_space.name == "GREY"
    assert enc.white_point.kind == "d65"
    assert enc.tf.kind == "srgb"
    assert enc.rendering_intent.name == "RELATIVE"


def test_parse_icc_synthesize_roundtrip():
    """Synthesized profiles must parse back to the same enum encoding."""
    from jxl_oxide_tpu.color.parse import parse_icc
    from jxl_oxide_tpu.color.synthesize import colour_encoding_to_icc
    from jxl_oxide_tpu.headers.image import (
        ColourEncoding, ColourSpace, Primaries, RenderingIntent,
        TransferFunction, WhitePoint,
    )

    encs = [
        ColourEncoding(),
        ColourEncoding(primaries=Primaries.P3, tf=TransferFunction.LINEAR),
        ColourEncoding(primaries=Primaries.BT2100, tf=TransferFunction.PQ,
                       rendering_intent=RenderingIntent.PERCEPTUAL),
        ColourEncoding(colour_space=ColourSpace.GREY),
    ]
    for enc in encs:
        back = parse_icc(colour_encoding_to_icc(enc))
        assert back.colour_space == enc.colour_space
        assert back.white_point.kind == enc.white_point.kind
        assert back.tf.kind == enc.tf.kind
        if enc.colour_space == ColourSpace.RGB:
            assert back.primaries.kind == enc.primaries.kind
        assert back.rendering_intent == enc.rendering_intent


def test_jpeg_chroma_upsample_triangle():
    """2x chroma upsample matches the reference's scalar 0.25/0.75
    interpolation (filter/ycbcr.rs:12-55)."""
    from jxl_oxide_tpu.render.render import _upsample2x_triangle

    rng = np.random.default_rng(51)
    row = rng.normal(size=(1, 5)).astype(np.float32)

    def scalar_h(r):
        out = []
        n = len(r)
        for j in range(n):
            prev = r[j - 1] if j > 0 else r[0]
            nxt = r[j + 1] if j + 1 < n else r[-1]
            out.append(0.25 * prev + 0.75 * r[j])
            out.append(0.75 * r[j] + 0.25 * nxt)
        return out

    got = _upsample2x_triangle(row, 1, 10)[0]
    np.testing.assert_allclose(got, scalar_h(list(row[0])), rtol=1e-6)
    # odd target width truncates the trailing sample
    got9 = _upsample2x_triangle(row, 1, 9)[0]
    np.testing.assert_allclose(got9, scalar_h(list(row[0]))[:9], rtol=1e-6)
