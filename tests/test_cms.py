"""CMS-leg rendering quality (round-2 verdict item 10).

The reference scores its lcms2 backend with an ssimulacra2 suite
(jxl-oxide-tests/tests/cms/mod.rs). Offline, the strongest available
substitute is computing the expectation DIRECTLY with PIL/ImageCms in the
test — independent of jxl_oxide_tpu.color.cms — and RMSE-thresholding our
facade render against it: that checks the black-channel plumbing, the ink
inversion convention, and the request_icc target wiring, not just a
frozen golden.
"""

import io
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from PIL import Image, ImageCms  # noqa: E402

from jxl_oxide_tpu import JxlImage  # noqa: E402
from jxl_oxide_tpu.color.cms import NullCms, srgb_icc  # noqa: E402
from jxl_oxide_tpu.color.synthesize import colour_encoding_to_icc  # noqa: E402
from jxl_oxide_tpu.headers.image import (  # noqa: E402
    ColourEncoding,
    ExtraChannelType,
    Primaries,
)
from jxl_oxide_tpu.utils.errors import JxlError  # noqa: E402
from encoder import encode_jxl_modular  # noqa: E402
from encoder_vardct import encode_jxl_vardct  # noqa: E402

CMYK = "/root/reference/crates/jxl-oxide-tests/tests/cms/cmyk_layers.jxl"
GRAY_ICC = "/root/reference/crates/jxl-oxide-tests/tests/image/grayscale.icc"


def _rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def _raw_cmyk_planes(data: bytes):
    """Decode WITHOUT a CMS leg: ICC-described samples stay raw.
    Returns (c, m, y, k float planes in JXL ink convention, icc)."""
    img = JxlImage.from_bytes(data)
    img.set_cms(NullCms())
    r = img.render_frame(0)
    black_idx = next(
        i for i, info in enumerate(r.ec_info)
        if info.ty == ExtraChannelType.BLACK
    )
    return [*r.planes, r.extra[black_idx]], img.embedded_icc


def _pil_transform(planes, src_icc: bytes, dst_icc: bytes, src_mode, dst_mode):
    """Direct PIL/ImageCms expectation, written independently of
    jxl_oxide_tpu.color.cms. CMYK uses the JXL ink convention (1 = no
    ink) on the JXL side and PIL's 0 = no ink internally."""
    arr = np.stack([np.asarray(p, dtype=np.float32) for p in planes], axis=-1)
    if src_mode == "CMYK":
        arr = 1.0 - arr
    u8 = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
    img = Image.fromarray(u8.squeeze() if u8.shape[-1] == 1 else u8, src_mode)
    tr = ImageCms.buildTransform(
        ImageCms.ImageCmsProfile(io.BytesIO(src_icc)),
        ImageCms.ImageCmsProfile(io.BytesIO(dst_icc)),
        src_mode, dst_mode,
    )
    out = np.asarray(ImageCms.applyTransform(img, tr), dtype=np.float32) / 255.0
    if out.ndim == 2:
        out = out[:, :, None]
    return out


def test_cmyk_default_render_matches_direct_lcms():
    """Default CMYK->sRGB render equals a direct PIL/lcms computation on
    the raw ink planes (validates black plumbing + inversion, not just
    the frozen golden)."""
    data = open(CMYK, "rb").read()
    cmyk, icc = _raw_cmyk_planes(data)
    expect = _pil_transform(cmyk, icc, srgb_icc(), "CMYK", "RGB")

    img = JxlImage.from_bytes(data)
    got = img.render_frame(0).image_all_channels()[..., :3]
    assert _rmse(got, expect) < 1e-3


def test_cmyk_request_icc_gray_target():
    """request_icc with a grayscale target on a CMYK source: the CMS leg
    runs CMYK->GRAY directly; expectation computed with PIL."""
    data = open(CMYK, "rb").read()
    cmyk, icc = _raw_cmyk_planes(data)
    # PIL can't create GRAY profiles on the fly; use the reference's
    # vendored real-world grayscale profile as the target
    gray_icc = open(GRAY_ICC, "rb").read()
    expect = _pil_transform(cmyk, icc, gray_icc, "CMYK", "L")

    img = JxlImage.from_bytes(data)
    img.request_icc(gray_icc)
    r = img.render_frame(0)
    got = np.stack(
        [np.asarray(p, dtype=np.float32) for p in r.planes], axis=-1
    )
    assert got.shape[-1] == 1
    assert _rmse(got, expect) < 1e-3
    assert img.rendered_icc() == gray_icc


def test_grayscale_icc_image_end_to_end():
    """A grayscale image with the reference's real-world embedded gray
    ICC renders within tolerance of the direct lcms gray->sRGB
    expectation (the enum path may be analytic rather than LUT-based,
    hence the loose threshold)."""
    gray_icc = open(GRAY_ICC, "rb").read()
    rng = np.random.default_rng(3)
    plane = rng.integers(0, 256, (64, 80), dtype=np.int64)
    data = encode_jxl_modular([plane], bit_depth=8, embed_icc=gray_icc)
    img = JxlImage.from_bytes(data)
    assert img.embedded_icc == gray_icc  # ICC stream codec round-trip

    got = img.render_frame(0).image_all_channels()
    expect = _pil_transform(
        [plane.astype(np.float32) / 255.0], gray_icc, srgb_icc(), "L", "RGB"
    )
    assert got.shape == expect.shape
    assert _rmse(got, expect) < 0.02


def test_embedded_rgb_icc_roundtrip_and_render():
    """An RGB image with an embedded lcms-built sRGB profile decodes the
    profile byte-exactly and renders ~identically to the plain sRGB
    encoding of the same pixels."""
    icc = srgb_icc()
    rng = np.random.default_rng(5)
    planes = [rng.integers(0, 256, (48, 56), dtype=np.int64) for _ in range(3)]
    data = encode_jxl_modular(
        [p.copy() for p in planes], bit_depth=8, embed_icc=icc
    )
    img = JxlImage.from_bytes(data)
    assert img.embedded_icc == icc
    got = img.render_frame(0).image_all_channels()

    plain = encode_jxl_modular([p.copy() for p in planes], bit_depth=8)
    ref = JxlImage.from_bytes(plain).render_frame(0).image_all_channels()
    assert _rmse(got, ref) < 5e-3


def test_request_icc_enum_expressible_matches_enum_request():
    """An enum-expressible ICC target (synthesized Display-P3) takes the
    exact enum transform: identical to request_color_encoding."""
    rng = np.random.default_rng(1)
    src = np.kron(rng.random((9, 9, 3)).astype(np.float32),
                  np.ones((8, 8, 1)))[:64, :64]
    data = encode_jxl_vardct(np.clip(src, 0, 1))

    p3 = ColourEncoding(primaries=Primaries("p3"))
    a = JxlImage.from_bytes(data)
    a.request_icc(colour_encoding_to_icc(p3))
    b = JxlImage.from_bytes(data)
    b.request_color_encoding(p3)
    ra = a.render_frame(0).image_all_channels()
    rb = b.render_frame(0).image_all_channels()
    assert np.array_equal(ra, rb)


def test_request_icc_cms_leg_on_xyb_source():
    """A non-enum-expressible (lcms-built) sRGB target on an XYB source
    runs the CMS leg from a synthesized sRGB connection profile; output
    stays within lcms 8-bit round-trip error of the default render."""
    rng = np.random.default_rng(2)
    src = np.kron(rng.random((9, 9, 3)).astype(np.float32),
                  np.ones((8, 8, 1)))[:64, :64]
    data = encode_jxl_vardct(np.clip(src, 0, 1))

    s = srgb_icc()
    a = JxlImage.from_bytes(data)
    a.request_icc(s)
    ra = a.render_frame(0).image_all_channels()
    rb = JxlImage.from_bytes(data).render_frame(0).image_all_channels()
    assert _rmse(ra, rb) < 0.01
    assert a.rendered_icc() == s


def test_rendered_icc_and_cicp_defaults():
    rng = np.random.default_rng(4)
    src = np.kron(rng.random((5, 5, 3)).astype(np.float32),
                  np.ones((8, 8, 1)))[:32, :32]
    img = JxlImage.from_bytes(encode_jxl_vardct(np.clip(src, 0, 1)))
    icc = img.rendered_icc()
    assert icc[36:40] == b"acsp"
    assert img.rendered_cicp() == (1, 13, 0, 1)  # sRGB primaries + TF

    # CMYK source with the default PilCms converts to sRGB
    cm = JxlImage.open(CMYK)
    assert cm.rendered_icc() == srgb_icc()


def test_request_icc_rejects_garbage():
    rng = np.random.default_rng(6)
    src = np.kron(rng.random((5, 5, 3)).astype(np.float32),
                  np.ones((8, 8, 1)))[:32, :32]
    img = JxlImage.from_bytes(encode_jxl_vardct(np.clip(src, 0, 1)))
    with pytest.raises(JxlError):
        img.request_icc(b"not an icc profile")
