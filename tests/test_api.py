"""Public API facade tests: real-file decode, VarDCT through the facade,
CLI entry points, PNG output."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from jxl_oxide_tpu import JxlImage

CMYK = "/root/reference/crates/jxl-oxide-tests/tests/cms/cmyk_layers.jxl"


@pytest.fixture(scope="module")
def cmyk_image():
    return JxlImage.open(CMYK)


def test_cmyk_layers_metadata(cmyk_image):
    img = cmyk_image
    assert (img.width, img.height) == (512, 512)
    assert img.num_frames == 4
    assert img.num_keyframes == 1
    assert img.embedded_icc and img.embedded_icc[36:40] == b"acsp"


def test_cmyk_layers_render(cmyk_image):
    r = cmyk_image.render_frame(0)
    arr = r.image_all_channels()
    assert arr.shape == (512, 512, 5)
    assert 0.0 <= arr.min() and arr.max() <= 1.0
    # layered text on white-ish background: plenty of pure-1.0 pixels
    assert (arr[..., 0] == 1.0).mean() > 0.3


def test_streaming_feed_chunks():
    data = open(CMYK, "rb").read()
    img = JxlImage()
    for i in range(0, len(data), 1000):
        img.feed_bytes(data[i : i + 1000])
    img.finish()
    assert img.num_frames == 4


def test_vardct_through_facade():
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(5)
    small = rng.random((9, 9, 3)).astype(np.float32)
    src = np.kron(small, np.ones((8, 8, 1), dtype=np.float32))[:68, :72]
    data = encode_jxl_vardct(np.clip(src, 0, 1), global_scale=4096)
    img = JxlImage.from_bytes(data)
    assert (img.width, img.height) == (72, 68)
    r = img.render_frame(0)
    out = np.stack(r.image_planar(), axis=-1)
    assert out.shape == (68, 72, 3)
    # encoder writes non-xyb sRGB; decode target is the same -> close match
    mse = np.mean((np.clip(out, 0, 1) - src) ** 2)
    assert 10 * np.log10(1.0 / mse) > 30.0


def test_modular_through_facade(tmp_path):
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(6)
    chans = [rng.integers(0, 256, (40, 50), dtype=np.int64) for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8)
    img = JxlImage.from_bytes(data)
    r = img.render_frame(0)
    out = r.to_u8()
    for c in range(3):
        np.testing.assert_array_equal(out[..., c], chans[c].astype(np.uint8))


def test_cli_info_and_decode(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "jxl_oxide_tpu", "info", CMYK],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    info = json.loads(out.stdout)
    assert info["width"] == 512
    assert len(info["frames"]) == 4

    png = tmp_path / "out.png"
    out = subprocess.run(
        [sys.executable, "-m", "jxl_oxide_tpu", "decode", CMYK, "-o", str(png)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert out.returncode == 0, out.stderr
    assert png.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_slow_motion(tmp_path):
    """slow-motion devtool: animates the progressive loading process
    into an APNG (slow_motion.rs analog; APNG instead of ffmpeg MP4)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    fix = tmp_path / "fix.jxl"
    out = subprocess.run(
        [sys.executable, "-m", "jxl_oxide_tpu", "generate-fixture",
         "-o", str(fix), "--kind", "vardct", "--size", "320x288"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    apng = tmp_path / "slow.png"
    out = subprocess.run(
        [sys.executable, "-m", "jxl_oxide_tpu", "slow-motion", str(fix),
         "-o", str(apng), "--steps", "8"],
        capture_output=True, text=True, env=env, timeout=570,
    )
    assert out.returncode == 0, out.stderr
    blob = apng.read_bytes()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n" and b"acTL" in blob
    assert blob.count(b"fcTL") >= 2  # at least one partial + the final


def test_progressive_render():
    """Partial feeds must render progressively without errors, and the final
    feed must match the one-shot decode (render_loading_frame contract)."""
    data = open(CMYK, "rb").read()
    img = JxlImage()
    renders = []
    step = len(data) // 7
    for i in range(0, len(data), step):
        img.feed_bytes(data[i : i + step])
        if img.image_header is not None and img._frames:
            try:
                r = img.render_loading_frame()
                renders.append(np.stack(r.image_planar(), -1))
            except Exception:
                pass
    img.finish()
    assert renders, "no progressive renders produced"
    final = np.stack(img.render_frame(0).image_planar(), -1)
    assert final.shape == renders[-1].shape


def test_crop_region_matches_full():
    """ROI decode must equal the crop of the full render (the reference's
    crop consistency suite, tests/crop/mod.rs)."""
    img = JxlImage.open(CMYK)
    full = np.stack(img.render_frame(0).image_planar(), -1)
    img2 = JxlImage.open(CMYK)
    img2.set_image_region(37, 101, 200, 150)
    cropped = np.stack(img2.render_frame(0).image_planar(), -1)
    np.testing.assert_allclose(
        cropped, full[101 : 101 + 150, 37 : 37 + 200], atol=1e-6
    )


def test_memory_limit_enforced():
    """Decode with a tiny memory budget must fail with JxlError, not OOM
    (the reference's AllocTracker fuzz contract)."""
    from jxl_oxide_tpu.utils.errors import JxlError

    img = JxlImage.open(CMYK, approx_memory_limit=64 * 1024)
    with pytest.raises(JxlError):
        img.render_frame(0)
    # generous limit decodes fine
    img2 = JxlImage.open(CMYK, approx_memory_limit=512 << 20)
    img2.render_frame(0)


def test_animation_multi_keyframe(tmp_path):
    """Animated modular stream: every frame is a keyframe with duration;
    APNG output is written for multi-frame renders."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(9)
    frames = [
        [rng.integers(0, 256, (24, 32), dtype=np.int64) for _ in range(3)]
        for _ in range(3)
    ]
    data = encode_jxl_modular(frames[0], bit_depth=8, animation_frames=frames)
    img = JxlImage.from_bytes(data)
    assert img.is_animation
    assert img.num_keyframes == 3
    for i in range(3):
        r = img.render_frame(i)
        assert r.duration == 1
        out = r.to_u8()
        for c in range(3):
            np.testing.assert_array_equal(
                out[..., c], frames[i][c].astype(np.uint8)
            )
    # APNG via CLI writer
    from jxl_oxide_tpu.io.png import write_apng

    apng = tmp_path / "anim.png"
    write_apng(apng, [img.render_frame(i).to_u8() for i in range(3)],
               [10, 10, 10])
    raw = apng.read_bytes()
    assert b"acTL" in raw and b"fcTL" in raw and b"fdAT" in raw

def test_pil_integration(tmp_path):
    """Image.open on .jxl via the registered Pillow plugin
    (integration.rs analog)."""
    from encoder import encode_jxl_modular
    from PIL import Image

    from jxl_oxide_tpu.integration import register

    register()
    rng = np.random.default_rng(7)
    chans = [rng.integers(0, 256, (40, 56), dtype=np.int64) for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8)
    p = tmp_path / "t.jxl"
    p.write_bytes(data)
    with Image.open(p) as im:
        assert im.format == "JXL"
        assert im.size == (56, 40)
        assert im.mode == "RGB"
        out = np.asarray(im)
    for c in range(3):
        np.testing.assert_array_equal(out[..., c], chans[c].astype(np.uint8))


def test_pil_integration_animation(tmp_path):
    from encoder import encode_jxl_modular
    from PIL import Image, ImageSequence

    from jxl_oxide_tpu.integration import register

    register()
    rng = np.random.default_rng(8)
    frames = [
        [rng.integers(0, 256, (24, 24), dtype=np.int64) for _ in range(3)]
        for _ in range(3)
    ]
    data = encode_jxl_modular(frames[0], bit_depth=8, animation_frames=frames)
    p = tmp_path / "anim.jxl"
    p.write_bytes(data)
    with Image.open(p) as im:
        assert im.n_frames == 3 and im.is_animated
        decoded = [np.asarray(f.convert("RGB"))
                   for f in ImageSequence.Iterator(im)]
    for got, want in zip(decoded, frames):
        for c in range(3):
            np.testing.assert_array_equal(got[..., c], want[c].astype(np.uint8))


def test_image_stream(tmp_path):
    """fb.rs ImageStream::write_to_buffer semantics: resumable chunked
    interleaved sample output."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(11)
    chans = [rng.integers(0, 256, (10, 7), dtype=np.int64) for _ in range(3)]
    img = JxlImage.from_bytes(encode_jxl_modular(chans, bit_depth=8))
    r = img.render_frame(0)
    st = r.stream()
    assert (st.width, st.height, st.channels) == (7, 10, 3)
    buf = np.zeros(50, dtype=np.uint8)
    out = []
    while True:
        n = st.write_to_buffer(buf)
        if n == 0:
            break
        out.append(buf[:n].copy())
    flat = np.concatenate(out)
    want = np.stack([c.astype(np.uint8) for c in chans], axis=-1).reshape(-1)
    np.testing.assert_array_equal(flat, want)


def test_alpha_extra_channel(tmp_path):
    """Default alpha EC through the bitstream: image() appends alpha, PIL
    plugin reports RGBA."""
    from encoder import encode_jxl_modular
    from PIL import Image

    from jxl_oxide_tpu.integration import register

    rng = np.random.default_rng(13)
    chans = [rng.integers(0, 256, (20, 30), dtype=np.int64) for _ in range(4)]
    data = encode_jxl_modular(chans, bit_depth=8, extra_alpha=True)
    img = JxlImage.from_bytes(data)
    meta = img.image_header.metadata
    assert len(meta.ec_info) == 1 and meta.ec_info[0].is_alpha
    r = img.render_frame(0)
    out = r.to_u8()
    assert out.shape == (20, 30, 4)
    for c in range(4):
        np.testing.assert_array_equal(out[..., c], chans[c].astype(np.uint8))

    register()
    p = tmp_path / "a.jxl"
    p.write_bytes(data)
    with Image.open(p) as im:
        assert im.mode == "RGBA"
        arr = np.asarray(im)
    np.testing.assert_array_equal(arr, out)


def test_alpha_blend_animation():
    """Blend-mode frame composition with alpha (blend.rs:550-680): frame 2
    alpha-blends onto frame 1 saved in a reference slot."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(17)
    f1 = [rng.integers(0, 256, (16, 16), dtype=np.int64) for _ in range(3)]
    f1.append(np.full((16, 16), 255, dtype=np.int64))  # opaque alpha
    f2 = [rng.integers(0, 256, (16, 16), dtype=np.int64) for _ in range(3)]
    alpha2 = np.zeros((16, 16), dtype=np.int64)
    alpha2[:8] = 128  # top half semi-transparent, bottom fully transparent
    f2.append(alpha2)
    data = encode_jxl_modular(
        f1, bit_depth=8, animation_frames=[f1, f2],
        extra_alpha=True, animation_blend=True,
    )
    img = JxlImage.from_bytes(data)
    assert img.num_keyframes == 2
    out = img.render_frame(1).to_u8()

    base = np.stack([c / 255.0 for c in f1], -1).astype(np.float32)
    new = np.stack([c / 255.0 for c in f2], -1).astype(np.float32)
    na, ba = new[..., 3], base[..., 3]
    mixed = 1.0 - (1.0 - na) * (1.0 - ba)
    want = np.empty_like(base)
    with np.errstate(invalid="ignore"):
        for c in range(3):
            want[..., c] = np.where(
                mixed > 0,
                (na * new[..., c] + ba * base[..., c] * (1.0 - na)) / mixed,
                0.0,
            )
    want[..., 3] = na + ba * (1.0 - na)
    want_u8 = np.clip(np.round(want * 255), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, want_u8)


def test_spot_colour_end_to_end():
    """SpotColour EC through the bitstream + apply_spot_colors
    (features/spot_colors.rs:5-37)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(19)
    color = [rng.integers(0, 256, (12, 12), dtype=np.int64) for _ in range(3)]
    spot = np.zeros((12, 12), dtype=np.int64)
    spot[3:6, 3:6] = 255
    rgbs = (1.0, 0.0, 0.0, 0.5)  # red at 50% solidity
    data = encode_jxl_modular(
        color + [spot], bit_depth=8, spot_colour=rgbs,
    )
    img = JxlImage.from_bytes(data)
    info = img.image_header.metadata.ec_info[0]
    assert info.ty.name == "SPOT_COLOUR"
    assert info.spot_colour == pytest.approx(rgbs)
    r = img.render_frame(0)
    before = [np.asarray(p).copy() for p in r.planes]
    r.apply_spot_colors()
    after = [np.asarray(p) for p in r.planes]
    mix = (spot / 255.0) * 0.5
    for c, colv in enumerate((1.0, 0.0, 0.0)):
        want = mix * colv + (1.0 - mix) * before[c]
        np.testing.assert_allclose(after[c], want, atol=1e-6)

    # idempotence: a second call must not composite twice
    r.apply_spot_colors()
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(r.planes[c]), after[c])

    # every pixel output composites spot colors automatically
    # (features/spot_colors.rs:5-37 semantics on Render::stream, extended
    # here to to_u8/image_all_channels per the facade contract)
    want_u8 = np.clip(
        np.round(np.stack(after, -1) * 255), 0, 255
    ).astype(np.uint8)
    r2 = JxlImage.from_bytes(data).render_frame(0)
    np.testing.assert_array_equal(r2.to_u8()[..., :3], want_u8)
    r3 = JxlImage.from_bytes(data).render_frame(0)
    np.testing.assert_allclose(
        r3.image_all_channels()[..., :3], np.stack(after, -1), atol=1e-6
    )


def test_fuzz_corpus_sweep(fuzz_corpus_paths):
    """Every past fuzz finding decodes without crashing: only JxlError may
    escape, under a 128 MiB AllocTracker budget (fuzz_findings/mod.rs:1-30,
    fuzz/fuzz_targets/decode.rs:3-6)."""
    from jxl_oxide_tpu.utils.errors import JxlError

    assert fuzz_corpus_paths, "fuzz corpus unavailable"
    for path in fuzz_corpus_paths:
        with open(path, "rb") as f:
            data = f.read()
        try:
            img = JxlImage(approx_memory_limit=128 << 20)
            img.feed_bytes(data)
            img.finish()
            for i in range(img.num_keyframes):
                img.render_frame(i)
        except JxlError:
            pass
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"{os.path.basename(path)}: {type(e).__name__}: {e}")


def test_fuzz_corpus_pixels(fuzz_corpus_paths):
    """Pixel-level use of the reference fuzz corpus (VERDICT r4 item 3):
    every seed that decodes successfully is cross-checked against the
    float64 oracle (the only third-party bitstreams in the environment
    must validate CONTENT, not just crash-freeness). Seeds outside the
    oracle's scope are skipped with a recorded reason; production
    rejecting a stream (JxlError) is a valid outcome (these are fuzz
    crashes, mostly malformed). The accounting asserts pin the current
    corpus composition so scope regressions (a decodable seed silently
    dropping to skipped) fail loudly."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from oracle_decoder import oracle_decode

    from jxl_oxide_tpu.utils.errors import JxlError

    assert fuzz_corpus_paths, "fuzz corpus unavailable"
    invalid, compared, skipped = [], [], {}
    for path in fuzz_corpus_paths:
        name = os.path.basename(path)
        with open(path, "rb") as f:
            data = f.read()
        try:
            img = JxlImage(approx_memory_limit=128 << 20)
            img.feed_bytes(data)
            img.finish()
            renders = [img.render_frame(i) for i in range(img.num_keyframes)]
        except JxlError:
            invalid.append(name)
            continue
        codestream = bytes(img._codestream)
        try:
            got = oracle_decode(codestream)
        except (AssertionError, JxlError) as e:
            skipped[name] = f"oracle scope: {type(e).__name__}: {e}"
            continue
        def _worst(renders_):
            out = 0.0
            for g, r in zip(got, renders_):
                arr = np.moveaxis(
                    np.asarray(r.image_all_channels(), dtype=np.float64),
                    -1, 0,
                )
                nc = len(r.planes)
                color = [arr[i] for i in range(nc)]
                if nc == 1:
                    color = color * 3
                w = np.stack(
                    color + [arr[nc + i] for i in range(len(r.extra))]
                )
                assert g.shape[0] == w.shape[0], (name, g.shape, w.shape)
                excess = np.abs(g - w) - 1e-6 * np.abs(g)
                out = max(out, float(excess.max()))
            return out

        assert len(got) == len(renders), name
        worst = _worst(renders)
        # VarDCT f32-vs-f64 tolerance (fuzz seeds can mix encodings;
        # use the looser bound): tools/fuzz_diff.py VARDCT_TOL
        if worst > 2e-4 and img.image_header.metadata.modular_16bit_buffers:
            # narrow-lane wrap: a fuzz stream whose samples exceed its
            # declared 16-bit buffers wraps in the i16 store (the
            # reference's flag-driven narrowing, lib.rs:280-282). The
            # WIDE decode must then match the oracle exactly — the wrap
            # is the only permitted divergence.
            imgw = JxlImage(approx_memory_limit=128 << 20,
                            force_wide_buffers=True)
            imgw.feed_bytes(data)
            imgw.finish()
            wide = [imgw.render_frame(i) for i in range(imgw.num_keyframes)]
            worst = _worst(wide)
            assert worst <= 2e-4, (name, "wide-lane", worst)
            compared.append((name + " (wide lane; narrow wraps)", worst))
            continue
        assert worst <= 2e-4, (name, worst)
        compared.append((name, worst))
    # corpus accounting: 60 seeds; the bulk are malformed (crash
    # regressions). Every seed that production decodes must be either
    # compared or carry an explicit oracle-scope skip reason.
    assert len(invalid) + len(compared) + len(skipped) == len(
        fuzz_corpus_paths
    )
    # 3 of the 60 seeds decode, and ALL THREE now cross-check (round 5
    # widened the oracle to frame upsampling, do_ycbcr modular, modular
    # filters, per-EC blend-source compositing, and VarDCT frames with
    # extra channels)
    assert len(compared) >= 3, (compared, skipped)
    for name, reason in skipped.items():
        print(f"corpus-pixels skip {name}: {reason}")


def test_crop_random_rects():
    """4 random ROI rects vs the full render (tests/crop/mod.rs:7-90)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(23)
    chans = [rng.integers(0, 256, (96, 128), dtype=np.int64) for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8)
    full = np.stack(
        JxlImage.from_bytes(data).render_frame(0).image_planar(), -1
    )
    for _ in range(4):
        w = int(rng.integers(8, 100))
        h = int(rng.integers(8, 80))
        left = int(rng.integers(0, 128 - w))
        top = int(rng.integers(0, 96 - h))
        img = JxlImage.from_bytes(data)
        img.set_image_region(left, top, w, h)
        crop = np.stack(img.render_frame(0).image_planar(), -1)
        np.testing.assert_allclose(
            crop, full[top : top + h, left : left + w], atol=1e-6
        )


def test_frame_upsampling_2x():
    """Frame upsampling=2 applies the spec's non-separable 2x kernel
    (features/upsampling.rs:6-132) to half-resolution samples."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu.ops.upsample import upsample_nonseparable

    rng = np.random.default_rng(29)
    # image is 40x56; frame samples are at half res (20x28)
    chans = [rng.integers(0, 256, (20, 28), dtype=np.int64) for _ in range(3)]
    data = encode_jxl_modular(
        chans, bit_depth=8, upsampling=2, image_size=(40, 56)
    )
    img = JxlImage.from_bytes(data)
    assert (img.width, img.height) == (56, 40)
    out = img.render_frame(0)
    planes = [np.asarray(p) for p in out.planes]
    meta = img.image_header.metadata
    for c in range(3):
        want = upsample_nonseparable(
            chans[c].astype(np.float32) / 255.0, 2, meta
        )[:40, :56]
        np.testing.assert_allclose(planes[c], want, atol=1e-5)


def test_native_python_decode_equivalence(cmyk_layers_jxl):
    """The C++ host runtime and the pure-Python fallback must produce
    bit-exact pixels (native/__init__.py contract)."""
    import jxl_oxide_tpu.native as native

    r1 = JxlImage.from_bytes(cmyk_layers_jxl).render_frame(0)
    p1 = [np.asarray(p) for p in (*r1.planes, *r1.extra)]

    old = (native._lib, native._tried)
    native._lib, native._tried = None, True
    try:
        r2 = JxlImage.from_bytes(cmyk_layers_jxl).render_frame(0)
        p2 = [np.asarray(p) for p in (*r2.planes, *r2.extra)]
    finally:
        native._lib, native._tried = old

    assert len(p1) == len(p2)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a, b)


def test_modular_restoration_filters():
    """Gaborish + EPF on a Modular frame (EPF sigma = sigma_for_modular,
    filter/epf.rs:10-291): decode equals filters applied to raw samples."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu.ops.filters import apply_epf, apply_gabor

    rng = np.random.default_rng(37)
    chans = [rng.integers(0, 256, (24, 24), dtype=np.int64) for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8, gabor=True, epf_iters=2)
    r = JxlImage.from_bytes(data).render_frame(0)
    got = np.stack([np.asarray(p) for p in r.planes])

    from jxl_oxide_tpu.headers.frame import EpfParams, Gabor

    color = [c.astype(np.float32) / 255.0 for c in chans]
    color = [np.asarray(p) for p in apply_gabor(color, Gabor().weights)]
    epf = EpfParams(iters=2)
    sigma = np.full((24, 24), epf.sigma_for_modular, dtype=np.float32)
    out = np.asarray(apply_epf(color, sigma, epf))
    np.testing.assert_allclose(got, out, atol=1e-5)


def test_permuted_toc():
    """Entropy-coded TOC permutation (data/toc.rs:194-270): sections laid
    out in permuted bitstream order decode identically."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(47)
    chans = [rng.integers(0, 256, (300, 300), dtype=np.int64)
             for _ in range(3)]
    plain = encode_jxl_modular(chans, bit_depth=8, group_size_shift=1)
    base = JxlImage.from_bytes(plain).render_frame(0).to_u8()

    # entry_count = 1 lf_global + 1 lf_group + 1 hf_global + 4 groups = 7
    perm = [6, 0, 5, 1, 4, 2, 3]
    permuted = encode_jxl_modular(
        chans, bit_depth=8, group_size_shift=1, toc_permutation=perm,
    )
    assert permuted != plain
    out = JxlImage.from_bytes(permuted).render_frame(0).to_u8()
    np.testing.assert_array_equal(out, base)


def test_render_idempotent_and_cached():
    """Repeated render_frame calls return identical pixels (keyframe
    renders are cached on the context, render/lib.rs handle reuse)."""
    img = JxlImage.open(CMYK)
    a = img.render_frame(0).to_u8()
    b = img.render_frame(0).to_u8()
    np.testing.assert_array_equal(a, b)


def test_all_orientations():
    """EXIF orientations 1-8 applied at output (region.rs
    apply_orientation): each maps the stored plane to the display frame."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(111)
    chans = [rng.integers(0, 256, (10, 14), dtype=np.int64)
             for _ in range(3)]
    stored = np.stack([c.astype(np.uint8) for c in chans], -1)
    expect = {
        1: stored,
        2: stored[:, ::-1],
        3: stored[::-1, ::-1],
        4: stored[::-1, :],
        5: stored.transpose(1, 0, 2),
        6: stored.transpose(1, 0, 2)[:, ::-1],
        7: stored.transpose(1, 0, 2)[::-1, ::-1],
        8: stored.transpose(1, 0, 2)[::-1, :],
    }
    for o in range(1, 9):
        data = encode_jxl_modular(chans, bit_depth=8, orientation=o)
        img = JxlImage.from_bytes(data)
        assert img.image_header.metadata.orientation == o
        out = img.render_frame(0).to_u8()
        np.testing.assert_array_equal(out, expect[o], err_msg=f"orient {o}")


def test_cropped_frame_composition():
    """have_crop frames composite at (x0, y0) on the canvas
    (header.rs crop fields + blend.rs offsets)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(113)
    chans = [rng.integers(0, 256, (12, 16), dtype=np.int64)
             for _ in range(3)]
    data = encode_jxl_modular(
        chans, bit_depth=8, image_size=(24, 32), crop=(5, 3, 16, 12),
    )
    img = JxlImage.from_bytes(data)
    out = img.render_frame(0).to_u8()
    assert out.shape == (24, 32, 3)
    want = np.zeros((24, 32, 3), dtype=np.uint8)
    want[3:15, 5:21] = np.stack([c.astype(np.uint8) for c in chans], -1)
    np.testing.assert_array_equal(out, want)


def test_cropped_frame_negative_offset():
    """Negative crop origin clips against the canvas edge."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(115)
    chans = [rng.integers(0, 256, (8, 8), dtype=np.int64) for _ in range(3)]
    data = encode_jxl_modular(
        chans, bit_depth=8, image_size=(10, 10), crop=(-3, -2, 8, 8),
    )
    out = JxlImage.from_bytes(data).render_frame(0).to_u8()
    want = np.zeros((10, 10, 3), dtype=np.uint8)
    want[:6, :5] = np.stack(
        [c.astype(np.uint8) for c in chans], -1
    )[2:, 3:]
    np.testing.assert_array_equal(out, want)


def test_crop_all_orientations():
    """Crop regions are given in oriented/display space: for every
    orientation, a cropped render must equal the same crop of the full
    oriented render (jxl-oxide lib.rs:718-724 render_frame_cropped maps
    the region through the inverse orientation before decoding)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(301)
    chans = [rng.integers(0, 256, (24, 32), dtype=np.int64)
             for _ in range(3)]
    for o in range(1, 9):
        data = encode_jxl_modular(chans, bit_depth=8, orientation=o)
        img = JxlImage.from_bytes(data)
        full = img.render_frame(0).to_u8()
        dh, dw = full.shape[:2]
        for _ in range(3):
            w = int(rng.integers(4, dw - 2))
            h = int(rng.integers(4, dh - 2))
            left = int(rng.integers(0, dw - w))
            top = int(rng.integers(0, dh - h))
            img2 = JxlImage.from_bytes(data)
            img2.set_image_region(left, top, w, h)
            crop = img2.render_frame(0).to_u8()
            assert crop.shape == (h, w, 3), (o, crop.shape, (h, w))
            np.testing.assert_array_equal(
                crop, full[top : top + h, left : left + w],
                err_msg=f"orientation {o} rect {(left, top, w, h)}",
            )


def test_extra_channel_dim_shift():
    """An EC with dim_shift != 0 decodes at reduced resolution and is
    upsampled by ec_upsampling << dim_shift (util.rs:70); the factor comes
    from the headers, not from plane-shape ratios."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(422)
    h, w = 24, 32
    chans = [rng.integers(0, 256, (h, w), dtype=np.int64) for _ in range(3)]
    alpha_small = rng.integers(0, 256, (h // 2, w // 2), dtype=np.int64)
    data = encode_jxl_modular(
        chans + [alpha_small], bit_depth=8, extra_alpha=True,
        alpha_dim_shift=1,
    )
    img = JxlImage.from_bytes(data)
    meta = img.image_header.metadata
    assert meta.ec_info[0].dim_shift == 1
    r = img.render_frame(0)
    out = r.to_u8()
    assert out.shape == (h, w, 4)
    for c in range(3):
        np.testing.assert_array_equal(out[..., c], chans[c].astype(np.uint8))
    # upsampled alpha: full-size, locally correlated with the source
    assert r.extra[0].shape == (h, w)


def test_progressive_cache_incremental_vardct():
    """Chunked feeds decode each TOC section exactly once across
    render_loading_frame calls (RenderCache resume, state.rs:17-44), and
    the final progressive render equals the one-shot decode."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(61)
    rgb = rng.random((512, 512, 3)).astype(np.float32)
    data = encode_jxl_vardct(rgb, gabor=True)

    img = JxlImage()
    counts = []
    step = len(data) // 9
    for i in range(0, len(data), step):
        img.feed_bytes(data[i : i + step])
        if img.image_header is None or not img._frames:
            continue
        try:
            img.render_loading_frame()
        except Exception:
            pass
        frame = img._frames[-1]
        cache = getattr(frame, "_progressive_cache", None)
        if cache is not None:
            counts.append(cache.sections_decoded())
    img.finish()
    final = img.render_loading_frame().to_u8()

    # sections decode monotonically, once each, across calls
    assert counts, "no progressive decodes happened"
    assert counts == sorted(counts)
    assert 0 < counts[0] or len(set(counts)) > 1, counts
    n_sections = 1 + img._frames[-1].header.num_lf_groups + 1 + (
        img._frames[-1].header.num_groups
    )
    assert counts[-1] <= n_sections

    one_shot = JxlImage.from_bytes(data).render_frame(0).to_u8()
    np.testing.assert_array_equal(final, one_shot)


def test_progressive_cache_incremental_modular():
    """Same resume contract for a multi-group Modular frame."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(62)
    chans = [rng.integers(0, 256, (400, 520), dtype=np.int64)
             for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8)

    img = JxlImage()
    renders = 0
    step = len(data) // 7
    for i in range(0, len(data), step):
        img.feed_bytes(data[i : i + step])
        if img.image_header is None or not img._frames:
            continue
        try:
            img.render_loading_frame()
            renders += 1
        except Exception:
            pass
    img.finish()
    final = img.render_loading_frame().to_u8()
    assert renders >= 2
    one_shot = JxlImage.from_bytes(data).render_frame(0).to_u8()
    np.testing.assert_array_equal(final, one_shot)


def test_progressive_render_cropped_frame_offsets():
    """A partially-fed cropped frame composites at (x0, y0) through the
    real blend path, not pasted at the canvas origin (ADVICE r1:
    render_loading_frame must reuse the blend machinery)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(63)
    chans = [rng.integers(0, 256, (12, 16), dtype=np.int64)
             for _ in range(3)]
    data = encode_jxl_modular(
        chans, bit_depth=8, image_size=(24, 32), crop=(5, 3, 16, 12),
    )
    img = JxlImage()
    img.feed_bytes(data)  # whole stream in one feed; frame complete
    out = img.render_loading_frame().to_u8()
    want = np.zeros((24, 32, 3), dtype=np.uint8)
    want[3:15, 5:21] = np.stack([c.astype(np.uint8) for c in chans], -1)
    np.testing.assert_array_equal(out, want)


def test_lazy_keyframe_rendering():
    """render_frame(idx) renders only the dependency cone of that
    keyframe (jxl-render/src/lib.rs:284-440 lazy handle graph): for
    full-replace animation frames, other frames stay undecoded."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(71)
    fs = [
        [rng.integers(0, 256, (16, 20), dtype=np.int64) for _ in range(3)]
        for _ in range(3)
    ]
    data = encode_jxl_modular(fs[0], bit_depth=8, animation_frames=fs)
    img = JxlImage.from_bytes(data)
    assert img.num_keyframes == 3
    out2 = img.render_frame(2).to_u8()
    # frames 0 and 1 are independent (full replace): never decoded
    assert img._frames[0].lf_global is None
    assert img._frames[1].lf_global is None
    np.testing.assert_array_equal(
        out2, np.stack([c.astype(np.uint8) for c in fs[2]], -1)
    )
    out0 = img.render_frame(0).to_u8()
    assert img._frames[1].lf_global is None  # still untouched
    np.testing.assert_array_equal(
        out0, np.stack([c.astype(np.uint8) for c in fs[0]], -1)
    )


def test_lazy_render_blend_dependency_out_of_order():
    """A blended keyframe requested FIRST pulls its reference frame in
    through the dependency cone; a later request for the reference frame
    itself comes from the cache."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(72)
    f1 = [rng.integers(0, 256, (16, 16), dtype=np.int64) for _ in range(3)]
    f1.append(np.full((16, 16), 255, dtype=np.int64))
    f2 = [rng.integers(0, 256, (16, 16), dtype=np.int64) for _ in range(3)]
    f2.append(np.full((16, 16), 128, dtype=np.int64))
    data = encode_jxl_modular(
        f1, bit_depth=8, animation_frames=[f1, f2],
        extra_alpha=True, animation_blend=True,
    )
    # one-shot sequential values as the oracle
    ref = JxlImage.from_bytes(data)
    want0 = ref.render_frame(0).to_u8()
    want1 = ref.render_frame(1).to_u8()
    # request keyframe 1 first: frame 0 renders as a dependency
    img = JxlImage.from_bytes(data)
    np.testing.assert_array_equal(img.render_frame(1).to_u8(), want1)
    np.testing.assert_array_equal(img.render_frame(0).to_u8(), want0)


def test_roi_pushdown_vardct_sections():
    """A cropped decode of a 16-group VarDCT image decodes only the
    pass-group sections intersecting the padded region
    (jxl-frame/src/lib.rs:626-649 adjust_region), and the pixels match
    the crop of the full decode."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(81)
    h = w = 1024  # 4x4 groups
    rgb = rng.random((h, w, 3)).astype(np.float32)
    data = encode_jxl_vardct(rgb, gabor=True)

    img_full = JxlImage.from_bytes(data)
    full = img_full.render_frame(0).to_u8()
    assert img_full._frames[0]._pass_group_jobs == 16

    img = JxlImage.from_bytes(data)
    img.set_image_region(10, 20, 100, 80)  # fits one group + padding
    crop = img.render_frame(0).to_u8()
    jobs = img._frames[0]._pass_group_jobs
    assert jobs < 16, jobs  # only intersecting groups decoded
    np.testing.assert_array_equal(crop, full[20:100, 10:110])


def test_roi_pushdown_modular_sections():
    """Same for a multi-group Modular image."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(82)
    chans = [rng.integers(0, 256, (700, 700), dtype=np.int64)
             for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8)

    img_full = JxlImage.from_bytes(data)
    full = img_full.render_frame(0).to_u8()
    total = img_full._frames[0]._pass_group_jobs
    assert total == 9  # 3x3 groups of 256

    img = JxlImage.from_bytes(data)
    img.set_image_region(600, 600, 90, 90)  # bottom-right corner
    crop = img.render_frame(0).to_u8()
    assert img._frames[0]._pass_group_jobs < total
    np.testing.assert_array_equal(crop, full[600:690, 600:690])


def test_roi_pushdown_gated_for_squeeze():
    """Global transforms (squeeze) disable section skipping: the crop
    still matches the full decode."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(83)
    chans = [rng.integers(0, 64, (300, 300), dtype=np.int64)
             for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8, squeeze=True)
    full = JxlImage.from_bytes(data).render_frame(0).to_u8()
    img = JxlImage.from_bytes(data)
    img.set_image_region(5, 7, 50, 40)
    crop = img.render_frame(0).to_u8()
    np.testing.assert_array_equal(crop, full[7:47, 5:55])


def test_native_asan_clean():
    """The native host library, rebuilt with ASan+UBSan, runs the full
    entry-point sweep (modular, HF, ICC, fuzz corpus) without sanitizer
    reports (the analog of the reference confining unsafe to audited
    code, SURVEY.md §5)."""
    import subprocess
    import sys as _sys

    asan = subprocess.run(
        ["g++", "-print-file-name=libasan.so"],
        capture_output=True, text=True,
    ).stdout.strip()
    if not asan or not os.path.exists(asan):
        pytest.skip("libasan not available")
    env = dict(os.environ)
    env.update({
        "LD_PRELOAD": asan,
        "ASAN_OPTIONS": "detect_leaks=0:abort_on_error=1",
        "JXL_TPU_NATIVE_SANITIZE": "address",
    })
    env.pop("JXL_TPU_NO_NATIVE", None)
    r = subprocess.run(
        [_sys.executable, os.path.join(os.path.dirname(__file__), "asan_harness.py")],
        env=env, capture_output=True, timeout=570,
    )
    assert r.returncode == 0 and b"ASAN_OK" in r.stdout, (
        r.stdout[-1000:], r.stderr[-3000:],
    )


def test_native_tsan_clean():
    """The native host library, rebuilt with ThreadSanitizer, runs the
    THREADED entry points — persistent WorkerPool, LF-group batch,
    HF pass-group batch, parallel memzero, modular batch, plus two
    concurrent Python callers of the pool — without TSan reports
    (SURVEY.md §5: 'host C++ should run under TSAN in CI')."""
    import subprocess
    import sys as _sys

    tsan = subprocess.run(
        ["g++", "-print-file-name=libtsan.so"],
        capture_output=True, text=True,
    ).stdout.strip()
    if not tsan or not os.path.exists(tsan):
        pytest.skip("libtsan not available")
    env = dict(os.environ)
    env.update({
        "LD_PRELOAD": tsan,
        "TSAN_OPTIONS": "halt_on_error=1:abort_on_error=1",
        "JXL_TPU_NATIVE_SANITIZE": "thread",
    })
    env.pop("JXL_TPU_NO_NATIVE", None)
    r = subprocess.run(
        [_sys.executable,
         os.path.join(os.path.dirname(__file__), "tsan_harness.py")],
        env=env, capture_output=True, timeout=570,
    )
    assert r.returncode == 0 and b"TSAN_OK" in r.stdout, (
        r.stdout[-1000:], r.stderr[-3000:],
    )


def test_mutation_fuzz_short():
    """A short deterministic mutation-fuzz sweep (tools/fuzz.py): every
    mutant either decodes or raises JxlError under the 128 MiB budget
    (the reference's continuous-fuzz contract,
    fuzz/fuzz_targets/decode.rs:1-10)."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    import fuzz as fuzz_mod

    rng = np.random.default_rng(99)
    seeds = fuzz_mod.gather_seeds(rng)
    failures = []
    for i in range(60):
        data = fuzz_mod.mutate(seeds[i % len(seeds)], rng)
        fail = fuzz_mod.try_decode(data)
        if fail is not None:
            failures.append((i, fail))
    assert not failures, failures


def test_native_python_differential_sweep():
    """Randomized multi-configuration differential: the native decoders
    (incl. the interleaved dual-section cursor paths and their pairing
    heuristics) must be bit-identical to the pure-Python reference
    implementation across stream shapes — multi-group VarDCT with
    filters, multi-pass, paired/unpaired modular sections, RLE, and the
    single-group (non-paired) path."""
    import subprocess
    import sys as _sys

    from encoder import encode_jxl_modular
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(77)
    streams = {}
    smooth = np.kron(
        rng.random((33, 33, 3)).astype(np.float32), np.ones((16, 16, 1))
    )[:512, :512]
    streams["vardct_multigroup_epf"] = encode_jxl_vardct(
        np.clip(smooth, 0, 1), gabor=True, epf_iters=1)
    streams["vardct_2pass"] = encode_jxl_vardct(
        np.clip(smooth, 0, 1), num_passes=2)
    streams["modular_multigroup"] = encode_jxl_modular(
        [rng.integers(0, 8, (384, 384)).astype(np.int64) * 32
         for _ in range(3)], bit_depth=8)
    streams["modular_rle"] = encode_jxl_modular(
        [np.repeat(rng.integers(0, 256, (384, 12)).astype(np.int64), 32, 1)
         for _ in range(3)], bit_depth=8, lz77_rle=True)
    streams["modular_single_group"] = encode_jxl_modular(
        [rng.integers(0, 8, (160, 160)).astype(np.int64) * 31
         for _ in range(3)], bit_depth=8)

    native_out = {}
    for name, data in streams.items():
        img = JxlImage.from_bytes(data)
        native_out[name] = img.render_frame(0).to_u8()

    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import sys, pickle\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "import numpy as np\n"
        "from jxl_oxide_tpu import JxlImage\n"
        "streams = pickle.load(sys.stdin.buffer)\n"
        "out = {n: JxlImage.from_bytes(d).render_frame(0).to_u8()\n"
        "       for n, d in streams.items()}\n"
        "pickle.dump(out, sys.stdout.buffer)\n"
    )
    import pickle

    env = dict(os.environ, JXL_TPU_NO_NATIVE="1", JAX_PLATFORMS="cpu")
    r = subprocess.run([_sys.executable, "-c", code],
                       input=pickle.dumps(streams), capture_output=True,
                       env=env, timeout=540)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    py_out = pickle.loads(r.stdout)
    for name in streams:
        np.testing.assert_array_equal(
            native_out[name], py_out[name], err_msg=name)


def test_cmyk_layers_frozen_golden():
    """Frozen expected pixels for the real-world cmyk_layers.jxl (the only
    vendored real bitstream): byte-exact against values produced by the
    PIL/lcms-validated path (VERDICT r1 item 6a — an oracle independent of
    the in-repo encoders). Any decode-path change that alters these pixels
    must be intentional."""
    import hashlib

    r = JxlImage.open(CMYK).render_frame(0)
    u8 = r.to_u8()
    assert u8.shape == (512, 512, 4)
    assert (
        hashlib.sha256(u8.tobytes()).hexdigest()
        == "8cbbb59d5e14986c84eae0f7539bdb38d35ca83b27c24cc3f6718365ef26ea6e"
    )
    means = [round(float(u8[..., c].mean()), 4) for c in range(4)]
    assert means == [236.9262, 239.4441, 238.3346, 255.0], means


def test_narrow_i16_buffers_bit_identical():
    """The narrow (i16) modular sample lane (sample.rs:4-36) produces
    bit-identical pixels to force_wide_buffers=True, across plain, RCT,
    palette, and squeeze streams."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import native as _native

    if not _native.available():
        pytest.skip("native decoder unavailable")
    rng = np.random.default_rng(73)
    variants = [
        {},
        {"rct": True},
        {"squeeze": True},
    ]
    for kw in variants:
        chans = [rng.integers(0, 256, (80, 100), dtype=np.int64)
                 for _ in range(3)]
        data = encode_jxl_modular(chans, bit_depth=8, **kw)
        narrow = JxlImage.from_bytes(data)
        wide = JxlImage.from_bytes(data, force_wide_buffers=True)
        a = narrow.render_frame(0).to_u8()
        b = wide.render_frame(0).to_u8()
        np.testing.assert_array_equal(a, b, err_msg=str(kw))
        # the narrow lane actually engaged
        mod = narrow._frames[0].lf_global.gmodular.modular
        assert mod.image_channels[0].dtype == np.int16, kw
        modw = wide._frames[0].lf_global.gmodular.modular
        assert modw.image_channels[0].dtype == np.int32


def test_render_frame_cropped_api():
    """render_frame_cropped (jxl-oxide lib.rs) renders one region without
    disturbing the image-wide set_image_region state."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(301)
    chans = [rng.integers(0, 256, (40, 60), dtype=np.int64)
             for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8)
    img = JxlImage.from_bytes(data)
    full = img.render_frame(0).to_u8()
    crop = img.render_frame_cropped(0, (7, 5, 30, 20)).to_u8()
    np.testing.assert_array_equal(crop, full[5:25, 7:37])
    # image-wide region untouched
    np.testing.assert_array_equal(img.render_frame(0).to_u8(), full)


def test_vardct_iso_l10_accuracy_contract():
    """Lossy VarDCT decode honors the ISO 18181-3 Level 10 accuracy bound
    (peak error <= 0.004 in [0,1] scale vs the encoded source,
    tests/decode/mod.rs:55-63) on a smooth photographic-style image."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(303)
    base = rng.random((32, 32, 3)).astype(np.float32)
    rgb = np.kron(base, np.ones((8, 8, 1), dtype=np.float32))
    data = encode_jxl_vardct(rgb, global_scale=8192)
    r = JxlImage.from_bytes(data).render_frame(0)
    got = np.stack([np.asarray(p, dtype=np.float32) for p in r.planes], -1)
    peak = float(np.abs(got - rgb).max())
    assert peak <= 0.004, peak


def test_replay_fuzz_found_regressions():
    """Replay any findings the mutation fuzzer has saved (tools/fuzz.py
    --save-dir): each must now decode or fail with JxlError only."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    import fuzz as fuzz_mod

    found_dir = os.path.join(os.path.dirname(__file__), "fuzz_found")
    if not os.path.isdir(found_dir):
        pytest.skip("no saved findings")
    names = sorted(os.listdir(found_dir))
    if not names:
        pytest.skip("no saved findings")
    for name in names:
        with open(os.path.join(found_dir, name), "rb") as f:
            data = f.read()
        fail = fuzz_mod.try_decode(data)
        assert fail is None, (name, fail)


def test_roi_device_rect_with_filters():
    """ROI decode runs the fused device program on a group-aligned
    sub-rect (roi.device_rect); output must match the full decode's crop
    exactly even with gaborish + EPF + adaptive LF smoothing active and
    mixed transform types (the rect edge behaves like a plane edge inside
    the program, so the padding must keep that band out of the ROI)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    sys.path.insert(0, "/root/repo/tests")
    from encoder_vardct import encode_jxl_vardct_tiled
    from test_parallel import _random_varblock_grid

    from jxl_oxide_tpu.models.vardct import TransformType as T

    rng = np.random.default_rng(83)
    h = w = 1024
    bh, bw = h // 8, w // 8
    sel, mul = _random_varblock_grid(
        bh, bw, rng, [T.DCT8, T.DCT16, T.DCT2, T.DCT4, T.HORNUSS])
    coeff = rng.integers(-10, 11, (3, h, w)).astype(np.int64)
    coeff[rng.random((3, h, w)) < 0.8] = 0
    lf_q = rng.integers(-50, 51, (3, bh, bw)).astype(np.int64)
    sharp = rng.integers(0, 8, (bh, bw)).astype(np.int64)
    data = encode_jxl_vardct_tiled(h, w, sel, mul, coeff, lf_q, gabor=True,
                                   epf_iters=2, sharpness=sharp)

    full = JxlImage.from_bytes(data).render_frame(0).to_u8()

    for left, top, cw, ch in (
        (300, 420, 200, 150),   # interior
        (0, 0, 128, 128),       # top-left corner (rect edge = global edge)
        (900, 950, 124, 74),    # bottom-right corner
        (500, 0, 64, 300),      # touching the top edge
    ):
        img = JxlImage.from_bytes(data)
        img.set_image_region(left, top, cw, ch)
        crop = img.render_frame(0).to_u8()
        np.testing.assert_array_equal(
            crop, full[top : top + ch, left : left + cw],
            err_msg=f"rect {(left, top, cw, ch)}",
        )


def test_decode_batch_and_iter():
    """Serving API: concurrent batch decode returns results in input
    order across output kinds; decode_iter streams with a bounded
    window."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import decode_batch, decode_iter

    rng = np.random.default_rng(23)
    streams = []
    expected = []
    for i in range(5):
        chans = [rng.integers(0, 256, (32 + 8 * i, 40), dtype=np.int64)
                 for _ in range(3)]
        streams.append(encode_jxl_modular(chans, bit_depth=8))
        expected.append(np.stack(chans, axis=-1).astype(np.uint8))

    outs = decode_batch(streams, num_workers=4)
    assert len(outs) == 5
    for got, exp in zip(outs, expected):
        np.testing.assert_array_equal(got, exp)

    # f32 and render outputs
    f32 = decode_batch(streams[:2], output="f32", num_workers=2)
    assert f32[0].dtype == np.float32
    rends = decode_batch(streams[:2], output="render", num_workers=2)
    assert hasattr(rends[0], "to_u8")

    # streaming variant, tiny window
    it = decode_iter(iter(streams), num_workers=2, window=2)
    for got, exp in zip(it, expected):
        np.testing.assert_array_equal(got, exp)

    # error propagation: a corrupt stream raises, valid ones still decode
    bad = streams[0][:40]
    with pytest.raises(Exception):
        decode_batch([bad], num_workers=1)


def test_custom_up2_weights_from_header():
    """Custom 2x upsampling weights in ImageMetadata (lib.rs:163-168 /
    CustomTransformData cw_mask): the decoder must build the kernel from
    the header weights, not the spec defaults."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(31)
    chans = [rng.integers(0, 256, (20, 28), dtype=np.int64)
             for _ in range(3)]
    default = encode_jxl_modular(chans, bit_depth=8, upsampling=2,
                                 image_size=(40, 56))
    # near-default weights, perturbed: output must parse AND differ
    weights = [0.01746] + [0.0] * 14
    custom = encode_jxl_modular(chans, bit_depth=8, upsampling=2,
                                image_size=(40, 56), up2_weights=weights)
    img_c = JxlImage.from_bytes(custom)
    assert img_c.image_header.metadata.up2_weight is not None
    out_d = JxlImage.from_bytes(default).render_frame(0).to_u8()
    out_c = img_c.render_frame(0).to_u8()
    assert out_c.shape == out_d.shape == (40, 56, 3)
    assert not np.array_equal(out_c, out_d), "custom weights had no effect"


def test_preview_frame_skipped_multigroup():
    """A preview frame (PreviewHeader + a full small frame before the
    first regular frame) must parse with the PREVIEW canvas dims — using
    the image dims derives the wrong TOC entry count for a multi-group
    main image and desyncs (jxl-oxide lib.rs:384-411)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(77)
    # multi-group main image (group_dim 256 -> 2x3 groups)
    chans = [rng.integers(0, 256, (300, 520), dtype=np.int64)
             for _ in range(3)]
    preview = [rng.integers(0, 256, (24, 32), dtype=np.int64)
               for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8,
                              preview_channels=preview)
    img = JxlImage.from_bytes(data)
    assert img.image_header.metadata.preview is not None
    assert (img.image_header.metadata.preview.width,
            img.image_header.metadata.preview.height) == (32, 24)
    out = img.render_frame(0).to_u8()
    for c in range(3):
        np.testing.assert_array_equal(out[..., c],
                                      chans[c].astype(np.uint8))


def test_header_breadth_tone_intrinsic_names_timecodes():
    """Non-default header branches in one stream: custom ToneMapping,
    intrinsic size, per-frame names, and a custom AnimationHeader with
    timecodes (jxl-image lib.rs extra_fields; frame header.rs name /
    timecode fields)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(41)
    frames = [
        [rng.integers(0, 256, (16, 24), dtype=np.int64) for _ in range(3)]
        for _ in range(2)
    ]
    data = encode_jxl_modular(
        frames[0], bit_depth=8, animation_frames=frames,
        tone_mapping=(4000.0, 0.5, False, 0.25),
        intrinsic_size=(12, 10),
        frame_name="frameA",
        animation_params=(24, 2, 3, True),
    )
    img = JxlImage.from_bytes(data)
    meta = img.image_header.metadata
    tm = meta.tone_mapping
    assert tm.intensity_target == 4000.0 and tm.min_nits == 0.5
    assert tm.linear_below == 0.25 and not tm.relative_to_max_display
    assert (meta.intrinsic_size.width, meta.intrinsic_size.height) == (12, 10)
    anim = meta.animation
    assert (anim.tps_numerator, anim.tps_denominator) == (24, 2)
    assert anim.num_loops == 3 and anim.have_timecodes
    assert img.num_keyframes == 2
    for i in range(2):
        r = img.render_frame(i)
        out = r.to_u8()
        for c in range(3):
            np.testing.assert_array_equal(
                out[..., c], frames[i][c].astype(np.uint8))
    assert img._frames[0].header.name == "frameA"
    assert img._frames[1].header.timecode == 100


def test_depth_cfa_named_extra_channels():
    """Non-alpha extra channel types (Depth, CFA with channel index,
    Thermal) with names and a distinct bit depth: the full
    ExtraChannelInfo parse surface (jxl-image lib.rs:363-425), carried
    through decode as extra planes."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(61)
    color = [rng.integers(0, 256, (20, 24), dtype=np.int64)
             for _ in range(3)]
    depth = rng.integers(0, 256, (20, 24), dtype=np.int64)
    cfa = rng.integers(0, 256, (20, 24), dtype=np.int64)
    therm = rng.integers(0, 256, (20, 24), dtype=np.int64)
    data = encode_jxl_modular(
        color + [depth, cfa, therm], bit_depth=8,
        extra_channel_specs=[
            {"ty": 1, "name": "depthmap"},
            {"ty": 5, "name": "bayer", "cfa_channel": 1},
            {"ty": 6},
        ],
    )
    img = JxlImage.from_bytes(data)
    infos = img.image_header.metadata.ec_info
    assert [i.ty.name for i in infos] == ["DEPTH", "CFA", "THERMAL"]
    assert infos[0].name == "depthmap" and infos[1].name == "bayer"
    assert infos[1].cfa_channel == 1
    r = img.render_frame(0)
    assert len(r.extra) == 3
    got = [np.round(np.asarray(p) * 255).astype(np.int64) for p in r.extra]
    for g, e in zip(got, (depth, cfa, therm)):
        np.testing.assert_array_equal(g, e)


def test_odd_size_upsampling_all_factors():
    """Upsampling 2/4/8 with canvases that are NOT multiples of the
    factor: coded channels are ceil-divided and the upsampled output
    truncates to the exact canvas (features/upsampling.rs edge rules)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(3)
    for ups, (h, w) in ((2, (41, 55)), (4, (43, 57)), (8, (41, 63))):
        ch_shape = (-(-h // ups), -(-w // ups))
        chans = [rng.integers(0, 256, ch_shape, dtype=np.int64)
                 for _ in range(3)]
        data = encode_jxl_modular(chans, bit_depth=8, upsampling=ups,
                                  image_size=(h, w))
        out = JxlImage.from_bytes(data).render_frame(0).to_u8()
        assert out.shape == (h, w, 3), (ups, out.shape)
        # same coded channels on the full even canvas: the odd-size
        # output must be its exact top-left crop (truncation happens at
        # the bottom/right, and the upsample kernel context is identical)
        fh, fw = ch_shape[0] * ups, ch_shape[1] * ups
        full = encode_jxl_modular(chans, bit_depth=8, upsampling=ups,
                                  image_size=(fh, fw))
        ref = JxlImage.from_bytes(full).render_frame(0).to_u8()
        np.testing.assert_array_equal(out, ref[:h, :w], err_msg=str(ups))


def test_progressive_render_reused_by_render_frame(monkeypatch):
    """Keyframes completed through the progressive path land in the shared
    keyframe cache, so a later render_frame() (full OR cropped) returns
    them without re-rendering — one render cache serves both paths
    (VERDICT r2 weak #6; reference render cache, jxl-render/src/state.rs)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(31)
    chans = [rng.integers(0, 256, (40, 48), dtype=np.int64) for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8)

    img = JxlImage()
    img.feed_bytes(data)
    img.finish()
    prog = img.render_loading_frame().to_u8()

    # any further frame render would have to go through RenderContext
    from jxl_oxide_tpu.render.context import RenderContext

    def _boom(*a, **k):
        raise AssertionError("render_frame re-rendered a cached keyframe")

    monkeypatch.setattr(RenderContext, "add_frame", _boom)

    full = img.render_frame(0).to_u8()
    np.testing.assert_array_equal(full, prog)

    # a cropped render is satisfied by the cached FULL canvas
    img.set_image_region(8, 4, 16, 20)
    roi = img.render_frame(0).to_u8()
    np.testing.assert_array_equal(roi, prog[4:24, 8:24])


def test_roi_pushdown_subsampled_420():
    """ROI pushdown applies to chroma-subsampled (4:2:0) VarDCT frames
    (VERDICT r3 item 1): a cropped decode skips non-intersecting pass
    groups, the fused subsampled program computes only the rect, and the
    pixels match the crop of the full decode."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct_tiled

    from jxl_oxide_tpu.models.vardct import TransformType as T, jpeg_shifts

    rng = np.random.default_rng(83)
    ups = (0, 1, 0)
    h = w = 1024  # 4x4 groups
    bh, bw = h // 8, w // 8
    shifts = jpeg_shifts(ups)
    sel = np.full((bh, bw), int(T.DCT8), dtype=np.int64)
    mul = np.ones((bh, bw), dtype=np.int64)
    coeff = []
    lf_q = []
    for c in range(3):
        hs, vs = shifts[c]
        sh = (h >> vs, w >> hs)
        cp = np.zeros(sh, dtype=np.int64)
        m = rng.random(sh) < 0.1
        cp[m] = rng.integers(-10, 11, int(m.sum()))
        coeff.append(cp)
        lf_q.append(rng.integers(-40, 41, (bh >> vs, bw >> hs)).astype(np.int64))
    data = encode_jxl_vardct_tiled(
        h, w, sel, mul, coeff, lf_q, gabor=True, epf_iters=2,
        jpeg_upsampling=ups,
    )

    img_full = JxlImage.from_bytes(data)
    full = img_full.render_frame(0).to_u8()
    assert img_full._frames[0]._pass_group_jobs == 16

    img = JxlImage.from_bytes(data)
    img.set_image_region(10, 20, 100, 80)
    crop = img.render_frame(0).to_u8()
    jobs = img._frames[0]._pass_group_jobs
    assert jobs < 16, jobs
    np.testing.assert_array_equal(crop, full[20:100, 10:110])


def test_clear_program_caches_releases_mappings():
    """Decoding heterogeneous streams accumulates mmap'd XLA executables
    that outlive the per-image program caches (jax's internal LRU caches
    hold recent compiles); clear_program_caches() must release them —
    without it a long fuzz/serving loop exhausts vm.max_map_count and
    LLVM's next JIT mmap segfaults (found by a 30-min fuzz_diff window,
    kernel log: segfault in libgcc_s unwinder after 'LLVM compilation
    error: Cannot allocate memory')."""
    import os
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu import JxlImage, clear_program_caches

    def nmaps():
        with open(f"/proc/{os.getpid()}/maps") as f:
            return sum(1 for _ in f)

    rng = np.random.default_rng(3)
    # distinct per-stream filter params force distinct fused programs
    for i in range(4):
        rgb = rng.random((64 + 16 * i, 64, 3)).astype(np.float32)
        data = encode_jxl_vardct(rgb, gabor=(i % 2 == 0), epf_iters=i % 4)
        JxlImage.from_bytes(data).render_frame(0)
    grown = nmaps()
    clear_program_caches()
    released = nmaps()
    # the decodes above map hundreds of JIT sections; the clear must
    # drop the bulk of them (exact counts vary with allocator arenas)
    assert released < grown - 100, (grown, released)


def test_stacked_fast_envelope_engages():
    """_host_stage_fast must actually ACCEPT in-envelope streams: the
    output-equality tests below cannot distinguish the stacked path from
    a silent per-image fallback, and the envelope was once dead because
    the default PilCms tripped a too-strict CMS gate."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.serving import _host_stage_fast

    rng = np.random.default_rng(7)
    data = encode_jxl_vardct(
        rng.random((128, 128, 3)).astype(np.float32), epf_iters=1
    )
    img = JxlImage.from_bytes(data)
    out = _host_stage_fast(img, 0)
    assert out is not None, "in-envelope stream rejected by fast path"
    state, hf_global, fr, alpha = out
    assert alpha is None
    assert state.fused_program_parts(hf_global) is not None


def test_decode_batch_stacked_alpha():
    """Lossy + full-res integer ALPHA streams are IN the stacked fast
    envelope (round 5 — the web-transparency serving shape): the EC
    decodes on host, stacks, and passes through the color tail into the
    interleave; outputs bit-identical to the per-image path, and
    alpha-less images form separate groups."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.serving import (
        _host_stage_fast,
        decode_batch,
        decode_batch_stacked,
    )

    rng = np.random.default_rng(17)
    streams = []
    for i in range(4):
        rgb = rng.random((128, 128, 3)).astype(np.float32)
        alpha = rng.integers(0, 256, (128, 128)) if i % 2 == 0 else None
        streams.append(encode_jxl_vardct(rgb, epf_iters=1, alpha=alpha))
    # the alpha streams must ENGAGE the fast path
    out = _host_stage_fast(JxlImage.from_bytes(streams[0]), 0)
    assert out is not None and out[3] is not None
    for output in ("u8", "f32"):
        ref = decode_batch(streams, output=output, num_workers=2)
        got = decode_batch_stacked(streams, output=output, num_workers=2)
        for a, b in zip(ref, got):
            assert a.shape == b.shape  # [H, W, 4] for the alpha pair
            np.testing.assert_array_equal(a, b)
    assert ref[0].shape[-1] == 4 and ref[1].shape[-1] == 3


def test_decode_batch_stacked():
    """decode_batch_stacked: same-geometry VarDCT streams share ONE
    vmapped device dispatch + one color tail + one quantized readback,
    bit-identical to the per-image path; out-of-envelope streams
    (modular lossless here) fall back transparently (VERDICT r3 item 5)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder import encode_jxl_modular
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu.serving import decode_batch, decode_batch_stacked

    rng = np.random.default_rng(7)
    streams = [
        encode_jxl_vardct(
            rng.random((128, 128, 3)).astype(np.float32), epf_iters=1
        )
        for _ in range(4)
    ]
    streams.append(encode_jxl_modular(
        [rng.integers(0, 255, (48, 48)).astype(np.int64) for _ in range(3)]
    ))
    ref = decode_batch(streams, output="u8", num_workers=2)
    got = decode_batch_stacked(streams, output="u8", num_workers=2)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)
    got_f = decode_batch_stacked(streams[:4], output="f32", num_workers=2)
    ref_f = decode_batch(streams[:4], output="f32", num_workers=2)
    for a, b in zip(ref_f, got_f):
        np.testing.assert_array_equal(a, b)


def test_decode_batch_stacked_mixed_color_metadata():
    """Images sharing a fused-program geometry but differing in color
    metadata (xyb vs plain sRGB enum) must not share one stacked color
    tail — each group gets its own transform."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu.serving import decode_batch, decode_batch_stacked

    rng = np.random.default_rng(11)
    streams = []
    for xyb in (False, True, False, True):
        rgb = rng.random((128, 128, 3)).astype(np.float32)
        streams.append(encode_jxl_vardct(rgb, xyb=xyb))
    ref = decode_batch(streams, output="u8", num_workers=2)
    got = decode_batch_stacked(streams, output="u8", num_workers=2)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_decode_batch_stacked_ycbcr_and_crop_fallback():
    """do_ycbcr 4:2:0 frames run IN the stacked envelope (fused
    subsampled program + stacked BT.601 leg); cropped frames (stacked
    returns frame-sized planes, the general path composites onto the
    canvas) fall back to the per-image path — both identical to
    decode_batch."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder import encode_jxl_modular
    from encoder_vardct import encode_jxl_vardct_420

    from jxl_oxide_tpu.serving import decode_batch, decode_batch_stacked

    rng = np.random.default_rng(21)
    streams = []
    # do_ycbcr (4:2:0) VarDCT
    coeff = [np.zeros((32, 32), np.int64), np.zeros((64, 64), np.int64),
             np.zeros((32, 32), np.int64)]
    for c in coeff:
        m = rng.random(c.shape) < 0.2
        c[m] = rng.integers(-9, 10, int(m.sum()))
    lf = [rng.integers(-20, 20, (4, 4)), rng.integers(-20, 20, (8, 8)),
          rng.integers(-20, 20, (4, 4))]
    streams.append(encode_jxl_vardct_420(64, 64, coeff, lf, 4096))
    # cropped modular frame (smaller than canvas)
    chans = [rng.integers(0, 256, (24, 24), dtype=np.int64)
             for _ in range(3)]
    streams.append(encode_jxl_modular(
        chans, bit_depth=8, image_size=(48, 48), crop=(8, 8, 24, 24)
    ))
    ref = decode_batch(streams, output="u8", num_workers=2)
    got = decode_batch_stacked(streams, output="u8", num_workers=2)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_decode_batch_stacked_subsampled_groups():
    """Chroma-subsampled streams stack: same-geometry 4:2:0 images share
    one vmapped subsampled dispatch + one BT.601/color tail; different
    filter params / layouts (4:2:2) / xyb images form separate groups.
    All bit-identical to the per-image path."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct, encode_jxl_vardct_420

    from jxl_oxide_tpu.models.vardct import jpeg_shifts
    from jxl_oxide_tpu.serving import decode_batch, decode_batch_stacked

    def mk(seed, ups=(0, 1, 0), **kw):
        r = np.random.default_rng(seed)
        h = w = 64
        coeff, lf = [], []
        for c in range(3):
            hs, vs = jpeg_shifts(ups)[c]
            sh = (h >> vs, w >> hs)
            cp = np.zeros(sh, dtype=np.int64)
            m = r.random(sh) < 0.1
            cp[m] = r.integers(-12, 13, int(m.sum()))
            coeff.append(cp)
            lf.append(r.integers(-30, 31, (sh[0] // 8, sh[1] // 8)))
        return encode_jxl_vardct_420(
            h, w, coeff, lf, 4096, jpeg_upsampling=ups, **kw
        )

    streams = [mk(s) for s in range(3)]                    # one 420 stack
    streams += [mk(s, gabor=True, epf_iters=2) for s in (9, 10)]
    streams.append(mk(11, ups=(0, 2, 0)))                  # 4:2:2 group
    streams.append(encode_jxl_vardct(
        np.random.default_rng(5).random((64, 64, 3)).astype(np.float32),
        xyb=True,
    ))
    ref = decode_batch(streams, output="u8", num_workers=2)
    got = decode_batch_stacked(streams, output="u8", num_workers=2)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_progressive_subsampled_420():
    """Progressive (partial-feed) rendering of a multi-group 4:2:0
    stream through the fused subsampled pipeline: every partial render
    is finite, and the final progressive render equals the one-shot
    decode bit for bit."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct_tiled

    from jxl_oxide_tpu.models.vardct import TransformType as T, jpeg_shifts

    rng = np.random.default_rng(31)
    ups, h, w = (0, 1, 0), 768, 512
    bh, bw = h // 8, w // 8
    shifts = jpeg_shifts(ups)
    sel = np.full((bh, bw), int(T.DCT8), np.int64)
    mul = np.ones((bh, bw), np.int64)
    coeff = []
    lf = []
    for c in range(3):
        hs, vs = shifts[c]
        cp = np.zeros((h >> vs, w >> hs), np.int64)
        m = rng.random(cp.shape) < 0.15
        cp[m] = rng.integers(-9, 10, int(m.sum()))
        coeff.append(cp)
        lf.append(rng.integers(-30, 31, (bh >> vs, bw >> hs)).astype(np.int64))
    data = encode_jxl_vardct_tiled(
        h, w, sel, mul, coeff, lf, gabor=True, epf_iters=1,
        jpeg_upsampling=ups,
    )
    img = JxlImage()
    step = len(data) // 9 + 1
    renders = 0
    for i in range(0, len(data), step):
        img.feed_bytes(data[i : i + step])
        r = img.render_loading_frame()
        if r is not None:
            p = np.stack([np.asarray(x) for x in r.planes])
            assert np.isfinite(p).all()
            renders += 1
    assert renders >= 3
    final_prog = np.stack([np.asarray(x) for x in img.render_frame(0).planes])
    oneshot = np.stack([
        np.asarray(x) for x in JxlImage.from_bytes(data).render_frame(0).planes
    ])
    np.testing.assert_array_equal(final_prog, oneshot)
