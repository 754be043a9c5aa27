"""Cross-check the production decoder against the independent float64
oracle (tests/oracle_decoder.py) on randomized encoder streams per class —
the offline substitute for the libjxl conformance corpus (VERDICT r2
item 4; jxl-oxide-tests/tests/conformance/mod.rs:33-137). The oracle
shares only the bitstream/entropy/header/section parsers with the
production decoder; every numeric composition stage (modular sample
decode, inverse transforms, VarDCT dequant/CfL/IDCT zoo/filters, XYB,
blending) is an independent per-sample/float64 reimplementation, so a
match here validates the fused device programs, dense transform plans,
native host runtime and fast-path dispatch end to end."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from oracle_decoder import oracle_decode  # noqa: E402


def _main_planes(data, n_color=3):
    """Production keyframes as [C, H, W] float64 stacks through the
    ORIENTED public surface (image_all_channels, fb.rs:171-409) so
    orientation 2-8 streams compare end to end."""
    from jxl_oxide_tpu import JxlImage

    img = JxlImage.from_bytes(data)
    out = []
    for k in range(img.num_keyframes):
        r = img.render_frame(k)
        arr = np.moveaxis(
            np.asarray(r.image_all_channels(), dtype=np.float64), -1, 0
        )
        nc = min(len(r.planes), n_color)
        out.append(arr[: nc + len(r.extra)])
    return out


def _assert_match(data, tol, n_color=3):
    got = oracle_decode(data)
    want = _main_planes(data, n_color)
    assert len(got) == len(want)
    for k, (g, w) in enumerate(zip(got, want)):
        d = np.abs(g[: w.shape[0]] - w).max()
        assert d <= tol, (k, d)


# ---------------------------------------------------------------------------
# Modular (lossless): production fast paths + native runtime vs the
# oracle's always-slow general path; tolerance is float conversion only.

MOD_TOL = 1e-6


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("kw", [
    dict(),                      # gradient predictor
    dict(predictor=6),           # self-correcting (weighted) predictor
    dict(rct=True),              # YCoCg RCT
    dict(squeeze=True),          # squeeze stack (multi-level)
    dict(squeeze=True, rct=True),
    dict(bit_depth=16),
    dict(lz77_rle=True),
    dict(lz77_matches=True),
])
def test_oracle_modular_classes(seed, kw):
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(100 + seed)
    bits = kw.pop("bit_depth", 8)
    h = w = 32 if kw.get("squeeze") else 24
    hi = 1 << bits
    if kw.pop("lz77_rle", False):
        chans = [
            np.repeat(rng.integers(0, 4, (h, w // 8)), 8, 1) for _ in range(3)
        ]
        kw["lz77_rle"] = True
    elif kw.pop("lz77_matches", False):
        chans = [
            np.tile(rng.integers(0, hi, (4, w)), (h // 4, 1)) for _ in range(3)
        ]
        kw["lz77_matches"] = True
    else:
        chans = [rng.integers(0, hi, (h, w), dtype=np.int64) for _ in range(3)]
    _assert_match(encode_jxl_modular(chans, bit_depth=bits, **kw), MOD_TOL)


@pytest.mark.parametrize("seed", range(3))
def test_oracle_palette_with_deltas(seed):
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(200 + seed)
    pal = rng.integers(0, 256, (1, 6), dtype=np.int64)
    idx = rng.integers(-3, 6 + 4, (16, 16))
    data = encode_jxl_modular(
        [pal, idx], bit_depth=8, grayscale=True, image_size=(16, 16),
        palette_spec=dict(nb_colours=6, nb_deltas=2, d_pred=int(rng.integers(0, 7))),
    )
    _assert_match(data, MOD_TOL)


@pytest.mark.parametrize("rct_type", [0, 7, 9, 14, 20, 23, 28, 33, 35, 41])
def test_oracle_rct_types_end_to_end(rct_type):
    """Permuted / lifting RCT kinds through real bitstreams: the aliasing
    bug in Rct.inverse write-back (pass-through views overwritten before
    being read) was found by this oracle cross-check; bit-exact now."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(777)
    ch = [rng.integers(0, 256, (16, 16), dtype=np.int64) for _ in range(3)]
    data = encode_jxl_modular(ch, bit_depth=8, rct=True, rct_type=rct_type)
    _assert_match(data, MOD_TOL)

    from jxl_oxide_tpu import JxlImage

    out = JxlImage.from_bytes(data).render_frame(0).to_u8()
    np.testing.assert_array_equal(
        out, np.stack([c.astype(np.uint8) for c in ch], -1)
    )


def test_oracle_rct_all_types_against_production():
    """All 42 RCT types: the oracle's scalar inverse vs the production
    vectorized inverse (transform/rct.rs:15-201) on random i32 grids."""
    from jxl_oxide_tpu.models.modular_transform import Rct, Slot

    from oracle_decoder import _inv_rct

    rng = np.random.default_rng(5)
    for rct_type in range(42):
        grids = [
            rng.integers(-(1 << 20), 1 << 20, (9, 7)).astype(np.int64)
            for _ in range(3)
        ]
        mine = [g.copy() for g in grids]
        _inv_rct(mine, 0, rct_type)
        slots = [Slot(g.astype(np.int32).copy()) for g in grids]
        Rct(0, rct_type).inverse(slots, 8)
        for c in range(3):
            np.testing.assert_array_equal(
                mine[c], slots[c].arr.astype(np.int64), err_msg=str(rct_type)
            )


def test_oracle_unsqueeze_against_production():
    """Squeeze tendency recurrence: oracle per-sample ints vs production
    vectorized (squeeze.rs inverse_h_i32_base), odd and even widths."""
    from jxl_oxide_tpu.models.modular_transform import inverse_squeeze_h

    from oracle_decoder import _unsqueeze_h

    rng = np.random.default_rng(6)
    for w in (1, 2, 7, 8, 17):
        aw, rw = (w + 1) // 2, w // 2
        avg = rng.integers(-(1 << 24), 1 << 24, (5, aw)).astype(np.int64)
        res = rng.integers(-(1 << 24), 1 << 24, (5, rw)).astype(np.int64)
        np.testing.assert_array_equal(
            _unsqueeze_h(avg, res),
            inverse_squeeze_h(
                avg.astype(np.int32), res.astype(np.int32)
            ).astype(np.int64),
            err_msg=str(w),
        )


# ---------------------------------------------------------------------------
# VarDCT: fused device pipeline + dense transform plans vs the oracle's
# per-varblock float64 composition. Tolerance covers f32-vs-f64 drift
# through dequant + IDCT + 3 filter passes.

VARDCT_TOL = 2e-4


@pytest.mark.parametrize("kw", [
    dict(),
    dict(gabor=True),
    dict(gabor=True, epf_iters=1),
    dict(gabor=True, epf_iters=2),
    dict(epf_iters=3),
    dict(num_passes=2),
    dict(xyb=True),
    dict(xyb=True, gabor=True, epf_iters=2),
])
def test_oracle_vardct_dct8(kw):
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(300)
    rgb = rng.random((96, 96, 3)).astype(np.float32)
    _assert_match(encode_jxl_vardct(rgb, **kw), VARDCT_TOL)


@pytest.mark.parametrize("seed", range(4))
def test_oracle_vardct_mixed_transforms(seed):
    """Random varblock tilings over the full transform zoo (all specials,
    AFV variants, rectangular types up to DCT32) with CfL grids and a
    nontrivial LfChannelCorrelation."""
    from encoder_vardct import encode_jxl_vardct_mixed

    from test_parallel import _random_varblock_grid

    from jxl_oxide_tpu.models.vardct import TransformType as T

    rng = np.random.default_rng(400 + seed)
    h = w = 128
    bh, bw = h // 8, w // 8
    types = [
        T.DCT8, T.HORNUSS, T.DCT2, T.DCT4, T.DCT16, T.DCT32,
        T.DCT16X8, T.DCT8X16, T.DCT4X8, T.DCT8X4,
        T.AFV0, T.AFV1, T.AFV2, T.AFV3, T.DCT32X16, T.DCT16X32,
    ]
    sel, mul = _random_varblock_grid(bh, bw, rng, types)
    coeff = rng.integers(-20, 21, (3, h, w)).astype(np.int64)
    coeff[rng.random((3, h, w)) < 0.6] = 0
    lf_q = rng.integers(-80, 81, (3, bh, bw)).astype(np.int64)
    h64, w64 = -(-h // 64), -(-w // 64)
    cfl = (
        rng.integers(-40, 41, (h64, w64)).astype(np.int64),
        rng.integers(-40, 41, (h64, w64)).astype(np.int64),
    )
    data = encode_jxl_vardct_mixed(
        h, w, sel, mul, coeff, lf_q, cfl_grids=cfl,
        lf_chan_corr=(84, 0.1, 0.8, 130, 125),
        extra_precision=int(rng.integers(0, 4)),
    )
    _assert_match(data, VARDCT_TOL)


# ---------------------------------------------------------------------------
# Chroma-subsampled VarDCT (do_ycbcr 4:2:0/4:2:2/4:4:0): fused subsampled
# device pipeline + triangle chroma upsample + BT.601 vs the oracle's
# independent per-channel f64 composition.


def _make_420_planes(rng, h, w, ups, density=0.12):
    from jxl_oxide_tpu.models.vardct import jpeg_shifts

    shifts = jpeg_shifts(ups)
    coeff, lf_q = [], []
    for c in range(3):
        hs, vs = shifts[c]
        sh = (h >> vs, w >> hs)
        cp = np.zeros(sh, dtype=np.int64)
        m = rng.random(sh) < density
        cp[m] = rng.integers(-15, 16, int(m.sum()))
        coeff.append(cp)
        lf_q.append(rng.integers(-40, 41, (sh[0] // 8, sh[1] // 8)))
    return coeff, lf_q


@pytest.mark.parametrize("ups,kw", [
    ((0, 1, 0), dict()),
    ((0, 1, 0), dict(gabor=True, epf_iters=2)),
    ((0, 2, 0), dict()),
    ((0, 3, 0), dict(gabor=True)),
])
def test_oracle_vardct_subsampled(ups, kw):
    from encoder_vardct import encode_jxl_vardct_420

    rng = np.random.default_rng(sum(ups) * 37 + len(kw))
    h, w = 64, 48
    coeff, lf_q = _make_420_planes(rng, h, w, ups)
    data = encode_jxl_vardct_420(
        h, w, coeff, lf_q, 4096, jpeg_upsampling=ups, **kw
    )
    _assert_match(data, VARDCT_TOL)


def test_oracle_vardct_subsampled_multigroup_occupied_check():
    """Multi-group 4:2:0 where an aligned anchor's shifted check cell is
    Occupied (covered by a 2-wide varblock, not an anchor): the shifted-
    anchor existence check is PASS-GROUP-local (jxl-frame
    pass_group.rs:80-96 + jxl-vardct hf_coeff.rs:144-154), so anchors
    (8,38)/(8,40) in group gx=1 skip their chroma contribution.
    Regression: encoder/composition used frame-global (and LF-group-
    local) check cells, desyncing the token stream against the
    pass-group-local entropy decoder on exactly this layout."""
    from encoder_vardct import encode_jxl_vardct_tiled

    from jxl_oxide_tpu.models.vardct import TransformType as T

    rng = np.random.default_rng(11)
    h, w = 256, 512
    bh, bw = h // 8, w // 8
    ups = (0, 1, 0)
    sel = np.zeros((bh, bw), dtype=np.int64)
    mul = np.ones((bh, bw), dtype=np.int64) * 2
    sel[4, 35] = int(T.DCT8X16)  # (w8, h8) == (2, 1): covers (4, 35-36)
    sel[4, 36] = -1
    coeff, lf_q = _make_420_planes(rng, h, w, ups, density=0.15)
    data = encode_jxl_vardct_tiled(
        h, w, sel, mul, coeff, lf_q, jpeg_upsampling=ups
    )
    _assert_match(data, VARDCT_TOL)


@pytest.mark.parametrize("kw", [
    dict(use_lf_frame=True),
    dict(use_lf_frame=True, lf_levels=2),
    dict(use_lf_frame=True, gabor=True, epf_iters=2),
    dict(use_lf_frame=True, xyb=True),
])
def test_oracle_vardct_lf_frame_chain(kw):
    """LF (DC) frame chains: the LF frame renders raw at 8^level
    downsampling, stores into slot level-1, and the consumer uses the
    planes as pre-dequantized LF (identity scale, no LF CfL, no
    smoothing, edge-padded — vardct/mod.rs:176-205)."""
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(sum(map(ord, str(sorted(kw)))))
    rgb = rng.random((96, 96, 3)).astype(np.float32)
    data = encode_jxl_vardct(rgb, global_scale=65536, **kw)
    _assert_match(data, VARDCT_TOL)


def test_oracle_vardct_subsampled_two_pass():
    """Quality-progressive (2-pass) chroma-subsampled multi-group VarDCT:
    per-pass coefficient accumulation composes with the per-channel
    shifted geometry (pass loop hf_coeff.rs:228-236 + subsampled
    write_hf_coeff channel skips)."""
    from encoder_vardct import encode_jxl_vardct_tiled

    rng = np.random.default_rng(19)
    h, w = 256, 512
    bh, bw = h // 8, w // 8
    ups = (0, 1, 0)
    sel = np.zeros((bh, bw), dtype=np.int64)
    mul = np.ones((bh, bw), dtype=np.int64) * 2
    coeff, lf_q = _make_420_planes(rng, h, w, ups, density=0.15)
    data = encode_jxl_vardct_tiled(
        h, w, sel, mul, coeff, lf_q, jpeg_upsampling=ups, num_passes=2
    )
    _assert_match(data, VARDCT_TOL)


# ---------------------------------------------------------------------------
# Blending chains


@pytest.mark.parametrize("blend", [False, True])
@pytest.mark.parametrize("alpha", [False, True])
def test_oracle_blending_chain(blend, alpha):
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(500)
    h = w = 24
    def fr():
        n = 3 + (1 if alpha else 0)
        return [rng.integers(0, 256, (h, w), dtype=np.int64) for _ in range(n)]

    base = fr()
    data = encode_jxl_modular(
        base, bit_depth=8, extra_alpha=alpha,
        animation_frames=[fr(), fr(), fr()], animation_blend=blend,
    )
    _assert_match(data, MOD_TOL)


@pytest.mark.parametrize("spec", [
    1,                              # Add
    3,                              # MulAdd (skip-alpha-channel rule)
    4,                              # Mul, no clamp
    {"mode": 4, "clamp": True},     # Mul with sample clamping
    {"mode": 2, "clamp": True},     # Blend with clamped alpha
])
@pytest.mark.parametrize("alpha", [False, True])
def test_oracle_blend_modes(spec, alpha):
    """Frame-level Add/Mul/MulAdd blending (blend.rs:550-680): the modes
    the Blend(2)-only chain test never reaches — including the MulAdd
    alpha-channel skip rule and the Mul clamp flag (header.rs
    BlendingInfo: clamp coded iff use_alpha-with-extra or Mul)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(501)
    h = w = 24

    def fr():
        n = 3 + (1 if alpha else 0)
        return [rng.integers(0, 256, (h, w), dtype=np.int64)
                for _ in range(n)]

    data = encode_jxl_modular(
        fr(), bit_depth=8, extra_alpha=alpha,
        animation_frames=[fr(), fr()], animation_blend=spec,
    )
    _assert_match(data, MOD_TOL)


@pytest.mark.parametrize("spec", [True, 3])
def test_oracle_blend_premultiplied_alpha(spec):
    """alpha_associated=1: Blend takes the premultiplied branch
    nv + bv*(1-na) instead of the straight-alpha mix (blend.rs:600-625);
    never reachable before the extra_alpha_associated encoder knob."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(502)
    h = w = 24

    def fr():
        return [rng.integers(0, 256, (h, w), dtype=np.int64)
                for _ in range(4)]

    data = encode_jxl_modular(
        fr(), bit_depth=8, extra_alpha=True, extra_alpha_associated=True,
        animation_frames=[fr(), fr()], animation_blend=spec,
    )
    _assert_match(data, MOD_TOL)


@pytest.mark.parametrize("mode", [0, 3, 5, 6, 7])
def test_oracle_patch_modes_below(mode):
    """PatchBlendMode None/Mul/BlendBelow/MulAddAbove/MulAddBelow with a
    patched alpha EC: the *Below variants swap (canvas, patch) operands
    (patch.rs + blend.rs patch kernels) — only Replace/Add/BlendAbove
    were generated before."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(510 + mode)
    h = w = 32
    base = [rng.integers(0, 256, (h, w), dtype=np.int64)
            for _ in range(3)]
    alpha = rng.integers(0, 256, (h, w), dtype=np.int64)
    ref = [rng.integers(0, 256, (h, w), dtype=np.int64) for _ in range(3)]
    ref_alpha = rng.integers(0, 256, (h, w), dtype=np.int64)
    spec = dict(ref_idx=0, x0=2, y0=4, width=12, height=9, x=5, y=6,
                mode=mode, ec_modes=[mode], clamp=bool(mode & 1))
    data = encode_jxl_modular(
        base + [alpha], bit_depth=8, extra_alpha=True,
        reference_patch=(ref + [ref_alpha], spec),
    )
    _assert_match(data, FEAT_TOL)


@pytest.mark.parametrize("mode", [2, 3])
def test_oracle_blend_second_alpha_channel(mode):
    """Two alpha ECs with BlendingInfo.alpha_channel = 1: blending must
    key alpha off the SECOND alpha EC (header.rs BlendingInfo
    alpha_channel U32; blend.rs base/new alpha lookups) — every other
    generated stream pins alpha_channel = 0."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(504)
    h = w = 24

    def fr():
        return [rng.integers(0, 256, (h, w), dtype=np.int64)
                for _ in range(5)]  # 3 color + alpha0 + alpha1

    data = encode_jxl_modular(
        fr(), bit_depth=8, extra_alpha=True,
        extra_channel_specs=[dict(ty=0)],
        animation_frames=[fr(), fr()],
        animation_blend={"mode": mode, "alpha_channel": 1},
    )
    _assert_match(data, MOD_TOL)


@pytest.mark.parametrize("mode", [4, 6])
def test_oracle_patch_second_alpha_channel(mode):
    """Patch blending entries carry an explicit alpha-channel token when
    the image has >= 2 alpha ECs (patch.rs:165-168) — the token was
    never emitted before; select the second alpha EC."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(505)
    h = w = 32

    def planes():
        return [rng.integers(0, 256, (h, w), dtype=np.int64)
                for _ in range(5)]

    spec = dict(ref_idx=0, x0=2, y0=4, width=12, height=9, x=5, y=6,
                mode=mode, ec_modes=[mode, mode], alpha_channel=1,
                clamp=True)
    data = encode_jxl_modular(
        planes(), bit_depth=8, extra_alpha=True,
        extra_channel_specs=[dict(ty=0)],
        reference_patch=(planes(), spec),
    )
    _assert_match(data, FEAT_TOL)


def test_oracle_blend_with_spot_ec():
    """Animation blend chain whose only EC is a SpotColour: the frame
    header codes a BlendingInfo for EVERY extra channel (header.rs:75),
    not just alpha ones — the encoder previously dropped non-alpha EC
    entries in the blend branch (a wire desync)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(506)
    h = w = 24

    def fr():
        return [rng.integers(0, 256, (h, w), dtype=np.int64)
                for _ in range(4)]  # 3 color + spot

    data = encode_jxl_modular(
        fr(), bit_depth=8, spot_colour=(0.8, 0.2, 0.1, 0.7),
        animation_frames=[fr()],
        animation_blend={"mode": 2, "ec_mode": 1},  # Blend color, Add EC
    )
    _assert_match(data, FEAT_TOL)


def test_oracle_crop_negative_offsets():
    """Cropped frame placed partially above-left of the canvas
    (header.rs packed-signed frame x0/y0; blending intersects the frame
    rect with the image rect)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(503)
    chans = [rng.integers(0, 256, (12, 14), dtype=np.int64)
             for _ in range(3)]
    data = encode_jxl_modular(
        chans, bit_depth=8, image_size=(16, 20), crop=(-3, -2, 14, 12),
    )
    _assert_match(data, MOD_TOL)


def test_oracle_palette_negative_indices_no_deltas():
    """nb_deltas == 0 with negative (delta-palette) indices: the
    prediction pass still applies to every index < nb_deltas — found by
    tools/fuzz_diff.py (the oracle skipped the pass when nb_deltas == 0;
    transform/palette.rs:60 collects need_delta by `index < nb_deltas`
    unconditionally)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(46)
    ncol = 5
    pal = rng.integers(0, 256, (1, ncol), dtype=np.int64)
    idx = rng.integers(-3, ncol + 4, (24, 24))
    assert (idx < 0).any()
    data = encode_jxl_modular(
        [pal, idx], bit_depth=8, grayscale=True, image_size=(24, 24),
        palette_spec=dict(nb_colours=ncol, nb_deltas=0, d_pred=1),
    )
    _assert_match(data, MOD_TOL)


def test_oracle_default_alpha_ec_is_8bit():
    """16-bit color with a d_alpha default extra channel: the EC
    normalizes by ITS OWN declared depth (default 8-bit), not the color
    depth — found by tools/fuzz_diff.py (the oracle divided extras by
    the color scale; image.rs per-channel bit-depth normalization)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(75)
    h = w = 16
    chans = [rng.integers(0, 1 << 16, (h, w), dtype=np.int64)
             for _ in range(3)]
    chans.append(rng.integers(0, 256, (h, w), dtype=np.int64))
    data = encode_jxl_modular(chans, bit_depth=16, extra_alpha=True)
    _assert_match(data, MOD_TOL)


def test_differential_fuzz_smoke():
    """A short deterministic window of the generative differential
    fuzzer (tools/fuzz_diff.py): randomized valid streams across the
    oracle scope, production vs float64 oracle, zero mismatches."""
    import tempfile

    from fuzz_diff import run as fuzz_run

    with tempfile.TemporaryDirectory() as td:
        n, findings = fuzz_run(60.0, seed=1234, save_dir=Path(td),
                               max_iters=10)
    assert findings == 0, f"{findings} mismatches in {n} streams"
    # iterations include cold XLA compiles; on a loaded box only one may
    # finish inside the window — findings == 0 is the real assertion
    assert n >= 1


# ---------------------------------------------------------------------------
# Round-4 widened scope (VERDICT r3 item 4): features, EC scaling,
# multi-group and multi-pass frames through the float64 oracle.

FEAT_TOL = 2e-5


def test_oracle_noise():
    """Noise synthesis: integer XorShift128+ field (bit-exact by spec) +
    float convolution/LUT mixing, f64 oracle vs f32 production."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(11)
    base = [rng.integers(80, 176, (40, 40), dtype=np.int64) for _ in range(3)]
    lut = [0.0, 0.1, 0.2, 0.4, 0.5, 0.5, 0.6, 0.8]
    data = encode_jxl_modular(base, bit_depth=8, noise_lut=lut)
    _assert_match(data, FEAT_TOL)


def test_oracle_splines():
    """Catmull-Rom spline drawing (arc resampling, continuous IDCT, erf
    falloff) in the f64 oracle vs production."""
    from encoder import encode_jxl_modular

    h = w = 48
    base = [np.full((h, w), 100, dtype=np.int64) for _ in range(3)]
    xyb_dct = np.zeros((3, 32), dtype=np.int64)
    xyb_dct[:, 0] = [40, 70, 50]
    xyb_dct[1, 3] = 25
    sigma_dct = np.zeros(32, dtype=np.int64)
    sigma_dct[0] = 35
    spec = dict(points=[(8, 10), (25, 16), (40, 36)],
                xyb_dct=xyb_dct, sigma_dct=sigma_dct)
    data = encode_jxl_modular(base, bit_depth=8, splines_spec=([spec], 2))
    _assert_match(data, FEAT_TOL)


@pytest.mark.parametrize("mode", [1, 2, 4])
def test_oracle_patches(mode):
    """Patches from a ReferenceOnly frame: Replace / Add / BlendAbove
    blend modes through the oracle's ref-slot bookkeeping."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(13 + mode)
    base = [rng.integers(0, 256, (32, 32), dtype=np.int64) for _ in range(3)]
    ref = [rng.integers(0, 256, (32, 32), dtype=np.int64) for _ in range(3)]
    spec = dict(ref_idx=0, x0=2, y0=4, width=12, height=9, x=5, y=6,
                mode=mode)
    data = encode_jxl_modular(base, bit_depth=8,
                              reference_patch=(ref, spec))
    _assert_match(data, FEAT_TOL)


def test_oracle_spot_colors():
    """SpotColour EC compositing onto the color planes."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(17)
    color = [rng.integers(0, 256, (24, 24), dtype=np.int64) for _ in range(3)]
    spot = rng.integers(0, 256, (24, 24), dtype=np.int64)
    data = encode_jxl_modular(
        color + [spot], bit_depth=8,
        spot_colour=(0.8, 0.2, 0.1, 0.9),
    )
    _assert_match(data, FEAT_TOL)


def test_oracle_ec_dim_shift():
    """Extra channel coded at dim_shift-reduced resolution and upsampled
    with the non-separable up2 kernels (f64 reimplementation)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(19)
    h = w = 64
    color = [rng.integers(0, 256, (h, w), dtype=np.int64) for _ in range(3)]
    alpha = rng.integers(0, 256, (h >> 2, w >> 2), dtype=np.int64)
    data = encode_jxl_modular(
        color + [alpha], bit_depth=8, extra_alpha=True, alpha_dim_shift=2,
    )
    _assert_match(data, FEAT_TOL)


@pytest.mark.parametrize("kw", [
    dict(upsampling=2),
    dict(upsampling=8),
    dict(upsampling=2, gabor=True),
    dict(upsampling=2, epf_iters=2),
    dict(upsampling=4, gabor=True, epf_iters=1),
])
def test_oracle_frame_upsampling(kw):
    """Frame upsampling (fh.upsampling > 1): channels decode at sample
    resolution, restoration filters run at sample resolution, then the
    non-separable kernel upsamples to full size (render.rs:149; round-5
    widening, VERDICT r4 item 4 — the class fuzz seed rct_zero_sized
    exercises)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(31)
    u = kw["upsampling"]
    H = W = 64
    hs = -(-H // u)
    chans = [rng.integers(0, 256, (hs, hs), dtype=np.int64)
             for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8, image_size=(H, W), **kw)
    _assert_match(data, FEAT_TOL)


def test_oracle_modular_do_ycbcr():
    """do_ycbcr modular frame (4:4:4): channels carry YCbCr samples,
    BT.601 conversion after filters/features (round-5 widening — the
    class fuzz seed upsample_separate_ec exercises together with
    upsampling and per-EC blending)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(37)
    chans = [rng.integers(0, 256, (24, 24), dtype=np.int64)
             for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8, do_ycbcr=True)
    _assert_match(data, FEAT_TOL)


def test_oracle_upsampling_with_features():
    """Features render at SAMPLE resolution in full-res coordinates
    before upsampling (render.rs:138-149): splines and noise on an
    upsampling=2 frame (the production ordering fix of round 5)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(41)
    H = W = 64
    base = [rng.integers(60, 196, (32, 32), dtype=np.int64)
            for _ in range(3)]
    xyb_dct = np.zeros((3, 32), dtype=np.int64)
    xyb_dct[:, 0] = (40, 30, 20)
    sigma_dct = np.zeros(32, dtype=np.int64)
    sigma_dct[0] = 30
    spec = dict(points=[(6, 8), (20, 12), (30, 28)],
                xyb_dct=xyb_dct, sigma_dct=sigma_dct)
    data = encode_jxl_modular(
        base, bit_depth=8, image_size=(H, W), upsampling=2,
        splines_spec=([spec], 2),
        noise_lut=[0.2, 0.3, 0.4, 0.5, 0.5, 0.4, 0.3, 0.2],
    )
    _assert_match(data, FEAT_TOL)


@pytest.mark.parametrize("ec_up", [2, 4])
def test_oracle_upsampling_ec(ec_up):
    """EC channels under frame upsampling: stored shift is
    log2(ec_upsampling) + dim_shift - log2(upsampling) relative to
    sample resolution; one-shot upsample by the FULL EC factor when no
    patches are present (render.rs:110-118)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(43)
    H = W = 64
    u = 2
    hs = H // u
    rel = ec_up // u
    chans = [rng.integers(0, 256, (hs, hs), dtype=np.int64)
             for _ in range(3)]
    alpha = rng.integers(0, 256, (hs // rel, hs // rel), dtype=np.int64)
    data = encode_jxl_modular(
        chans + [alpha], bit_depth=8, image_size=(H, W), upsampling=u,
        extra_alpha=True, ec_upsampling=[ec_up],
    )
    _assert_match(data, FEAT_TOL)


def test_oracle_patches_two_stage_ec():
    """Patches + dim-shifted EC: the EC plane upsamples to COLOR
    resolution before patch blending and by the remaining frame factor
    afterwards (image.rs:487-513 ec_to_color_only; two-stage kernels
    differ numerically from a one-shot upsample)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(47)
    h = w = 32
    base = [rng.integers(0, 256, (h, w), dtype=np.int64)
            for _ in range(3)]
    alpha = rng.integers(0, 256, (h >> 1, w >> 1), dtype=np.int64)
    # the ReferenceOnly frame codes the EC channel too (at its shift)
    ref = [rng.integers(0, 256, (h, w), dtype=np.int64) for _ in range(3)]
    ref_alpha = rng.integers(0, 256, (h >> 1, w >> 1), dtype=np.int64)
    spec = dict(ref_idx=0, x0=2, y0=4, width=10, height=8, x=5, y=6,
                mode=1)
    data = encode_jxl_modular(
        base + [alpha], bit_depth=8, extra_alpha=True, alpha_dim_shift=1,
        reference_patch=(ref + [ref_alpha], spec),
    )
    _assert_match(data, FEAT_TOL)


@pytest.mark.parametrize("np_,shifts,ds", [
    (3, [2, 1], [(2, 0)]),          # 3 passes, downsample 2 thru pass 0
    (3, [3, 1], [(4, 0), (2, 1)]),  # two ds entries
    (4, [3, 2, 1], [(8, 0)]),       # 4 passes
])
def test_oracle_pass_progressive(np_, shifts, ds):
    """>= 3 quality-progressive passes with downsample>1 entries
    (hf_coeff.rs:228-236 coeff_shift accumulation across multiple
    boundaries; header.rs Passes lists) — full decode must accumulate
    all passes bit-exactly (VERDICT r4 item 8)."""
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(500 + np_)
    rgb = rng.random((64, 64, 3)).astype(np.float32)
    data = encode_jxl_vardct(
        rgb, num_passes=np_, pass_shifts=shifts, pass_downsample=ds,
        gabor=True, epf_iters=1,
    )
    _assert_match(data, VARDCT_TOL)


def test_oracle_cropped_frame():
    """have_crop frames composite at (x0, y0) on the image-sized canvas
    (header.rs crop fields; the round-5 per-channel blend-source
    _composite rewrite made offset placement oracle-expressible)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(800)
    chans = [rng.integers(0, 256, (12, 16), dtype=np.int64)
             for _ in range(3)]
    data = encode_jxl_modular(
        chans, bit_depth=8, image_size=(24, 32), crop=(5, 3, 16, 12),
    )
    _assert_match(data, MOD_TOL)


def test_oracle_preview_frame():
    """Streams with a preview frame: the preview precedes frame 0 with
    its own header coding (no duration/is_last) and is skipped
    (lib.rs:384-411)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(801)
    chans = [rng.integers(0, 256, (24, 24), dtype=np.int64)
             for _ in range(3)]
    pv = [rng.integers(0, 256, (8, 8), dtype=np.int64) for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8, preview_channels=pv)
    _assert_match(data, MOD_TOL)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(squeeze=True),
    dict(rct=True),
])
def test_oracle_modular_xyb(kw):
    """Lossless-XYB modular streams (xyb_encoded + Modular encoding):
    stream order [y, x, b], b += y, m/128 scaling (convert_modular_xyb,
    image.rs:148-188), XYB->sRGB tail after features/upsampling — the
    oracle's independent f64 leg vs production (round-5 widening)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(700)
    chans = [rng.integers(0, 256, (32, 40), dtype=np.int64)
             for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8, xyb=True, **kw)
    _assert_match(data, FEAT_TOL)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(gabor=True, epf_iters=2),
    dict(num_passes=2),
    dict(xyb=True),
])
def test_oracle_vardct_extra_channel(kw):
    """VarDCT frames WITH extra channels (lossy + alpha — the class the
    round-4 corpus seed squeeze_tendency_overflow exposed as an oracle
    gap): the modular EC image parses its header + global channels
    inside LfGlobal and its group streams inside the VarDCT sections
    (lf_global.rs GlobalModular, lf_group.rs / pass_group.rs order)."""
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(600)
    rgb = rng.random((64, 64, 3)).astype(np.float32)
    alpha = rng.integers(0, 256, (64, 64))
    data = encode_jxl_vardct(rgb, alpha=alpha, **kw)
    _assert_match(data, VARDCT_TOL)


def test_oracle_vardct_alpha_subsampled():
    """4:2:0 chroma-subsampled VarDCT + full-res alpha: the JPEG-
    transcode shape with transparency — per-channel stored-geometry
    color pipelines compose with the EC's modular substreams."""
    from encoder_vardct import encode_jxl_vardct_tiled

    from jxl_oxide_tpu.models.vardct import TransformType as T, jpeg_shifts

    rng = np.random.default_rng(620)
    ups, h, w = (0, 1, 0), 512, 256
    bh, bw = h // 8, w // 8
    shifts = jpeg_shifts(ups)
    sel = np.full((bh, bw), int(T.DCT8), dtype=np.int64)
    mul = np.ones((bh, bw), dtype=np.int64)
    coeff, lf_q = [], []
    for c in range(3):
        hs, vs = shifts[c]
        sh = (h >> vs, w >> hs)
        cp = np.zeros(sh, dtype=np.int64)
        m = rng.random(sh) < 0.2
        cp[m] = rng.integers(-9, 10, int(m.sum()))
        coeff.append(cp)
        lf_q.append(
            rng.integers(-30, 31, (bh >> vs, bw >> hs)).astype(np.int64)
        )
    alpha = rng.integers(0, 256, (h, w))
    data = encode_jxl_vardct_tiled(
        h, w, sel, mul, coeff, lf_q, gabor=True, epf_iters=1,
        jpeg_upsampling=ups, alpha=alpha,
    )
    _assert_match(data, VARDCT_TOL)


@pytest.mark.parametrize("np_", [1, 2])
def test_oracle_vardct_extra_channel_multigroup(np_):
    """MULTI-GROUP VarDCT + alpha: the EC's per-group modular substreams
    sit after the HF tokens inside each last-pass group section
    (pass_group.rs:139) and decode through the native HF batch's
    returned bit positions — the first real-data coverage of that
    production path."""
    from encoder_vardct import encode_jxl_vardct_tiled

    from jxl_oxide_tpu.models.vardct import TransformType as T

    rng = np.random.default_rng(610 + np_)
    h = w = 512
    bh, bw = h // 8, w // 8
    sel = np.full((bh, bw), int(T.DCT8), dtype=np.int64)
    mul = np.ones((bh, bw), dtype=np.int64)
    coeff = rng.integers(-9, 10, (3, h, w)).astype(np.int64)
    coeff[rng.random((3, h, w)) < 0.7] = 0
    lf_q = rng.integers(-40, 41, (3, bh, bw)).astype(np.int64)
    alpha = rng.integers(0, 256, (h, w))
    data = encode_jxl_vardct_tiled(
        h, w, sel, mul, coeff, lf_q, gabor=True, epf_iters=1,
        alpha=alpha, num_passes=np_,
    )
    _assert_match(data, VARDCT_TOL)


@pytest.mark.parametrize("o", list(range(2, 9)))
def test_oracle_orientation(o):
    """EXIF orientations 2-8 through the oriented public surface
    (fb.rs:171-409) vs the oracle's independent index-map formulation —
    modular (with an EC) and VarDCT legs (VERDICT r4 item 4)."""
    from encoder import encode_jxl_modular
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(300 + o)
    chans = [rng.integers(0, 256, (12, 18), dtype=np.int64)
             for _ in range(3)]
    alpha = rng.integers(0, 256, (12, 18), dtype=np.int64)
    _assert_match(
        encode_jxl_modular(chans + [alpha], bit_depth=8, orientation=o,
                           extra_alpha=True),
        MOD_TOL,
    )
    rgb = rng.random((24, 40, 3)).astype(np.float32)
    _assert_match(
        encode_jxl_vardct(rgb, gabor=True, epf_iters=1, orientation=o),
        VARDCT_TOL,
    )


@pytest.mark.parametrize("bits,exp", [(16, 5), (32, 8), (20, 6)])
def test_oracle_float_sample_ec(bits, exp):
    """Float-sample extra channels (BitDepth float form, jxl-image
    lib.rs:427-470): the stored integers reinterpret as sign/exp/
    mantissa floats — production vs the oracle's independent f64
    reimplementation (VERDICT r4 item 4)."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(51)
    h = w = 24
    color = [rng.integers(0, 256, (h, w), dtype=np.int64)
             for _ in range(3)]
    if bits == 16:
        vals = np.float16(rng.random((h, w))).view(np.uint16)
        ec = vals.astype(np.int64)
    elif bits == 32:
        vals = np.float32(rng.random((h, w))).view(np.uint32)
        ec = vals.astype(np.int64)
    else:
        # arbitrary (bits, exp): synthesize valid patterns directly
        m = bits - exp - 1
        ec = (
            (rng.integers(0, 2, (h, w)) << (bits - 1))
            | (rng.integers(1, (1 << exp) - 1, (h, w)) << m)
            | rng.integers(0, 1 << m, (h, w))
        ).astype(np.int64)
    data = encode_jxl_modular(
        color + [ec], bit_depth=8,
        extra_channel_specs=[dict(ty=1, bits=bits, float_exp_bits=exp)],
    )
    _assert_match(data, MOD_TOL)


def test_oracle_multi_group_modular():
    """Multi-group modular frame: per-(pass x group) sub-streams with the
    image.rs channel splitting, decoded group by group by the oracle."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(23)
    h, w = 300, 280  # > group_dim 256: 2x2 groups
    base = [rng.integers(0, 256, (h, w), dtype=np.int64) for _ in range(3)]
    data = encode_jxl_modular(base, bit_depth=8)
    _assert_match(data, MOD_TOL)


def test_oracle_multi_group_modular_rct_squeeze():
    """Multi-group + RCT + squeeze: squeezed channels route to LF-group
    and pass-group streams by their shifts."""
    from encoder import encode_jxl_modular

    rng = np.random.default_rng(29)
    h = w = 320
    base = [rng.integers(0, 256, (h, w), dtype=np.int64) for _ in range(3)]
    data = encode_jxl_modular(base, bit_depth=8, rct=True, squeeze=True)
    _assert_match(data, MOD_TOL)


def test_oracle_multi_group_vardct():
    """Multi-group VarDCT: per-group HF coefficient sections decode into
    the oracle's frame-wide planes (write_hf_coeff on group slices)."""
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(31)
    rgb = rng.random((512, 384, 3)).astype(np.float32)
    data = encode_jxl_vardct(rgb, gabor=True, epf_iters=1)
    _assert_match(data, VARDCT_TOL)


def test_oracle_vardct_two_pass_multi_group():
    """2-pass progressive multi-group VarDCT: coefficients accumulate
    across per-(pass, group) sections."""
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(37)
    rgb = rng.random((384, 512, 3)).astype(np.float32)
    data = encode_jxl_vardct(rgb, num_passes=2)
    _assert_match(data, VARDCT_TOL)
