"""Generative differential fuzzer: production decoder vs the independent
float64 oracle.

Where tools/fuzz.py mutates bytes and only checks robustness (decode or
raise JxlError), this fuzzer generates VALID bitstreams with randomized
structure across the oracle's scope — modular predictor/RCT/squeeze/
palette/LZ77 stacks, VarDCT tilings over the full transform zoo with CfL
grids and restoration filters, blending chains — and asserts the
production pipeline (fused XLA programs, dense transform plans, native
C++ host runtime, fast-path dispatch) matches tests/oracle_decoder.py,
whose numeric stages share no code with production (conformance-corpus
substitute; jxl-oxide-tests/tests/conformance/mod.rs:33-137).

Usage:
  python tools/fuzz_diff.py [--seconds 60] [--seed 0] [--save-dir DIR]

Mismatches save the stream + generating config to --save-dir (default
tests/fuzz_found/) for replay.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))
sys.path.insert(0, str(ROOT / "tests"))

MOD_TOL = 1e-6
VARDCT_TOL = 2e-4

# few distinct shapes so the fused-program jit cache is reused across
# iterations (compiles dominate otherwise)
MOD_DIMS = (16, 24, 32)
VARDCT_DIMS = (64, 96)


def gen_modular(rng) -> tuple[bytes, float, dict]:
    from encoder import encode_jxl_modular

    h = int(rng.choice(MOD_DIMS))
    w = int(rng.choice(MOD_DIMS))
    bits = int(rng.choice([8, 8, 16]))
    hi = 1 << bits
    cfg: dict = {"kind": "modular", "h": h, "w": w, "bit_depth": bits}
    kw: dict = {"bit_depth": bits}
    style = int(rng.integers(0, 6))
    cfg["style"] = style
    if style == 0:  # gradient, optionally 16-bit
        chans = [rng.integers(0, hi, (h, w), dtype=np.int64) for _ in range(3)]
    elif style == 1:  # weighted predictor
        kw["predictor"] = 6
        chans = [rng.integers(0, hi, (h, w), dtype=np.int64) for _ in range(3)]
    elif style == 2:  # RCT, random type
        kw["rct"] = True
        kw["rct_type"] = int(rng.integers(0, 42))
        cfg["rct_type"] = kw["rct_type"]
        chans = [rng.integers(0, hi, (h, w), dtype=np.int64) for _ in range(3)]
    elif style == 3:  # squeeze stack, optionally + RCT
        kw["squeeze"] = True
        if rng.random() < 0.5:
            kw["rct"] = True
        chans = [rng.integers(0, hi, (h, w), dtype=np.int64) for _ in range(3)]
    elif style == 4:  # LZ77 (RLE runs or general 2-D matches)
        if rng.random() < 0.5:
            kw["lz77_rle"] = True
            chans = [
                np.repeat(rng.integers(0, 4, (h, max(1, w // 8))), 8, 1)[:, :w]
                for _ in range(3)
            ]
        else:
            kw["lz77_matches"] = True
            chans = [
                np.tile(rng.integers(0, hi, (4, w)), (-(-h // 4), 1))[:h]
                for _ in range(3)
            ]
    else:  # blending chain, optional alpha
        alpha = bool(rng.random() < 0.5)
        kw["extra_alpha"] = alpha
        if alpha and rng.random() < 0.3:
            kw["extra_alpha_associated"] = True  # premultiplied blend leg
        r = rng.random()
        if r < 0.35:
            kw["animation_blend"] = False
        elif r < 0.65:
            kw["animation_blend"] = True  # Blend(2)
        else:
            # Add / MulAdd / Mul with a random clamp flag — the modes
            # only reachable through the round-5 encoder widening
            kw["animation_blend"] = {
                "mode": int(rng.choice([1, 2, 3, 4])),
                "clamp": bool(rng.random() < 0.5),
            }
            if rng.random() < 0.4:
                # EC blending mode decoupled from the color mode
                kw["animation_blend"]["ec_mode"] = int(
                    rng.choice([1, 2, 3, 4]))
        n = 3 + (1 if alpha else 0)

        def fr():
            # the d_alpha default EC is 8-bit regardless of color depth:
            # keep alpha samples in ITS declared range (out-of-range
            # alpha compounds through MixAlpha into huge values)
            chans = [rng.integers(0, hi, (h, w), dtype=np.int64)
                     for _ in range(3)]
            if alpha:
                chans.append(rng.integers(0, 256, (h, w), dtype=np.int64))
            return chans

        chans = fr()
        kw["animation_frames"] = [fr() for _ in range(int(rng.integers(1, 4)))]
        cfg["frames"] = len(kw["animation_frames"])
    cfg["kw"] = {k: v for k, v in kw.items() if k != "animation_frames"}
    return encode_jxl_modular(chans, **kw), MOD_TOL, cfg


def gen_palette(rng) -> tuple[bytes, float, dict]:
    from encoder import encode_jxl_modular

    ncol = int(rng.integers(2, 12))
    ndelta = int(rng.integers(0, 4))
    dpred = int(rng.integers(0, 7))
    h = w = int(rng.choice(MOD_DIMS))
    pal = rng.integers(0, 256, (1, ncol), dtype=np.int64)
    idx = rng.integers(-ndelta - 1, ncol + 4, (h, w))
    cfg = {"kind": "palette", "ncol": ncol, "ndelta": ndelta,
           "d_pred": dpred, "h": h}
    data = encode_jxl_modular(
        [pal, idx], bit_depth=8, grayscale=True, image_size=(h, w),
        palette_spec=dict(nb_colours=ncol, nb_deltas=ndelta, d_pred=dpred),
    )
    return data, MOD_TOL, cfg


def gen_vardct(rng) -> tuple[bytes, float, dict]:
    from encoder_vardct import encode_jxl_vardct, encode_jxl_vardct_mixed
    from test_parallel import _random_varblock_grid

    from jxl_oxide_tpu.models.vardct import TransformType as T

    h = w = int(rng.choice(VARDCT_DIMS))
    if rng.random() < 0.4:  # natural-content path through the encoder
        kw = dict(
            gabor=bool(rng.random() < 0.5),
            epf_iters=int(rng.integers(0, 4)),
            num_passes=int(rng.choice([1, 1, 2, 3])),
            xyb=bool(rng.random() < 0.5),
        )
        rgb = rng.random((h, w, 3)).astype(np.float32)
        return encode_jxl_vardct(rgb, **kw), VARDCT_TOL, {
            "kind": "vardct", "h": h, **kw}
    bh, bw = h // 8, w // 8
    types = [
        T.DCT8, T.HORNUSS, T.DCT2, T.DCT4, T.DCT16, T.DCT32,
        T.DCT16X8, T.DCT8X16, T.DCT4X8, T.DCT8X4,
        T.AFV0, T.AFV1, T.AFV2, T.AFV3, T.DCT32X16, T.DCT16X32,
    ]
    sel, mul = _random_varblock_grid(bh, bw, rng, types)
    coeff = rng.integers(-20, 21, (3, h, w)).astype(np.int64)
    coeff[rng.random((3, h, w)) < float(rng.uniform(0.3, 0.9))] = 0
    lf_q = rng.integers(-80, 81, (3, bh, bw)).astype(np.int64)
    h64, w64 = -(-h // 64), -(-w // 64)
    cfl = (
        rng.integers(-40, 41, (h64, w64)).astype(np.int64),
        rng.integers(-40, 41, (h64, w64)).astype(np.int64),
    )
    ep = int(rng.integers(0, 4))
    data = encode_jxl_vardct_mixed(
        h, w, sel, mul, coeff, lf_q, cfl_grids=cfl,
        lf_chan_corr=(84, 0.1, 0.8, 130, 125),
        extra_precision=ep,
    )
    return data, VARDCT_TOL, {"kind": "vardct_mixed", "h": h,
                              "extra_precision": ep}


FEAT_TOL = 2e-5


def gen_widened(rng) -> tuple[bytes, float, dict]:
    """Round-5 widened classes (VERDICT r4 item 4): EXIF orientation
    2-8, frame upsampling 2/4/8 (features stay at sample resolution),
    do_ycbcr modular, float-sample ECs, ec_upsampling combinations."""
    from encoder import encode_jxl_modular
    from encoder_vardct import encode_jxl_vardct

    style = int(rng.integers(0, 7))
    if style == 6:  # cropped frames / preview frames
        from encoder import encode_jxl_modular as _ej

        if rng.random() < 0.5:
            H, W = 24, 32
            cw, ch_ = int(rng.integers(4, 20)), int(rng.integers(4, 16))
            # negative offsets place the frame partially above/left of
            # the canvas (header.rs packed-signed x0/y0)
            x0 = int(rng.integers(-4, W - cw + 4))
            y0 = int(rng.integers(-4, H - ch_ + 4))
            chans = [rng.integers(0, 256, (ch_, cw), dtype=np.int64)
                     for _ in range(3)]
            data = _ej(chans, bit_depth=8, image_size=(H, W),
                       crop=(x0, y0, cw, ch_))
            return data, MOD_TOL, {"kind": "crop", "rect": (x0, y0, cw, ch_)}
        h, w = int(rng.choice(MOD_DIMS)), int(rng.choice(MOD_DIMS))
        chans = [rng.integers(0, 256, (h, w), dtype=np.int64)
                 for _ in range(3)]
        pv = [rng.integers(0, 256, (8, 8), dtype=np.int64)
              for _ in range(3)]
        data = _ej(chans, bit_depth=8, preview_channels=pv)
        return data, MOD_TOL, {"kind": "preview", "h": h}
    if style == 5:  # lossless-XYB modular
        h, w = int(rng.choice(MOD_DIMS)), int(rng.choice(MOD_DIMS))
        chans = [rng.integers(0, 256, (h, w), dtype=np.int64)
                 for _ in range(3)]
        kw = {}
        if rng.random() < 0.4:
            kw["squeeze"] = True
        elif rng.random() < 0.5:
            kw["rct"] = True
        data = encode_jxl_modular(chans, bit_depth=8, xyb=True, **kw)
        return data, FEAT_TOL, {"kind": "modular_xyb", "h": h, **kw}
    if style == 4:  # VarDCT + alpha EC (lossy + transparency)
        h = w = int(rng.choice([64, 96]))
        rgb = rng.random((h, w, 3)).astype(np.float32)
        alpha = rng.integers(0, 256, (h, w))
        kw = dict(
            gabor=bool(rng.random() < 0.5),
            epf_iters=int(rng.integers(0, 3)),
            num_passes=int(rng.choice([1, 1, 2])),
            xyb=bool(rng.random() < 0.5),
        )
        data = encode_jxl_vardct(rgb, alpha=alpha, **kw)
        return data, VARDCT_TOL, {"kind": "vardct_alpha", "h": h, **kw}
    if style == 0:  # orientation, modular or vardct
        o = int(rng.integers(2, 9))
        if rng.random() < 0.5:
            h, w = int(rng.choice(MOD_DIMS)), int(rng.choice(MOD_DIMS))
            chans = [rng.integers(0, 256, (h, w), dtype=np.int64)
                     for _ in range(3)]
            kw = {}
            if rng.random() < 0.5:
                kw["extra_alpha"] = True
                chans.append(rng.integers(0, 256, (h, w), dtype=np.int64))
            data = encode_jxl_modular(chans, bit_depth=8, orientation=o,
                                      **kw)
            return data, MOD_TOL, {"kind": "orientation", "o": o,
                                   "enc": "modular", **kw}
        h = w = int(rng.choice(VARDCT_DIMS))
        rgb = rng.random((h, w, 3)).astype(np.float32)
        data = encode_jxl_vardct(
            rgb, orientation=o, gabor=bool(rng.random() < 0.5),
            epf_iters=int(rng.integers(0, 3)),
        )
        return data, VARDCT_TOL, {"kind": "orientation", "o": o,
                                  "enc": "vardct", "h": h}
    if style == 1:  # frame upsampling (+ optional filters/features/ECs)
        u = int(rng.choice([2, 2, 4, 8]))
        H = W = int(rng.choice([32, 64]))
        hs = -(-H // u)
        chans = [rng.integers(0, 256, (hs, hs), dtype=np.int64)
                 for _ in range(3)]
        kw: dict = dict(upsampling=u, image_size=(H, W))
        cfg = {"kind": "upsampling", "u": u, "H": H}
        r = rng.random()
        if r < 0.3:
            kw["gabor"] = True
            kw["epf_iters"] = int(rng.integers(0, 3))
        elif r < 0.5:
            kw["noise_lut"] = list(rng.uniform(0, 0.6, 8))
        elif r < 0.7 and u <= (1 << 3):
            ec_up = int(rng.choice([v for v in (2, 4, 8) if v >= u]))
            rel = ec_up // u
            kw["extra_alpha"] = True
            kw["ec_upsampling"] = [ec_up]
            chans.append(rng.integers(
                0, 256, (-(-hs // rel), -(-hs // rel)), dtype=np.int64))
            cfg["ec_up"] = ec_up
        cfg["kw"] = {k: v for k, v in kw.items() if k != "image_size"}
        return encode_jxl_modular(chans, bit_depth=8, **kw), FEAT_TOL, cfg
    if style == 2:  # do_ycbcr modular (4:4:4)
        h, w = int(rng.choice(MOD_DIMS)), int(rng.choice(MOD_DIMS))
        chans = [rng.integers(0, 256, (h, w), dtype=np.int64)
                 for _ in range(3)]
        data = encode_jxl_modular(chans, bit_depth=8, do_ycbcr=True)
        return data, FEAT_TOL, {"kind": "ycbcr_modular", "h": h, "w": w}
    # float-sample EC
    bits, exp = [(16, 5), (32, 8), (20, 6)][int(rng.integers(0, 3))]
    h = w = int(rng.choice(MOD_DIMS))
    color = [rng.integers(0, 256, (h, w), dtype=np.int64)
             for _ in range(3)]
    if bits == 16:
        ec = np.float16(rng.random((h, w))).view(np.uint16).astype(np.int64)
    elif bits == 32:
        ec = np.float32(rng.random((h, w))).view(np.uint32).astype(np.int64)
    else:
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
    return data, MOD_TOL, {"kind": "float_ec", "bits": bits, "exp": exp}


def gen_features(rng) -> tuple[bytes, float, dict]:
    """Round-4 widened classes (VERDICT r3 item 4): noise, splines,
    patches (ref slots + blend modes), spot colors, EC dim_shift."""
    from encoder import encode_jxl_modular

    style = int(rng.integers(0, 5))
    h = w = int(rng.choice((32, 48)))
    cfg: dict = {"kind": "features", "style": style, "h": h}
    base = [rng.integers(0, 256, (h, w), dtype=np.int64) for _ in range(3)]
    if style == 0:  # noise
        lut = [float(rng.uniform(0.0, 1.0)) for _ in range(8)]
        # smooth mid-range base keeps the noise LUT interpolation in its
        # well-conditioned region (as real photos do)
        base = [rng.integers(64, 192, (h, w), dtype=np.int64)
                for _ in range(3)]
        cfg["lut"] = lut
        data = encode_jxl_modular(base, bit_depth=8, noise_lut=lut)
        return data, FEAT_TOL, cfg
    if style == 1:  # splines
        xyb_dct = np.zeros((3, 32), dtype=np.int64)
        xyb_dct[:, 0] = rng.integers(20, 90, 3)
        xyb_dct[1, int(rng.integers(1, 6))] = int(rng.integers(-30, 31))
        sigma_dct = np.zeros(32, dtype=np.int64)
        sigma_dct[0] = int(rng.integers(10, 60))
        pts = [(int(rng.integers(2, w - 2)), int(rng.integers(2, h - 2)))
               for _ in range(int(rng.integers(2, 5)))]
        # consecutive control points must differ
        pts = [p for i, p in enumerate(pts) if i == 0 or p != pts[i - 1]]
        spec = dict(points=pts, xyb_dct=xyb_dct, sigma_dct=sigma_dct)
        qa = int(rng.integers(-4, 5))
        cfg["spline"] = {"points": pts, "qa": qa}
        data = encode_jxl_modular(base, bit_depth=8,
                                  splines_spec=([spec], qa))
        return data, FEAT_TOL, cfg
    if style == 2:  # patches (full PatchBlendMode set, optional alpha)
        with_alpha = bool(rng.random() < 0.5)
        ref = [rng.integers(0, 256, (h, w), dtype=np.int64)
               for _ in range(3)]
        # alpha-dependent modes (4-7) only matter with an alpha EC
        mode = int(rng.choice([0, 1, 2, 3, 4, 5, 6, 7] if with_alpha
                              else [0, 1, 2, 3]))
        spec = dict(
            ref_idx=0,
            x0=int(rng.integers(0, w // 2)), y0=int(rng.integers(0, h // 2)),
            width=int(rng.integers(4, w // 2)),
            height=int(rng.integers(4, h // 2)),
            x=int(rng.integers(0, w // 2)), y=int(rng.integers(0, h // 2)),
            mode=mode, clamp=bool(rng.random() < 0.5),
        )
        kw: dict = {}
        if with_alpha:
            n_alpha = 2 if rng.random() < 0.3 else 1
            spec["ec_modes"] = [int(rng.choice([0, 1, 2, 3, 4, 5, 6, 7]))
                                for _ in range(n_alpha)]
            for _ in range(n_alpha):
                base = base + [rng.integers(0, 256, (h, w), dtype=np.int64)]
                ref = ref + [rng.integers(0, 256, (h, w), dtype=np.int64)]
            kw["extra_alpha"] = True
            if n_alpha == 2:
                # second alpha EC: the per-entry alpha-channel token
                # becomes live for modes >= 4 (patch.rs:165-168)
                kw["extra_channel_specs"] = [dict(ty=0)]
                spec["alpha_channel"] = int(rng.integers(0, 2))
        cfg["patch"] = spec
        data = encode_jxl_modular(base, bit_depth=8,
                                  reference_patch=(ref, spec), **kw)
        return data, FEAT_TOL, cfg
    if style == 3:  # spot color EC
        spot = rng.integers(0, 256, (h, w), dtype=np.int64)
        rgbs = tuple(float(rng.uniform(0, 1)) for _ in range(4))
        cfg["spot"] = rgbs
        data = encode_jxl_modular(base + [spot], bit_depth=8,
                                  spot_colour=rgbs)
        return data, FEAT_TOL, cfg
    # style 4: EC dim_shift (alpha coded at reduced resolution)
    shift = int(rng.choice([1, 2, 3]))
    alpha = rng.integers(0, 256, (h >> shift, w >> shift), dtype=np.int64)
    cfg["dim_shift"] = shift
    data = encode_jxl_modular(base + [alpha], bit_depth=8,
                              extra_alpha=True, alpha_dim_shift=shift)
    return data, FEAT_TOL, cfg


def gen_multigroup(rng) -> tuple[bytes, float, dict]:
    """Multi-group frames (both codecs) + 2-pass multi-group VarDCT."""
    if rng.random() < 0.5:
        from encoder import encode_jxl_modular

        # include take_while geometries where a squeezed avg/res channel
        # fits the LfGlobal stream while full channels split into groups
        h = int(rng.choice((280, 300, 192, 256)))
        w = int(rng.choice((264, 288, 257, 400)))
        kw = {}
        if rng.random() < 0.4:
            kw["rct"] = True
        if rng.random() < 0.4:
            kw["squeeze"] = True
        chans = [rng.integers(0, 256, (h, w), dtype=np.int64)
                 for _ in range(3)]
        cfg = {"kind": "multigroup_modular", "h": h, "w": w, **kw}
        return encode_jxl_modular(chans, bit_depth=8, **kw), MOD_TOL, cfg
    from encoder_vardct import encode_jxl_vardct

    h = int(rng.choice((384, 512)))
    w = int(rng.choice((320, 384)))
    kw = dict(
        gabor=bool(rng.random() < 0.5),
        epf_iters=int(rng.integers(0, 3)),
        num_passes=int(rng.choice([1, 2])),
    )
    if rng.random() < 0.35:  # LF (DC) frame chain
        kw["use_lf_frame"] = True
        kw["lf_levels"] = int(rng.choice([1, 2]))
        kw["num_passes"] = 1
        kw["global_scale"] = 65536
        kw["xyb"] = bool(rng.random() < 0.5)
    elif rng.random() < 0.4:
        # multigroup + alpha: EC substreams inside last-pass sections
        from encoder_vardct import encode_jxl_vardct_tiled

        from jxl_oxide_tpu.models.vardct import TransformType as _T

        bh, bw = h // 8, w // 8
        sel = np.full((bh, bw), int(_T.DCT8), dtype=np.int64)
        mul = np.ones((bh, bw), dtype=np.int64)
        coeff = rng.integers(-9, 10, (3, h, w)).astype(np.int64)
        coeff[rng.random((3, h, w)) < 0.7] = 0
        lf_q = rng.integers(-40, 41, (3, bh, bw)).astype(np.int64)
        am = rng.integers(0, 256, (h, w))
        cfg = {"kind": "multigroup_vardct_alpha", "h": h, "w": w,
               "num_passes": kw["num_passes"]}
        return (encode_jxl_vardct_tiled(
            h, w, sel, mul, coeff, lf_q, gabor=kw["gabor"],
            epf_iters=kw["epf_iters"], alpha=am,
            num_passes=kw["num_passes"],
        ), VARDCT_TOL, cfg)
    rgb = rng.random((h, w, 3)).astype(np.float32)
    cfg = {"kind": "multigroup_vardct", "h": h, "w": w, **kw}
    return encode_jxl_vardct(rgb, **kw), VARDCT_TOL, cfg


def gen_subsampled(rng) -> tuple[bytes, float, dict]:
    """Chroma-subsampled do_ycbcr VarDCT (4:2:0/4:2:2/4:4:0): single-group
    via encode_jxl_vardct_420, or multi-group tiled with random occupied
    check cells (the pass-group-local shifted-anchor rule)."""
    from encoder_vardct import encode_jxl_vardct_420, encode_jxl_vardct_tiled

    from jxl_oxide_tpu.models.vardct import TransformType as T, jpeg_shifts

    ups = ((0, 1, 0), (0, 2, 0), (0, 3, 0))[int(rng.integers(0, 3))]
    shifts = jpeg_shifts(ups)

    def planes(h, w, density):
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

    density = float(rng.uniform(0.05, 0.3))
    if rng.random() < 0.6:  # single group
        h = int(rng.choice((32, 64, 96)))
        w = int(rng.choice((32, 48, 64)))
        kw = dict(
            gabor=bool(rng.random() < 0.5),
            epf_iters=int(rng.integers(0, 3)),
        )
        coeff, lf_q = planes(h, w, density)
        cfg = {"kind": "subsampled", "ups": ups, "h": h, "w": w, **kw}
        return (encode_jxl_vardct_420(h, w, coeff, lf_q, 4096,
                                      jpeg_upsampling=ups, **kw),
                VARDCT_TOL, cfg)
    # multi-group tiled: all-DCT8 plus a few 2-wide blocks at unaligned
    # anchors, turning random shifted check cells into Occupied
    h = int(rng.choice((256, 272)))
    w = int(rng.choice((512, 528)))
    bh, bw = -(-h // 8), -(-w // 8)
    sel = np.zeros((bh, bw), dtype=np.int64)
    mul = np.ones((bh, bw), dtype=np.int64) * int(rng.integers(1, 4))
    n_wide = int(rng.integers(0, 6))
    for _ in range(n_wide):
        # odd/odd anchors are lattice-unaligned in every subsampled
        # layout: the wide block contributes no chroma itself, but its
        # Occupied tail cell can fail other anchors' shifted checks
        # (chroma holes — never overlaps)
        y = int(rng.integers(0, bh // 2)) * 2 + 1
        x = int(rng.integers(0, (bw - 2) // 2)) * 2 + 1
        if x % 32 == 31:
            continue  # 2-wide block must not cross the 256px group border
        if sel[y, x] == 0 and sel[y, x + 1] == 0:
            sel[y, x] = int(T.DCT8X16)  # (w8, h8) == (2, 1)
            sel[y, x + 1] = -1
    coeff, lf_q = planes(bh * 8, bw * 8, density)
    np_ = int(rng.choice([1, 1, 2]))
    cfg = {"kind": "subsampled_tiled", "ups": ups, "h": h, "w": w,
           "n_wide": n_wide, "num_passes": np_}
    return (encode_jxl_vardct_tiled(h, w, sel, mul, coeff, lf_q,
                                    jpeg_upsampling=ups, num_passes=np_),
            VARDCT_TOL, cfg)


GENERATORS = (gen_modular, gen_modular, gen_palette, gen_vardct,
              gen_features, gen_multigroup, gen_subsampled, gen_widened)


def check_one(data: bytes, tol: float) -> float:
    """Max abs diff production-vs-oracle over all keyframes' color+extra
    planes (same comparison as tests/test_oracle.py)."""
    from oracle_decoder import oracle_decode

    from jxl_oxide_tpu import JxlImage

    got = oracle_decode(data)
    img = JxlImage.from_bytes(data)
    assert img.num_keyframes == len(got)
    worst = 0.0
    for k, g in enumerate(got):
        r = img.render_frame(k)
        # ORIENTED public surface (image_all_channels, fb.rs:171-409):
        # covers orientation 2-8 streams end to end; spot ECs composite
        # inside it, matching the oracle
        arr = np.moveaxis(
            np.asarray(r.image_all_channels(), dtype=np.float64), -1, 0
        )
        nc = len(r.planes)
        color = [arr[i] for i in range(nc)]
        if nc == 1:
            # grayscale: the oracle triplicates the single color plane
            # (VarDCT plane convention); match it so extras line up
            color = color * 3
        w = np.stack(color + [arr[nc + i] for i in range(len(r.extra))])
        assert g.shape[0] == w.shape[0], (
            f"plane count mismatch: oracle {g.shape[0]} vs "
            f"production {w.shape[0]}"
        )
        # atol `tol` + rtol 1e-6: production blends in f32 (as the
        # reference does), so chained alpha blends on large legit values
        # carry relative f32 drift the f64 oracle doesn't
        excess = np.abs(g - w) - 1e-6 * np.abs(g)
        worst = max(worst, float(excess.max()))
    if worst > tol:
        raise AssertionError(f"production-vs-oracle diff {worst} > {tol}")
    return worst


def run(seconds: float, seed: int, save_dir: Path,
        max_iters: int | None = None) -> tuple[int, int]:
    rng = np.random.default_rng(seed)
    deadline = time.monotonic() + seconds
    n = findings = 0
    while time.monotonic() < deadline:
        if max_iters is not None and n >= max_iters:
            break
        if n and n % 25 == 0:
            # every stream compiles fresh XLA programs (per-stream
            # constants -> distinct jaxprs) and jax's internal LRU
            # caches strongly hold recent executables after our
            # functions die; ~200 retained mmaps per decode exhausts
            # vm.max_map_count (65530) in ~15 min and segfaults LLVM's
            # next JIT mmap. Periodic clearing bounds it.
            from jxl_oxide_tpu import clear_program_caches

            clear_program_caches()
        gen = GENERATORS[int(rng.integers(0, len(GENERATORS)))]
        data, tol, cfg = gen(rng)
        try:
            check_one(data, tol)
        except Exception as e:
            findings += 1
            save_dir.mkdir(parents=True, exist_ok=True)
            stem = save_dir / f"diff_{seed}_{n}"
            stem.with_suffix(".jxl").write_bytes(data)
            stem.with_suffix(".txt").write_text(f"{cfg}\n{e}\n")
            print(f"MISMATCH [{cfg}]: {e} -> {stem}.jxl", file=sys.stderr)
        n += 1
    return n, findings


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save-dir", type=Path,
                    default=ROOT / "tests" / "fuzz_found")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    n, findings = run(args.seconds, args.seed, args.save_dir)
    print(f"{n} streams cross-checked, {findings} mismatches")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
