"""Bit-exact lossless round-trip tests using the test-vector encoder.

The encoder (tools/encoder.py) produces spec-valid Modular codestreams; the
decoder must reproduce the source arrays exactly (BASELINE lossless contract;
analog of the reference's decode suite exactness thresholds, which for
lossless are exact equality).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

from encoder import PRED_GRADIENT, PRED_WEST, PRED_ZERO, encode_jxl_modular  # noqa: E402

from jxl_oxide_tpu.headers.image import ImageHeader
from jxl_oxide_tpu.io.bitstream import Bitstream
from jxl_oxide_tpu.io.container import ContainerParser
from jxl_oxide_tpu.render.frame import Frame


def decode_modular(data: bytes):
    p = ContainerParser()
    cs = b"".join(e.data for e in p.feed(data) if e.kind == "codestream")
    bs = Bitstream(cs)
    header = ImageHeader.parse(bs)
    frame = Frame(header, bs)
    frame.feed_bytes(cs[frame.start_byte + frame.data_start :])
    return frame.decode_modular_frame()


RNG = np.random.default_rng(1234)


@pytest.mark.parametrize("predictor", [PRED_ZERO, PRED_WEST, PRED_GRADIENT])
def test_gray_predictors_bitexact(predictor):
    img = RNG.integers(0, 256, (64, 64), dtype=np.int32)
    out = decode_modular(encode_jxl_modular([img], predictor=predictor))
    assert np.array_equal(out[0], img)


def test_baseline_config1_gray_256_single_group():
    """BASELINE config 1: 256x256 grayscale lossless, single group."""
    xx, yy = np.meshgrid(np.arange(256), np.arange(256))
    img = ((np.sin(xx / 17.0) * np.cos(yy / 23.0)) * 100 + 128).astype(np.int32)
    out = decode_modular(encode_jxl_modular([img]))
    assert np.array_equal(out[0], img)


def test_rgb_rct_ycocg_bitexact():
    chans = [RNG.integers(0, 256, (48, 80), dtype=np.int32) for _ in range(3)]
    out = decode_modular(encode_jxl_modular(chans, rct=True))
    for o, c in zip(out, chans):
        assert np.array_equal(o, c)


def test_multigroup_bitexact():
    img = RNG.integers(0, 256, (520, 300), dtype=np.int32)
    out = decode_modular(encode_jxl_modular([img]))
    assert np.array_equal(out[0], img)


def test_16bit_bitexact():
    img = RNG.integers(0, 65536, (40, 40), dtype=np.int32)
    out = decode_modular(encode_jxl_modular([img], bit_depth=16))
    assert np.array_equal(out[0], img)


def test_lz77_rle_fast_lossless_bitexact():
    """LZ77 run-length streams (fast-lossless shape: single dist symbol
    == 1, split_exponent 0 -> repeat-last; jxl-coding lib.rs:105-123,
    image.rs:493-534). Exercises the native RLE + gradient fast path and
    the generic LZ77 window path must agree (lib.rs special distance
    (1,0) == effective distance 1)."""
    flat = [
        np.repeat(RNG.integers(0, 256, (96, 4), dtype=np.int32), 24, 1)
        for _ in range(3)
    ]
    noisy = [RNG.integers(0, 256, (48, 80), dtype=np.int32) for _ in range(3)]
    const = [np.full((40, 40), 191, dtype=np.int32)]
    for chans in (flat, noisy, const):
        out = decode_modular(encode_jxl_modular(chans, lz77_rle=True))
        for o, c in zip(out, chans):
            assert np.array_equal(o, c)


def test_lz77_rle_multigroup_and_16bit():
    # multi-group: per-group pass streams each carry their own rle state
    img = np.repeat(RNG.integers(0, 256, (520, 10), dtype=np.int32), 30, 1)
    out = decode_modular(encode_jxl_modular([img], lz77_rle=True))
    assert np.array_equal(out[0], img)
    # 16-bit values with small residuals stay under the length-token base
    img16 = np.cumsum(
        RNG.integers(-3, 4, (64, 64)), axis=1, dtype=np.int64
    ).astype(np.int32) + 3000
    out = decode_modular(
        encode_jxl_modular([img16], bit_depth=16, lz77_rle=True)
    )
    assert np.array_equal(out[0], img16)


def test_lz77_rle_native_matches_python():
    import os
    import subprocess
    import sys as _sys

    # the pure-Python decoder has its own fast-lossless path
    # (_decode_fast_lossless); assert byte-identical output to native
    flat = [
        np.repeat(RNG.integers(0, 256, (64, 8), dtype=np.int32), 8, 1)
        for _ in range(3)
    ]
    data = encode_jxl_modular(flat, lz77_rle=True)
    native_out = decode_modular(data)
    code = (
        "import sys, numpy as np\n"
        f"sys.path.insert(0, {str(ROOT)!r})\n"
        f"sys.path.insert(0, {str(ROOT / 'tests')!r})\n"
        "from test_roundtrip import decode_modular\n"
        "import sys as s\n"
        "data = s.stdin.buffer.read()\n"
        "out = decode_modular(data)\n"
        "np.save(s.stdout.buffer, np.stack(out))\n"
    )
    env = dict(os.environ, JXL_TPU_NO_NATIVE="1", JAX_PLATFORMS="cpu")
    r = subprocess.run([_sys.executable, "-c", code], input=data,
                       capture_output=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    import io

    py_out = np.load(io.BytesIO(r.stdout))
    assert np.array_equal(py_out, np.stack(native_out))


def test_nonsquare_odd_sizes():
    for shape in [(1, 1), (1, 17), (33, 1), (7, 300), (257, 255)]:
        img = RNG.integers(0, 256, shape, dtype=np.int32)
        out = decode_modular(encode_jxl_modular([img]))
        assert np.array_equal(out[0], img), shape


def test_ma_tree_decision_nodes():
    """Multi-node MA tree: decision on property 3 (x) routes pixels to two
    leaves with different offsets/multipliers (ma.rs FlatMaTree walk; the
    C++ walk_tree on the native path)."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    h, w = 6, 8
    rng = np.random.default_rng(41)
    target = rng.integers(0, 100, (h, w)).astype(np.int64)
    # leaf A (x > 3): val = res * 2 + 7 ; leaf B (x <= 3): val = res
    target[:, 4:] = 7 + 2 * ((target[:, 4:] - 7) // 2).clip(0)

    def pack(v):
        return (v << 1) if v >= 0 else (-(v << 1) - 1)

    tree_tokens = [
        4, pack(3),               # decision: prop 3 (x) > 3 ?
        0, 0, pack(7), 1, 0,      # leaf A: Zero pred, offset 7, mul 2
        0, 0, 0, 0, 0,            # leaf B: Zero pred, offset 0, mul 1
    ]

    def token_fn(channels):
        toks = []
        for arr in channels:
            for y in range(h):
                for x in range(w):
                    v = int(arr[y, x])
                    res = (v - 7) // 2 if x > 3 else v
                    toks.append(pack(res))
        return toks

    data = encode_jxl_modular(
        [target], bit_depth=8, grayscale=True,
        custom_tree=(tree_tokens, 2, token_fn),
    )
    got = np.round(
        np.asarray(JxlImage.from_bytes(data).render_frame(0).planes[0]) * 255
    ).astype(np.int64)
    np.testing.assert_array_equal(got, target)


def test_modular_xyb_decode():
    """xyb_encoded Modular: stream order [y, x, b], b += y, m/128 scaling
    (convert_modular_xyb, jxl-render image.rs:148-188), then the device
    XYB->sRGB transform."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.headers.image import OpsinInverseMatrix
    from jxl_oxide_tpu.ops.color import (
        apply_matrix3, linear_to_srgb, xyb_to_mixed_lms,
    )

    rng = np.random.default_rng(83)
    # y plane with small x/b deviations (realistic xyb magnitudes)
    y_ch = rng.integers(60, 200, (12, 16))
    x_ch = rng.integers(-6, 7, (12, 16))
    b_ch = rng.integers(-10, 11, (12, 16)) + y_ch  # stored b has y added?
    b_stored = b_ch - y_ch  # decoder adds y back
    data = encode_jxl_modular(
        [y_ch, x_ch, b_stored], bit_depth=8, grayscale=False, xyb=True,
    )
    jx = JxlImage.from_bytes(data)
    assert jx.image_header.metadata.xyb_encoded
    out = np.stack(jx.render_frame(0).image_planar(), -1)

    m = [v / 128.0 for v in (1.0 / 32.0, 1.0 / 4.0, 1.0 / 2.0)]
    xf = (x_ch * m[0]).astype(np.float32)
    yf = (y_ch * m[1]).astype(np.float32)
    bf = (b_ch * m[2]).astype(np.float32)
    oim = OpsinInverseMatrix()
    l_, m_, s_ = xyb_to_mixed_lms(xf, yf, bf, oim.opsin_bias, 255.0)
    r, g, b = apply_matrix3(l_, m_, s_, np.array(oim.inv_mat))
    want = np.stack([
        np.asarray(linear_to_srgb(c)) for c in (r, g, b)
    ], -1)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_xyb_animation_blends_in_target_space():
    """Blending frames with save_before_ct=false convert XYB -> the
    signaled (sRGB) encoding BEFORE compositing (render.rs:151 +
    util.rs:311-375 convert_color_for_record, image.rs ct_done), so an
    alpha blend mixes sRGB values, not XYB values. Expected per-frame sRGB
    comes from decoding each frame as a standalone image."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    rng = np.random.default_rng(19)
    h, w = 12, 16

    def xyb_chans(seed):
        r = np.random.default_rng(seed)
        y_ch = r.integers(60, 200, (h, w))
        x_ch = r.integers(-6, 7, (h, w))
        b_stored = r.integers(-10, 11, (h, w))
        return [y_ch, x_ch, b_stored]

    c0, c1 = xyb_chans(101), xyb_chans(102)

    def solo_srgb(chans):
        data = encode_jxl_modular(chans, bit_depth=8, grayscale=False,
                                  xyb=True)
        return np.stack(
            JxlImage.from_bytes(data).render_frame(0).image_planar(), -1
        )

    srgb0, srgb1 = solo_srgb(c0), solo_srgb(c1)

    a0 = np.full((h, w), 255, dtype=np.int64)   # opaque base
    a1 = np.full((h, w), 128, dtype=np.int64)   # 128/255 blend
    data = encode_jxl_modular(
        c0 + [a0], bit_depth=8, grayscale=False, xyb=True,
        animation_frames=[c0 + [a0], c1 + [a1]],
        extra_alpha=True, animation_blend=True,
    )
    img = JxlImage.from_bytes(data)
    assert img.num_frames == 2
    out = np.stack(img.render_frame(1).image_planar(), -1)

    na = 128.0 / 255.0  # base alpha = 1 -> out = na*new + (1-na)*base
    want = na * srgb1 + (1.0 - na) * srgb0
    np.testing.assert_allclose(out, want, atol=1e-5)
    # and the blend genuinely discriminates: mixing in XYB then converting
    # gives a different answer
    assert not np.allclose(out, srgb1, atol=1e-3)


def test_all_predictors_against_reference_model():
    """Each non-WP predictor (predictor.rs:26-127) validated end-to-end:
    residuals computed by an independent reimplementation of the
    reference's two-row neighbor state must decode bit-exactly."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    h, w = 7, 9

    def neighbors(img, y, x):
        """Reference record() edge semantics."""
        def row(r, c):
            return int(img[r, c])

        if y == 0 and x == 0:
            wv = nv = nwv = 0
        elif x == 0:
            wv = nv = nwv = row(y - 1, 0)
        elif y == 0:
            wv = row(y, x - 1)
            nv = nwv = wv
        else:
            wv = row(y, x - 1)
            nv = row(y - 1, x)
            nwv = row(y - 1, x - 1)
        ne = row(y - 1, x + 1) if (y > 0 and x + 1 < w) else nv
        nee = row(y - 1, x + 2) if (y > 0 and x + 2 < w) else ne
        ww = row(y, x - 2) if x >= 2 else wv
        nn = row(y - 2, x) if y >= 2 else nv
        return wv, nv, nwv, ne, nee, ww, nn

    def predict(p, img, y, x):
        W, N, NW, NE, NEE, WW, NN = neighbors(img, y, x)
        if p == 0:
            return 0
        if p == 1:
            return W
        if p == 2:
            return N
        if p == 3:
            return (W + N) // 2
        if p == 4:
            return W if abs(N - NW) < abs(W - NW) else N
        if p == 5:
            return int(np.clip(N + W - NW, min(W, N), max(W, N)))
        if p == 7:
            return NE
        if p == 8:
            return NW
        if p == 9:
            return WW
        if p == 10:
            return (W + NW) // 2
        if p == 11:
            return (N + NW) // 2
        if p == 12:
            return (N + NE) // 2
        if p == 13:
            return (6 * N - 2 * NN + 7 * W + WW + NEE + 3 * NE + 8) // 16
        raise AssertionError(p)

    def pack(v):
        return (v << 1) if v >= 0 else (-(v << 1) - 1)

    rng = np.random.default_rng(91)
    target = rng.integers(0, 256, (h, w)).astype(np.int64)

    for p in [0, 1, 2, 3, 4, 5, 7, 8, 9, 10, 11, 12, 13]:
        tree_tokens = [0, p, 0, 0, 0]  # single leaf, predictor p

        def token_fn(channels, _p=p):
            toks = []
            for arr in channels:
                for y in range(h):
                    for x in range(w):
                        res = int(arr[y, x]) - predict(_p, arr, y, x)
                        toks.append(pack(res))
            return toks

        data = encode_jxl_modular(
            [target], bit_depth=8, grayscale=True,
            custom_tree=(tree_tokens, 1, token_fn),
        )
        got = np.round(
            np.asarray(
                JxlImage.from_bytes(data).render_frame(0).planes[0]
            ) * 255
        ).astype(np.int64)
        np.testing.assert_array_equal(got, target, err_msg=f"predictor {p}")


class _RefWp:
    """Independent reimplementation of the self-correcting (weighted)
    predictor from predictor.rs:136-443, used only as a test oracle."""

    DIV = [0] + [(1 << 24) // i for i in range(1, 65)]
    P1, P2 = 16, 10
    P3 = (7, 7, 7, 0, 0)
    W = (13, 12, 12, 12)

    def __init__(self, width):
        self.width = width
        self.x = 0
        self.te_row = [0] * width
        self.se_row = [[0, 0, 0, 0] for _ in range(width)]
        self.te_w = self.te_nw = self.te_n = self.te_ne = 0
        self.se_nw_ww = [0, 0, 0, 0]
        self.se_n_w = [0, 0, 0, 0]
        self.se_ne = [0, 0, 0, 0]
        self.y = 0

    def predict(self, n, nw, ne, w, nn):
        M = (1 << 32)
        n3, nw3, ne3, w3, nn3 = (v << 3 for v in (n, nw, ne, w, nn))
        p3a, p3b, p3c, p3d, p3e = self.P3
        sub = [
            w3 + ne3 - n3,
            n3 - (((self.te_w + self.te_n + self.te_ne) * self.P1) >> 5),
            w3 - (((self.te_w + self.te_n + self.te_nw) * self.P2) >> 5),
            n3 - ((self.te_nw * p3a + self.te_n * p3b + self.te_ne * p3c
                   + (nn3 - n3) * p3d + (nw3 - w3) * p3e) >> 5),
        ]
        se_sum = [
            (self.se_nw_ww[i] + self.se_n_w[i] + self.se_ne[i]) % M
            for i in range(4)
        ]
        weight = []
        for s, maxw in zip(se_sum, self.W):
            shift = max(((s + 1) >> 5), 1).bit_length() - 1
            weight.append(4 + ((maxw * self.DIV[(s >> shift) + 1]) >> shift))
        logw = (sum(weight) >> 4).bit_length() - 1
        weight = [v >> logw for v in weight]
        sw = sum(weight)
        s = (sw >> 1) - 1
        for sp, wv in zip(sub, weight):
            s += sp * wv
        pred = (s * self.DIV[sw]) >> 24
        if ((self.te_n ^ self.te_w) | (self.te_n ^ self.te_nw)) <= 0:
            pred = max(min(pred, max(n3, w3, ne3)), min(n3, w3, ne3))
        self._sub = sub
        self._pred = pred
        return pred

    def record(self, sample):
        te = self._pred - (sample << 3)
        se = [((abs(sp - (sample << 3)) + 3) >> 3) for sp in self._sub]
        self.te_row[self.x] = te
        self.se_row[self.x] = se
        self.x += 1
        if self.x >= self.width:
            self.y += 1
            self.x = 0
            self.te_w = 0
            self.te_n = self.te_row[0]
            self.te_nw = self.te_n
            self.se_n_w = list(self.se_row[0])
            self.se_nw_ww = list(self.se_n_w)
            if self.width <= 1:
                self.te_ne = self.te_n
                self.se_ne = list(self.se_n_w)
            else:
                self.te_ne = self.te_row[1]
                self.se_ne = list(self.se_row[1])
        else:
            self.te_w = te
            self.te_nw = self.te_n
            self.te_n = self.te_ne
            self.se_nw_ww = self.se_n_w
            self.se_n_w = [a + b for a, b in zip(self.se_ne, se)]
            if self.x + 1 >= self.width:
                self.te_ne = self.te_n
                self.se_ne = list(self.se_n_w)
            elif self.y != 0:
                self.te_ne = self.te_row[self.x + 1]
                self.se_ne = list(self.se_row[self.x + 1])


def test_weighted_predictor_against_reference_model():
    """Predictor 6 (self-correcting / weighted, predictor.rs:136-443)
    validated end-to-end against the independent oracle above."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    h, w = 8, 11
    rng = np.random.default_rng(97)
    target = rng.integers(0, 256, (h, w)).astype(np.int64)

    def neighbors(img, y, x):
        def row(r, c):
            return int(img[r, c])

        if y == 0 and x == 0:
            wv = nv = nwv = 0
        elif x == 0:
            wv = nv = nwv = row(y - 1, 0)
        elif y == 0:
            wv = row(y, x - 1)
            nv = nwv = wv
        else:
            wv = row(y, x - 1)
            nv = row(y - 1, x)
            nwv = row(y - 1, x - 1)
        ne = row(y - 1, x + 1) if (y > 0 and x + 1 < w) else nv
        nn = row(y - 2, x) if y >= 2 else nv
        return wv, nv, nwv, ne, nn

    wp = _RefWp(w)
    toks = []

    def pack(v):
        return (v << 1) if v >= 0 else (-(v << 1) - 1)

    for y in range(h):
        for x in range(w):
            W, N, NW, NE, NN = neighbors(target, y, x)
            pred8 = wp.predict(N, NW, NE, W, NN)
            pred = (pred8 + 3) >> 3
            res = int(target[y, x]) - pred
            toks.append(pack(res))
            wp.record(int(target[y, x]))

    tree_tokens = [0, 6, 0, 0, 0]  # single leaf, weighted predictor
    data = encode_jxl_modular(
        [target], bit_depth=8, grayscale=True,
        custom_tree=(tree_tokens, 1, lambda _chans: toks),
    )
    got = np.round(
        np.asarray(JxlImage.from_bytes(data).render_frame(0).planes[0]) * 255
    ).astype(np.int64)
    np.testing.assert_array_equal(got, target)


def test_ma_tree_prev_channel_property():
    """MA properties >= 16 reference previously-decoded channels
    (ma.rs prev-channel refs; get_extra in modular_predict.py): channel 1
    branches on channel 0's co-located value."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    h, w = 6, 8
    rng = np.random.default_rng(101)
    ch0 = rng.integers(0, 256, (h, w)).astype(np.int64)
    ch1 = rng.integers(0, 256, (h, w)).astype(np.int64)
    thresh = 128

    def pack(v):
        return (v << 1) if v >= 0 else (-(v << 1) - 1)

    # prop 17 = previous channel value; > thresh -> leaf A (offset 50)
    tree_tokens = [
        18, pack(thresh),
        0, 0, pack(50), 0, 0,   # leaf A: Zero + 50
        0, 0, 0, 0, 0,          # leaf B: Zero
    ]

    def token_fn(channels):
        toks = []
        for ci, arr in enumerate(channels):
            for y in range(h):
                for x in range(w):
                    prev = int(channels[ci - 1][y, x]) if ci > 0 else 0
                    off = 50 if prev > thresh else 0
                    toks.append(pack(int(arr[y, x]) - off))
        return toks

    data = encode_jxl_modular(
        [ch0, ch1, ch0], bit_depth=8, grayscale=False,
        custom_tree=(tree_tokens, 2, token_fn),
    )
    r = JxlImage.from_bytes(data).render_frame(0)
    got = [np.round(np.asarray(p) * 255).astype(np.int64) for p in r.planes]
    np.testing.assert_array_equal(got[0], ch0)
    np.testing.assert_array_equal(got[1], ch1)
    np.testing.assert_array_equal(got[2], ch0)


def test_ma_tree_max_error_property():
    """Property 15 (weighted-predictor max_error, predictor.rs:384-390)
    drives tree decisions; validated against the independent WP oracle."""
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    h, w = 6, 9
    rng = np.random.default_rng(103)
    target = rng.integers(0, 256, (h, w)).astype(np.int64)

    def pack(v):
        return (v << 1) if v >= 0 else (-(v << 1) - 1)

    # decision: max_error (prop 15) > 0 -> leaf A offset 9, else leaf B
    tree_tokens = [
        16, pack(0),
        0, 0, pack(9), 0, 0,
        0, 0, 0, 0, 0,
    ]

    def neighbors(img, y, x):
        def row(r, c):
            return int(img[r, c])

        if y == 0 and x == 0:
            wv = nv = nwv = 0
        elif x == 0:
            wv = nv = nwv = row(y - 1, 0)
        elif y == 0:
            wv = row(y, x - 1)
            nv = nwv = wv
        else:
            wv = row(y, x - 1)
            nv = row(y - 1, x)
            nwv = row(y - 1, x - 1)
        ne = row(y - 1, x + 1) if (y > 0 and x + 1 < w) else nv
        nn = row(y - 2, x) if y >= 2 else nv
        return wv, nv, nwv, ne, nn

    wp = _RefWp(w)
    toks = []
    for y in range(h):
        for x in range(w):
            max_err = wp.te_w
            for e in (wp.te_n, wp.te_nw, wp.te_ne):
                if abs(e) > abs(max_err):
                    max_err = e
            W, N, NW, NE, NN = neighbors(target, y, x)
            wp.predict(N, NW, NE, W, NN)
            off = 9 if max_err > 0 else 0
            toks.append(pack(int(target[y, x]) - off))
            wp.record(int(target[y, x]))

    data = encode_jxl_modular(
        [target], bit_depth=8, grayscale=True,
        custom_tree=(tree_tokens, 2, lambda _c: toks),
    )
    got = np.round(
        np.asarray(JxlImage.from_bytes(data).render_frame(0).planes[0]) * 255
    ).astype(np.int64)
    np.testing.assert_array_equal(got, target)


def test_lz77_general_matches_end_to_end():
    """LZ77 with REAL matches (not the RLE shape) through full modular
    images: distance token 2 resolves through the 2-D special-distance
    table to 'row above' (dist_multiplier == width), driving the native
    generic window path end-to-end (jxl-coding lib.rs:487-569)."""
    # vertically repetitive content: many row-above matches
    base = RNG.integers(0, 256, (8, 96), dtype=np.int32)
    img = np.tile(base, (12, 1))  # 96x96, rows repeat every 8
    chans = [np.roll(img, c, axis=0) for c in range(3)]
    data = encode_jxl_modular(chans, predictor=PRED_ZERO, lz77_matches=True)
    out = decode_modular(data)
    for o, c in zip(out, chans):
        assert np.array_equal(o, c)
    # plain-shape content too (mostly literals + short dist-1 runs)
    noisy = [RNG.integers(0, 256, (64, 48), dtype=np.int32)
             for _ in range(3)]
    out = decode_modular(
        encode_jxl_modular(noisy, predictor=PRED_ZERO, lz77_matches=True))
    for o, c in zip(out, noisy):
        assert np.array_equal(o, c)


def test_lz77_general_matches_native_matches_python():
    import os
    import subprocess
    import sys as _sys

    base = RNG.integers(0, 256, (6, 64), dtype=np.int32)
    img = np.tile(base, (10, 1))[:56]
    data = encode_jxl_modular([img], predictor=PRED_ZERO, lz77_matches=True)
    native_out = decode_modular(data)
    code = (
        "import sys, numpy as np\n"
        f"sys.path.insert(0, {str(ROOT)!r})\n"
        f"sys.path.insert(0, {str(ROOT / 'tests')!r})\n"
        "from test_roundtrip import decode_modular\n"
        "import sys as s\n"
        "out = decode_modular(s.stdin.buffer.read())\n"
        "np.save(s.stdout.buffer, np.stack(out))\n"
    )
    env = dict(os.environ, JXL_TPU_NO_NATIVE="1", JAX_PLATFORMS="cpu")
    r = subprocess.run([_sys.executable, "-c", code], input=data,
                       capture_output=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    import io

    py_out = np.load(io.BytesIO(r.stdout))
    assert np.array_equal(py_out, np.stack(native_out))


def test_opsin_inverse_matrix_override():
    """A custom opsin inverse matrix in CustomTransformData
    (jxl-image lib.rs:163-168, OpsinInverseMatrix non-default) must be
    used by the XYB->RGB transform: the decode must match the reference
    math with the OVERRIDDEN matrix, not the spec default."""
    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.headers.image import OpsinInverseMatrix
    from jxl_oxide_tpu.ops.color import (
        apply_matrix3, linear_to_srgb, xyb_to_mixed_lms,
    )

    rng = np.random.default_rng(84)
    y_ch = rng.integers(60, 200, (12, 16))
    x_ch = rng.integers(-6, 7, (12, 16))
    b_stored = rng.integers(-10, 11, (12, 16))
    default_oim = OpsinInverseMatrix()
    # perturb the matrix (f16-representable scale) so output must differ
    inv_mat = tuple(
        tuple(float(np.float16(v * 1.25)) for v in row)
        for row in default_oim.inv_mat
    )
    override = {
        "inv_mat": inv_mat,
        "opsin_bias": default_oim.opsin_bias,
        "quant_bias": default_oim.quant_bias,
        "quant_bias_numerator": default_oim.quant_bias_numerator,
    }
    data = encode_jxl_modular(
        [y_ch, x_ch, b_stored], bit_depth=8, grayscale=False, xyb=True,
        opsin_override=override,
    )
    jx = JxlImage.from_bytes(data)
    oim = jx.image_header.metadata.opsin_inverse_matrix
    assert np.allclose(np.asarray(oim.inv_mat), np.asarray(inv_mat))
    out = np.stack(jx.render_frame(0).image_planar(), -1)

    m = [v / 128.0 for v in (1.0 / 32.0, 1.0 / 4.0, 1.0 / 2.0)]
    xf = (x_ch * m[0]).astype(np.float32)
    yf = (y_ch * m[1]).astype(np.float32)
    bf = ((b_stored + y_ch) * m[2]).astype(np.float32)
    l_, m_, s_ = xyb_to_mixed_lms(xf, yf, bf, oim.opsin_bias, 255.0)
    r, g, b = apply_matrix3(l_, m_, s_, np.array(oim.inv_mat))
    want = np.stack([np.asarray(linear_to_srgb(c)) for c in (r, g, b)], -1)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_float16_samples_bitexact():
    """Float bit depth (BitDepth float form, 16-bit with 5 exponent
    bits): modular samples are IEEE half bit patterns and the output
    planes must be the exact float values (jxl-image lib.rs:458-487
    parse_integer_samples float branch)."""
    from jxl_oxide_tpu import JxlImage

    rng = np.random.default_rng(91)
    vals = (rng.random((24, 32)) * 2.0 - 0.5).astype(np.float16)
    bits = vals.view(np.uint16).astype(np.int32)
    data = encode_jxl_modular([bits], bit_depth=16, grayscale=True,
                              float_exp_bits=5)
    img = JxlImage.from_bytes(data)
    bd = img.image_header.metadata.bit_depth
    assert bd.is_float and bd.bits_per_sample == 16 and bd.exp_bits == 5
    out = np.asarray(img.render_frame(0).planes[0])
    np.testing.assert_array_equal(out, vals.astype(np.float32))


def test_custom_lf_dequant_weights_modular_xyb():
    """Non-default LfChannelDequantization weights (lf.rs m_x/m_y/m_b):
    the xyb modular path scales channels by m/128, so the decode must
    match the reference math with the CUSTOM weights."""
    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.headers.image import OpsinInverseMatrix
    from jxl_oxide_tpu.ops.color import (
        apply_matrix3, linear_to_srgb, xyb_to_mixed_lms,
    )

    rng = np.random.default_rng(67)
    y_ch = rng.integers(60, 200, (12, 16))
    x_ch = rng.integers(-6, 7, (12, 16))
    b_stored = rng.integers(-10, 11, (12, 16))
    custom = (1.0 / 16.0, 1.0 / 8.0, 1.0 / 4.0)
    data = encode_jxl_modular(
        [y_ch, x_ch, b_stored], bit_depth=8, grayscale=False, xyb=True,
        lf_dequant=custom,
    )
    img = JxlImage.from_bytes(data)
    out = np.stack(img.render_frame(0).image_planar(), -1)

    m = [v / 128.0 for v in custom]
    xf = (x_ch * m[0]).astype(np.float32)
    yf = (y_ch * m[1]).astype(np.float32)
    bf = ((b_stored + y_ch) * m[2]).astype(np.float32)
    oim = OpsinInverseMatrix()
    l_, m_, s_ = xyb_to_mixed_lms(xf, yf, bf, oim.opsin_bias, 255.0)
    r, g, b = apply_matrix3(l_, m_, s_, np.array(oim.inv_mat))
    want = np.stack([np.asarray(linear_to_srgb(c)) for c in (r, g, b)], -1)
    np.testing.assert_allclose(out, want, atol=1e-5)
