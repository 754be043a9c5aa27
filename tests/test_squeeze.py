"""Squeeze transform tests: tendency golden cross-check, exact forward/
inverse roundtrip, and end-to-end bitstream decode."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from jxl_oxide_tpu.models.modular_transform import (
    _tendency,
    inverse_squeeze_h,
    inverse_squeeze_v,
)


def _tendency_scalar(a: int, b: int, c: int) -> int:
    """Spec smooth-tendency, scalar, truncating division (squeeze.rs
    tendency_i32 behavior)."""
    def trunc_div(n, d):
        q = abs(n) // d
        return q if n >= 0 else -q

    if a >= b >= c:
        x = trunc_div(4 * a - 3 * c - b + 6, 12)
        if x - (x & 1) > 2 * (a - b):
            x = 2 * (a - b) + 1
        if x + (x & 1) > 2 * (b - c):
            x = 2 * (b - c)
        return x
    if a <= b <= c:
        x = trunc_div(4 * a - 3 * c - b - 6, 12)
        if x + (x & 1) < 2 * (a - b):
            x = 2 * (a - b) - 1
        if x - (x & 1) < 2 * (b - c):
            x = 2 * (b - c)
        return x
    return 0


def test_tendency_grid_matches_scalar():
    vals = np.arange(-15, 16)
    a, b, c = np.meshgrid(vals, vals, vals, indexing="ij")
    got = _tendency(a.ravel(), b.ravel(), c.ravel())
    want = np.array([
        _tendency_scalar(int(x), int(y), int(z))
        for x, y, z in zip(a.ravel(), b.ravel(), c.ravel())
    ])
    np.testing.assert_array_equal(got, want)


def _forward_squeeze_h(v: np.ndarray):
    """Encoder-side horizontal squeeze: inverse of inverse_squeeze_h."""
    h, w = v.shape
    rw = w // 2
    aw = w - rw
    avg = np.zeros((h, aw), dtype=np.int64)
    res = np.zeros((h, rw), dtype=np.int64)
    v = v.astype(np.int64)
    if w % 2 == 1:
        avg[:, -1] = v[:, -1]
    # first pass: avg = first - trunc(diff / 2)
    for x in range(rw):
        diff = v[:, 2 * x] - v[:, 2 * x + 1]
        half = np.sign(diff) * (np.abs(diff) // 2)
        avg[:, x] = v[:, 2 * x] - half
    left = avg[:, 0].copy()
    for x in range(rw):
        nxt = avg[:, x + 1] if x + 1 < aw else avg[:, x]
        t = _tendency(left, avg[:, x], nxt)
        diff = v[:, 2 * x] - v[:, 2 * x + 1]
        res[:, x] = diff - t
        left = v[:, 2 * x + 1]
    return avg, res


def test_squeeze_roundtrip_exact():
    rng = np.random.default_rng(3)
    for h, w in [(5, 12), (7, 13), (1, 9), (4, 2)]:
        v = rng.integers(-300, 300, (h, w))
        avg, res = _forward_squeeze_h(v)
        out = inverse_squeeze_h(avg, res)
        np.testing.assert_array_equal(out, v)
        # vertical via transpose
        outv = inverse_squeeze_v(
            np.ascontiguousarray(avg.T), np.ascontiguousarray(res.T)
        )
        np.testing.assert_array_equal(outv, v.T)


def test_squeeze_native_python_wrapping_equivalence():
    """Native vs Python inverse squeeze on extreme i32 values: both must
    implement the reference's Wrapping<i32> arithmetic (squeeze.rs
    tendency_i32 / inverse_h_i32_base), so overflowing inputs still agree
    bit-for-bit."""
    import os

    from jxl_oxide_tpu import native as _native

    if not _native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(11)
    lo, hi = -(2**31), 2**31 - 1
    cases = []
    # dense extreme values plus uniform randoms
    extremes = np.array([lo, lo + 1, -1, 0, 1, hi - 1, hi], dtype=np.int64)
    cases.append((
        rng.choice(extremes, size=(8, 9)).astype(np.int32),
        rng.choice(extremes, size=(8, 8)).astype(np.int32),
    ))
    cases.append((
        rng.integers(lo, hi, (16, 17), dtype=np.int64).astype(np.int32),
        rng.integers(lo, hi, (16, 16), dtype=np.int64).astype(np.int32),
    ))
    for avg, res in cases:
        h, aw = avg.shape
        rw = res.shape[1]
        got_native = _native.inverse_squeeze_h(avg, res, h, aw, rw)
        os.environ["JXL_TPU_NO_NATIVE"] = "1"
        try:
            # re-run through the pure-Python fallback
            saved_lib, saved_tried = _native._lib, _native._tried
            _native._lib, _native._tried = None, True
            got_py = inverse_squeeze_h(avg, res)
        finally:
            _native._lib, _native._tried = saved_lib, saved_tried
            del os.environ["JXL_TPU_NO_NATIVE"]
        np.testing.assert_array_equal(got_native, got_py)


def test_squeeze_end_to_end_bitstream():
    """One horizontal squeeze step through the bitstream: the encoder
    forward-squeezes channel 0 into [avg, residual] coded channels and
    the decoder's transform machinery reconstructs the original exactly
    (transform.rs squeeze path). The encoder's forward helper must agree
    with this file's independently-written one."""
    from encoder import _forward_squeeze_h as enc_fwd
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 20))
    avg_t, res_t = _forward_squeeze_h(img)
    avg_e, res_e = enc_fwd(img)
    np.testing.assert_array_equal(avg_e, avg_t)
    np.testing.assert_array_equal(res_e, res_t)
    data = encode_jxl_modular(
        [img], bit_depth=8, grayscale=True, squeeze=True,
    )
    out = JxlImage.from_bytes(data).render_frame(0)
    got = np.asarray(out.planes[0])
    np.testing.assert_array_equal(
        np.round(got * 255).astype(np.int64), img
    )


def test_squeeze_roundtrip_vs_source_all_geometries():
    """encode_jxl_modular(squeeze=True) must round-trip BIT-EXACTLY
    against the source at every grouping geometry: single-group,
    multi-group, and the take_while mix where the squeezed avg/res fit
    the LfGlobal stream while the full channels split into groups
    (image.rs prepare_gmodular). Regression: the encoder wrote the
    squeeze transform header without forward-squeezing, so channel 0
    decoded to valid-but-scrambled values that only decoder-vs-decoder
    comparisons could miss (found writing the TSan harness)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    rng = np.random.default_rng(11)
    for (h, w), kw in [
        ((64, 64), {}),
        ((600, 560), {}),               # all channels grouped
        ((256, 257), {}),               # avg/res global, c1/c2 grouped
        ((129, 400), {}),
        ((600, 560), {"rct": True}),    # RCT + squeeze transform chain
        ((41, 57), {}),                 # odd dims
    ]:
        chans = [rng.integers(0, 256, (h, w), dtype=np.int64)
                 for _ in range(3)]
        data = encode_jxl_modular(chans, bit_depth=8, squeeze=True, **kw)
        m = JxlImage(num_threads=2)
        m.feed_bytes(data)
        m.finish()
        out = m._frames[0].decode_modular_frame()
        for c, o in zip(chans, out):
            np.testing.assert_array_equal(o, c, err_msg=str(((h, w), kw)))


def test_device_modular_tail_bit_exact(monkeypatch):
    """JXL_TPU_DEVICE_MODULAR=1: the XLA inverse-transform tail
    (ops/modular_tail.py — lax.scan squeeze recurrence, RCT, palette
    gather) decodes bit-identically to the host C++/numpy path across
    transform stacks (VERDICT r3 item 6)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import numpy as np
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    rng = np.random.default_rng(41)
    cases = []
    for kw in (
        dict(squeeze=True),
        dict(rct=True, rct_type=9),
        dict(rct=True, rct_type=28),   # permutation 4 (single swap a,b)
        dict(rct=True, rct_type=35),   # permutation 5 (single swap a,c)
        dict(rct=True, rct_type=13),   # permutation 1
        dict(squeeze=True, rct=True),
        dict(bit_depth=16, squeeze=True),
    ):
        bits = kw.get("bit_depth", 8)
        chans = [
            rng.integers(0, 1 << bits, (40, 56), dtype=np.int64)
            for _ in range(3)
        ]
        cases.append((encode_jxl_modular(chans, **kw), kw))
    # palette (no predictor deltas -> device gather path)
    pal = rng.integers(0, 256, (1, 7), dtype=np.int64)
    idx = rng.integers(-2, 7 + 4, (24, 24))
    cases.append((
        encode_jxl_modular(
            [pal, idx], bit_depth=8, grayscale=True, image_size=(24, 24),
            palette_spec=dict(nb_colours=7, nb_deltas=2, d_pred=0),
        ),
        {"palette": True},
    ))

    for data, kw in cases:
        host = np.stack([
            np.asarray(p) for p in JxlImage.from_bytes(data)
            .render_frame(0).planes
        ])
        monkeypatch.setenv("JXL_TPU_DEVICE_MODULAR", "1")
        dev = np.stack([
            np.asarray(p) for p in JxlImage.from_bytes(data)
            .render_frame(0).planes
        ])
        monkeypatch.delenv("JXL_TPU_DEVICE_MODULAR")
        np.testing.assert_array_equal(dev, host, err_msg=str(kw))


def test_device_modular_auto_policy(monkeypatch):
    """Auto selection (knob unset): on a locally-attached TPU the device
    tail engages only for frames >= 2^20 samples — SMALL images keep the
    narrow i16 fast path and the host transform tail (VERDICT r4 item 1:
    the env knob demotes to an override)."""
    import numpy as np

    from jxl_oxide_tpu.utils import options as opts

    monkeypatch.delenv("JXL_TPU_DEVICE_MODULAR", raising=False)
    # CPU backend (tests): auto never engages
    assert not opts.device_modular_may_engage()
    # fake a locally-attached TPU
    monkeypatch.setattr(opts, "local_accelerator", lambda: True)
    assert opts.device_modular_may_engage()
    assert not opts.device_modular_forced()

    from jxl_oxide_tpu.render.frame import parse_lf_global  # noqa: F401
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage

    rng = np.random.default_rng(44)
    chans = [rng.integers(0, 256, (48, 64), dtype=np.int64)
             for _ in range(3)]
    data = encode_jxl_modular(chans, bit_depth=8, squeeze=True)
    m = JxlImage(num_threads=1)
    m.feed_bytes(data)
    m.finish()
    out = m._frames[0].decode_modular_frame()
    # small frame on a "local TPU": narrow lane retained (i16 buffers)
    assert out[0].dtype == np.int16
    for c, o in zip(chans, out):
        np.testing.assert_array_equal(o, c)


def test_device_modular_tail_on_mesh(monkeypatch):
    """The device modular tail under a decode mesh: squeeze scans shard
    by rows (each shard's recurrence is independent), RCT/palette are
    pointwise — bit-identical to the host path on the 8-device mesh."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import numpy as np
    from encoder import encode_jxl_modular

    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.parallel import decode_mesh

    rng = np.random.default_rng(43)
    chans = [
        rng.integers(0, 256, (320, 280), dtype=np.int64) for _ in range(3)
    ]
    data = encode_jxl_modular(chans, squeeze=True, rct=True)
    host = np.stack([
        np.asarray(p)
        for p in JxlImage.from_bytes(data).render_frame(0).planes
    ])
    monkeypatch.setenv("JXL_TPU_DEVICE_MODULAR", "1")
    dev = np.stack([
        np.asarray(p)
        for p in JxlImage.from_bytes(data, mesh=decode_mesh(8))
        .render_frame(0).planes
    ])
    monkeypatch.delenv("JXL_TPU_DEVICE_MODULAR")
    np.testing.assert_array_equal(dev, host)
