"""Byte-complete memory budgeting (jxl-grid/src/alloc_tracker.rs:8-51).

Round-2 verdict item 7: the budget must cover native-side scratch (LZ77
windows, alias-bucket stores, HF offset tables — reported over the ctypes
ABI), the coefficient planes retained by a ProgressiveCache, and the
keyframe canvas cache (bytes, not just a count cap).
"""

import gc
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from jxl_oxide_tpu import JxlImage  # noqa: E402
from jxl_oxide_tpu import native  # noqa: E402
from jxl_oxide_tpu.utils.alloc import JxlOutOfMemoryError  # noqa: E402
from encoder import encode_jxl_modular  # noqa: E402
from encoder_vardct import encode_jxl_vardct  # noqa: E402

pytestmark = pytest.mark.skipif(
    os.environ.get("JXL_TPU_NO_NATIVE") == "1", reason="native disabled"
)

LZ_WINDOW_BYTES = 4 << 20  # one u32[1<<20] window per active LZ77 stream


def _lz77_stream(seed=3, shape=(96, 128)):
    rng = np.random.default_rng(seed)
    # repeated rows give the encoder real LZ77 general matches, so decode
    # allocates the native window
    base = rng.integers(0, 256, (8, shape[1]), dtype=np.int64)
    plane = np.tile(base, (shape[0] // 8, 1))
    return encode_jxl_modular([plane.copy() for _ in range(3)],
                              bit_depth=8, lz77_matches=True)


def test_native_scratch_returns_to_zero():
    """Every native MemGuard releases on destruction: the process-global
    current counter settles back to zero after a decode."""
    if not native.available():
        pytest.skip("native library unavailable")
    data = _lz77_stream()
    img = JxlImage.from_bytes(data)
    img.render_frame(0)
    cur, peak = native.mem_stats()
    assert cur == 0
    assert peak >= LZ_WINDOW_BYTES  # the window was counted at some point


def test_native_window_counted_in_tracker_peak():
    """The 4 MiB LZ77 window shows up in the AllocTracker's peak even
    though the Python-side planes are tiny."""
    if not native.available():
        pytest.skip("native library unavailable")
    data = _lz77_stream(seed=5)
    img = JxlImage.from_bytes(data, approx_memory_limit=256 << 20)
    img.render_frame(0)
    assert img._tracker.peak >= LZ_WINDOW_BYTES


def test_native_oom_on_tiny_budget():
    """A budget too small for the LZ77 window fails the decode with
    JxlOutOfMemoryError from INSIDE the native stage (ret 12), instead of
    silently allocating past the limit."""
    if not native.available():
        pytest.skip("native library unavailable")
    data = _lz77_stream(seed=7)
    # planes: 3 * 96*128 i32 = ~147 KB; window alone needs 4 MiB
    img = JxlImage.from_bytes(data, approx_memory_limit=2 << 20)
    with pytest.raises(JxlOutOfMemoryError):
        img.render_frame(0)
    cur, _peak = native.mem_stats()
    assert cur == 0  # failure path released everything


def test_vardct_state_released_after_decode():
    """VardctFrameState coefficient planes return to the budget once the
    state is dropped (weakref.finalize drop semantics); used falls well
    below peak after the render completes."""
    rng = np.random.default_rng(11)
    smooth = np.kron(rng.random((17, 17, 3)).astype(np.float32),
                     np.ones((16, 16, 1)))[:256, :256]
    data = encode_jxl_vardct(np.clip(smooth, 0, 1))
    img = JxlImage.from_bytes(data, approx_memory_limit=512 << 20)
    img.render_frame(0)
    t = img._tracker
    coeff_bytes = 3 * 256 * 256 * 4  # int32 coefficient planes
    canvas_bytes = 3 * 256 * 256 * 4  # float32 cached canvas
    assert t.peak >= coeff_bytes
    gc.collect()
    # after the render, only the cached canvas (plus small residuals) may
    # remain charged: the coefficient planes were trimmed back to the pool
    assert t.used <= canvas_bytes + (128 << 10)


def test_keyframe_cache_byte_cap():
    """The keyframe canvas cache evicts by BYTES, not only by count."""
    rng = np.random.default_rng(13)
    frames = [
        [rng.integers(0, 256, (64, 64), dtype=np.int64) for _ in range(3)]
        for _ in range(3)
    ]
    data = encode_jxl_modular(frames[0], bit_depth=8, animation_frames=frames)
    img = JxlImage.from_bytes(data)
    # one canvas is 3 * 64*64 f32 = 48 KB: cap below two canvases
    img._KEYFRAME_CACHE_MAX_BYTES = 60 * 1024
    for i in range(3):
        img.render_frame(i)
    assert len(img._keyframe_cache) == 1
    # and the survivor is the newest render
    (key,) = img._keyframe_cache
    assert key[0] == 2
