"""Subprocess harness for the sanitized native build: exercises every
native entry point (modular decode, HF coefficient decode, ICC decode)
over generated streams and the fuzz corpus, WITHOUT importing jax (the
sanitizer runtime and XLA don't mix). Run by test_native_asan_clean with
LD_PRELOAD=libasan.so and JXL_TPU_NATIVE_SANITIZE=address.

Prints ASAN_OK on success; any ASan/UBSan report aborts the process.
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

import numpy as np  # noqa: E402

from jxl_oxide_tpu import native  # noqa: E402

assert native.available(), "sanitized native build failed"

from encoder import encode_jxl_modular  # noqa: E402

from jxl_oxide_tpu import JxlImage  # noqa: E402
from jxl_oxide_tpu.utils.errors import JxlError  # noqa: E402

rng = np.random.default_rng(5)

# 1. modular decode (native MA-tree + predictors + LZ77 window)
chans = [rng.integers(0, 256, (300, 280), dtype=np.int64) for _ in range(3)]
img = JxlImage()
img.feed_bytes(encode_jxl_modular(chans, bit_depth=8))
img.finish()
out = img._frames[0].decode_modular_frame()
for c, o in zip(chans, out):
    assert np.array_equal(c, o)

# squeeze + RCT variants stress the transform/window paths
for kw in ({"rct": True}, {"squeeze": True}):
    chans2 = [rng.integers(0, 64, (96, 80), dtype=np.int64) for _ in range(3)]
    im2 = JxlImage()
    im2.feed_bytes(encode_jxl_modular(chans2, bit_depth=8, **kw))
    im2.finish()
    im2._frames[0].decode_modular_frame()

# 2. VarDCT host stage (native HF coefficient decode), no device work
from bench_host import host_stage, make_stream  # noqa: E402

host_stage(make_stream(512, dense=True), threads=2)

# 2b. varblock placement (mixed transform sizes incl. failure paths)
from jxl_oxide_tpu.models.vardct import TransformType  # noqa: E402
from jxl_oxide_tpu.utils.errors import JxlValidationError  # noqa: E402

sizes = np.asarray(
    [d for i in range(TransformType.NUM_TYPES)
     for d in TransformType.SELECT_SIZE[i]], dtype=np.int32
)
info = np.array([[TransformType.DCT16] + [TransformType.DCT8] * 12,
                 [3] + list(range(12))], dtype=np.int64)
sel_g, mul_g, full_g = native.place_varblocks(info, 4, 4, 32, sizes)
assert (full_g > 0).all() and sel_g[0, 0] == TransformType.DCT16
for bad in (
    np.array([[99], [0]], dtype=np.int64),          # invalid type
    np.array([[TransformType.DCT64], [0]], dtype=np.int64),  # doesn't fit
    np.array([[TransformType.DCT8], [-5]], dtype=np.int64),  # bad mul
):
    try:
        native.place_varblocks(bad, 4, 4, 32, sizes)
        raise AssertionError("expected JxlValidationError")
    except JxlValidationError:
        pass

# 2b2. JPEG scan encoder (sequential + progressive + DRI, raw-pointer
# plane walks, huffman table indexing, 64-bit shift bit writer)
sys.path.insert(0, os.path.join(ROOT, "tests"))
from test_jbr import (  # noqa: E402
    make_fake_frame,
    make_jbrd_box,
    make_jbrd_box_dri,
    make_jbrd_box_progressive,
)

from jxl_oxide_tpu.jbr import JpegBitstreamData, reconstruct_jpeg  # noqa: E402

_q = np.full((8, 8), 16, dtype=np.int32)
_lf = rng.integers(-20, 21, (2, 4)).astype(np.int32)
_co = rng.integers(-5, 6, (16, 32)).astype(np.int32)
for box in (
    make_jbrd_box([0xC0, 0xC4, 0xDB, 0xDA, 0xD9]),
    make_jbrd_box_progressive(),
    make_jbrd_box_dri(2),
):
    reconstruct_jpeg(
        JpegBitstreamData(box), make_fake_frame(32, 16, _lf, _co, _q)
    )

# 2c. one-pass sparse extraction (count > capacity overflow path too)
arr = rng.integers(-5, 6, 4096).astype(np.int32)
idx = np.zeros(4096, dtype=np.int32)
val = np.zeros(4096, dtype=np.int32)
cnt, ma = native.sparse_extract(arr, idx, val)
assert cnt == int(np.count_nonzero(arr))
assert ma == int(np.abs(arr).max())
small_i = np.zeros(8, dtype=np.int32)
small_v = np.zeros(8, dtype=np.int32)
cnt2, _ = native.sparse_extract(arr, small_i, small_v)
assert cnt2 == cnt  # counts past capacity without writing

# 3. ICC decode (native 41-context stream) via a real container file
cmyk = os.path.join(
    "/root/reference/crates/jxl-oxide-tests/tests/cms/cmyk_layers.jxl"
)
if os.path.exists(cmyk):
    img3 = JxlImage()
    with open(cmyk, "rb") as f:
        img3.feed_bytes(f.read())
    img3.finish()
    assert img3.embedded_icc

# 4. fuzz corpus sweep: header/frame parse + modular decode where
# applicable; only JxlError may escape
corpus = "/root/reference/crates/jxl-oxide-tests/tests/fuzz_findings"
if os.path.isdir(corpus):
    for name in sorted(os.listdir(corpus)):
        if not name.endswith(".fuzz"):
            continue
        with open(os.path.join(corpus, name), "rb") as f:
            data = f.read()
        try:
            im = JxlImage(approx_memory_limit=128 << 20)
            im.feed_bytes(data)
            im.finish()
            for fr in im._frames:
                from jxl_oxide_tpu.headers.frame import Encoding

                if fr.header.encoding == Encoding.MODULAR:
                    fr.decode_modular_frame()
        except JxlError:
            pass

print("ASAN_OK")
