"""Subprocess harness for the TSan native build: drives the THREADED
native entry points — the persistent WorkerPool, the LF-group batch
decoder, the HF pass-group batch decoder, the parallel memzero, and the
modular batch decoder — over multi-LF-group streams with maximum
concurrency, repeated so the pool restarts and the run_mu_ caller
serialization get exercised. Runs WITHOUT importing jax (sanitizer
runtimes and XLA don't mix). Run by test_native_tsan_clean with
LD_PRELOAD=libtsan.so and JXL_TPU_NATIVE_SANITIZE=thread.

Prints TSAN_OK on success; ThreadSanitizer reports abort the process
(halt_on_error=1).
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

import numpy as np  # noqa: E402

from jxl_oxide_tpu import native  # noqa: E402

assert native.available(), "tsan native build failed"

from encoder import encode_jxl_modular  # noqa: E402
from encoder_vardct import encode_jxl_vardct_tiled  # noqa: E402

from jxl_oxide_tpu import JxlImage  # noqa: E402
from jxl_oxide_tpu.io.bitstream import Bitstream  # noqa: E402
from jxl_oxide_tpu.render.vardct import (  # noqa: E402
    HfGlobal,
    VardctFrameState,
    _decode_lf_groups_batch,
    _decode_pass_groups_batch,
    parse_lf_group,
)

rng = np.random.default_rng(11)

# multi-LF-group VarDCT stream: 4096x256 = 2 LF groups, 16 pass groups
h, w = 4096, 256
bh, bw = h // 8, w // 8
sel = np.zeros((bh, bw), dtype=np.int64)
mul = np.ones((bh, bw), dtype=np.int64) * 2
coeff = rng.integers(-15, 16, (3, h, w)).astype(np.int64)
coeff[rng.random((3, h, w)) < 0.7] = 0
lf_q = rng.integers(-40, 41, (3, bh, bw)).astype(np.int64)
data = encode_jxl_vardct_tiled(h, w, sel, mul, coeff, lf_q,
                               gabor=True, epf_iters=2)

for rep in range(3):  # repeat: pool reuse + round-state transitions
    img = JxlImage(num_threads=4)
    img.feed_bytes(data)
    img.finish()
    frame = img._frames[0]
    header = frame.header
    lf_global = frame.parse_lf_global()
    state = VardctFrameState(frame)
    lf_jobs = list(range(header.num_lf_groups))
    done = _decode_lf_groups_batch(frame, state, lf_global, lf_jobs, {})
    for lf_idx in (i for i in lf_jobs if i not in done):
        bs = Bitstream(frame.section_bytes(frame.toc.entry_for("lf_group",
                                                               lf_idx)))
        state.place_lf_group(lf_idx, parse_lf_group(
            bs, frame.image_header, header, lf_global, lf_idx, None))
    hf_global = HfGlobal(
        Bitstream(frame.section_bytes(frame.toc.entry_for("hf_global"))),
        frame.image_header, header, lf_global)
    by_group = {}
    for p in range(header.passes.num_passes):
        for g in range(header.num_groups):
            by_group.setdefault(g, []).append((p, g))
    leftover = _decode_pass_groups_batch(
        frame, state, hf_global, by_group, [{}], lf_global.gmodular)
    assert not leftover, "batch refused jobs"
    assert np.abs(np.stack(state.coeff_planes)).max() > 0

# concurrent CALLERS of the pool (run_mu_ serialization): two Python
# threads each driving full host stages at once
import threading  # noqa: E402

def _one_host_stage():
    img2 = JxlImage(num_threads=4)
    img2.feed_bytes(data)
    img2.finish()
    f2 = img2._frames[0]
    lfg2 = f2.parse_lf_global()
    st2 = VardctFrameState(f2)
    jobs = list(range(f2.header.num_lf_groups))
    _decode_lf_groups_batch(f2, st2, lfg2, jobs, {})
    hg2 = HfGlobal(
        Bitstream(f2.section_bytes(f2.toc.entry_for("hf_global"))),
        f2.image_header, f2.header, lfg2)
    byg = {}
    for p in range(f2.header.passes.num_passes):
        for g in range(f2.header.num_groups):
            byg.setdefault(g, []).append((p, g))
    _decode_pass_groups_batch(f2, st2, hg2, byg, [{}], lfg2.gmodular)

threads = [threading.Thread(target=_one_host_stage) for _ in range(2)]
for t in threads:
    t.start()
for t in threads:
    t.join()

# modular batch decoder (threaded MA-tree walk + transforms)
chans = [rng.integers(0, 256, (600, 560), dtype=np.int64) for _ in range(3)]
mimg = JxlImage(num_threads=4)
mimg.feed_bytes(encode_jxl_modular(chans, bit_depth=8, squeeze=True))
mimg.finish()
out = mimg._frames[0].decode_modular_frame()
for c, o in zip(chans, out):
    assert np.array_equal(c, o)

# segment-parallel jbr scan encode (restart intervals, round 5)
sys.path.insert(0, os.path.join(ROOT, "tests"))
from test_jbr import make_fake_frame, make_jbrd_box_dri  # noqa: E402

from jxl_oxide_tpu.jbr import (  # noqa: E402
    JpegBitstreamData,
    reconstruct_jpeg,
)

quantj = np.full((8, 8), 16, dtype=np.int32)
jh, jw = 128, 512
lfj = rng.integers(-15, 16, (jh // 8, jw // 8)).astype(np.int32)
cj = rng.integers(-4, 5, (jh, jw)).astype(np.int32)
cj[rng.random((jh, jw)) < 0.7] = 0
jpeg = reconstruct_jpeg(
    JpegBitstreamData(make_jbrd_box_dri(8)),
    make_fake_frame(jw, jh, lfj, cj, quantj),
)
assert jpeg.count(b"\xff\xd0") >= 1

print("TSAN_OK")
