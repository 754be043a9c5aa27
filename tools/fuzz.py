"""Mutation fuzzer for the full decode path.

Seeds: the reference's fuzz-finding corpus + bitstreams from the in-repo
encoders; mutations: byte flips, bit flips, truncations, splices. Every
mutant must either decode or fail with JxlError under the 128 MiB alloc
budget — anything else (crash, non-Jxl exception, OOM) is a finding
(reference: fuzz/fuzz_targets/decode.rs:1-10, dim limit 65536, 128 MiB).

Usage:
  python tools/fuzz.py [--seconds 60] [--seed 0] [--save-dir DIR]

Findings are written to --save-dir (default tests/fuzz_found/) so they
can be replayed as regression tests.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

CORPUS_DIR = Path(
    "/root/reference/crates/jxl-oxide-tests/tests/fuzz_findings"
)
BUDGET = 128 << 20
MAX_DIM = 65536


def gather_seeds(rng) -> list[bytes]:
    seeds = []
    if CORPUS_DIR.is_dir():
        for p in sorted(CORPUS_DIR.glob("*.fuzz")):
            seeds.append(p.read_bytes())
    from encoder import encode_jxl_modular
    from encoder_vardct import encode_jxl_vardct

    chans = [rng.integers(0, 256, (40, 56)).astype(np.int64) for _ in range(3)]
    seeds.append(encode_jxl_modular(chans, bit_depth=8))
    seeds.append(encode_jxl_modular(chans, bit_depth=8, rct=True,
                                    squeeze=True))
    flat = [np.repeat(rng.integers(0, 256, (48, 4)).astype(np.int64), 12, 1)
            for _ in range(3)]
    seeds.append(encode_jxl_modular(flat, bit_depth=8, lz77_rle=True))
    # newer stream shapes: preview frame, float samples, typed/named ECs,
    # general LZ77 matches, custom tone mapping/animation, multi-preset
    seeds.append(encode_jxl_modular(
        chans, bit_depth=8,
        preview_channels=[rng.integers(0, 256, (16, 16)).astype(np.int64)
                          for _ in range(3)]))
    fvals = (rng.random((24, 24)) * 2 - 0.5).astype(np.float16)
    seeds.append(encode_jxl_modular(
        [fvals.view(np.uint16).astype(np.int64)], bit_depth=16,
        grayscale=True, float_exp_bits=5))
    seeds.append(encode_jxl_modular(
        chans + [rng.integers(0, 256, (40, 56)).astype(np.int64)],
        bit_depth=8,
        extra_channel_specs=[{"ty": 1, "name": "depth"}]))
    seeds.append(encode_jxl_modular(flat, bit_depth=8, lz77_matches=True))
    seeds.append(encode_jxl_modular(
        chans, bit_depth=8, tone_mapping=(1000.0, 0.1, False, 0.5),
        intrinsic_size=(20, 20)))
    seeds.append(
        encode_jxl_vardct(rng.random((64, 64, 3)).astype(np.float32),
                          gabor=True, epf_iters=1)
    )
    # late round 5: two-alpha MulAdd blend chain + full-mode patch —
    # exercises BlendingInfo.alpha_channel and the patch alpha token
    def _fr5():
        return [rng.integers(0, 256, (24, 24)).astype(np.int64)
                for _ in range(5)]
    seeds.append(encode_jxl_modular(
        _fr5(), bit_depth=8, extra_alpha=True, extra_alpha_associated=True,
        extra_channel_specs=[dict(ty=0)],
        animation_frames=[_fr5()],
        animation_blend={"mode": 3, "alpha_channel": 1}))
    seeds.append(encode_jxl_modular(
        _fr5()[:4], bit_depth=8, extra_alpha=True,
        reference_patch=(
            _fr5()[:4],
            dict(ref_idx=0, x0=2, y0=2, width=10, height=8, x=4, y=4,
                 mode=7, ec_modes=[5], clamp=True))))
    return seeds


def mutate(data: bytes, rng) -> bytes:
    buf = bytearray(data)
    op = rng.integers(5)
    if op == 0 and buf:  # byte flips
        for _ in range(int(rng.integers(1, 8))):
            buf[int(rng.integers(len(buf)))] = int(rng.integers(256))
    elif op == 1 and buf:  # bit flips
        for _ in range(int(rng.integers(1, 16))):
            i = int(rng.integers(len(buf)))
            buf[i] ^= 1 << int(rng.integers(8))
    elif op == 2 and len(buf) > 4:  # truncation
        buf = buf[: int(rng.integers(4, len(buf)))]
    elif op == 3 and len(buf) > 8:  # splice a chunk elsewhere
        a = int(rng.integers(len(buf) - 4))
        b = int(rng.integers(len(buf) - 4))
        n = int(rng.integers(1, min(32, len(buf) - max(a, b))))
        buf[a : a + n] = buf[b : b + n]
    else:  # random tail append
        buf += bytes(rng.integers(0, 256, int(rng.integers(1, 64))).tolist())
    return bytes(buf)


def try_decode(data: bytes) -> str | None:
    """Returns None if OK/JxlError, else a failure description."""
    from jxl_oxide_tpu import JxlImage
    from jxl_oxide_tpu.utils.errors import JxlError

    try:
        img = JxlImage(approx_memory_limit=BUDGET)
        img.feed_bytes(data)
        img.finish()
        hdr = img.image_header
        if hdr is not None and (
            hdr.size.width > MAX_DIM or hdr.size.height > MAX_DIM
            or hdr.size.width * hdr.size.height > (1 << 28)
        ):
            return None  # dimension limit: skip render (fuzz target gate)
        for i in range(img.num_keyframes):
            img.render_frame(i)
    except JxlError:
        return None
    except MemoryError:
        return "MemoryError escaped the alloc budget"
    except RecursionError:
        return "RecursionError"
    except Exception as e:
        return f"{type(e).__name__}: {e}"
    return None


def main() -> int:
    # host-only correctness sweep: force the CPU backend so the fuzzer
    # never blocks on a remote-device tunnel (the image's sitecustomize
    # pre-imports jax on the tunneled platform)
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save-dir", default=str(ROOT / "tests" / "fuzz_found"))
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    seeds = gather_seeds(rng)
    deadline = time.monotonic() + args.seconds
    n = 0
    findings = 0
    while time.monotonic() < deadline:
        if n and n % 200 == 0:
            # valid-enough mutants compile fresh XLA programs; jax's
            # internal LRU caches hold recent executables (mmaps) until
            # clear_caches — see tools/fuzz_diff.py run() for the
            # map-count exhaustion mechanics
            jax.clear_caches()
        seed = seeds[int(rng.integers(len(seeds)))]
        data = mutate(seed, rng)
        # occasional double mutation
        if rng.random() < 0.3:
            data = mutate(data, rng)
        t0 = time.monotonic()
        fail = try_decode(data)
        dt = time.monotonic() - t0
        if dt > 20.0:
            # a near-hang on a tiny input is itself a robustness finding
            # (decode cost must be bounded by the declared image size)
            findings += 1
            os.makedirs(args.save_dir, exist_ok=True)
            name = f"slow_{int(time.time())}_{n}.fuzz"
            with open(os.path.join(args.save_dir, name), "wb") as f:
                f.write(data)
            print(f"SLOW ({dt:.0f}s) saved to {name}", file=sys.stderr)
        n += 1
        if fail is not None:
            findings += 1
            os.makedirs(args.save_dir, exist_ok=True)
            name = f"finding_{int(time.time())}_{n}.fuzz"
            with open(os.path.join(args.save_dir, name), "wb") as f:
                f.write(data)
            print(f"FINDING ({fail}) saved to {name}", file=sys.stderr)
    print(f"fuzz: {n} inputs, {findings} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
