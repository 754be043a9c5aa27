"""Sharded decode tests on the 8-device virtual CPU mesh: halo exchange
correctness and sharded-vs-single-device pipeline equivalence (the analog
of the reference's crop-consistency suite, validating the halo contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from jxl_oxide_tpu.ops.filters import gabor
from jxl_oxide_tpu.parallel import (
    decode_mesh,
    halo_exchange_rows,
    sharded_vardct_pipeline,
)


def test_mesh_has_8_devices():
    mesh = decode_mesh()
    assert mesh.devices.size == 8


def test_halo_exchange_matches_mirror_pad():
    mesh = decode_mesh()
    n = mesh.devices.size
    h, w = 8 * n, 16
    x = np.arange(h * w, dtype=np.float32).reshape(h, w)

    def body(local):
        return halo_exchange_rows(local, 2, "groups")

    fn = shard_map(body, mesh=mesh, in_specs=P("groups", None),
                   out_specs=P("groups", None))
    out = np.asarray(jax.jit(fn)(x))
    # each shard's padded block stacked: shard i rows = [halo-above, 8, halo-below]
    out = out.reshape(n, 12, w)
    padded = np.pad(x, ((2, 2), (0, 0)), mode="symmetric")
    for i in range(n):
        expected = padded[i * 8 : i * 8 + 12]
        np.testing.assert_array_equal(out[i], expected)


def test_sharded_pipeline_matches_single_device():
    mesh = decode_mesh()
    h, w = 64, 64
    rng = np.random.default_rng(0)
    coeff = rng.integers(-50, 50, size=(3, h, w), dtype=np.int32)
    lf = rng.standard_normal((3, h // 8, w // 8)).astype(np.float32)
    dmap = np.abs(rng.standard_normal((3, h, w)).astype(np.float32)) + 0.01
    kx = rng.standard_normal((h, w)).astype(np.float32) * 0.01
    kb = rng.standard_normal((h, w)).astype(np.float32) * 0.01

    fn, shardings = sharded_vardct_pipeline(mesh, h, w)
    args = [
        jax.device_put(a, s)
        for a, s in zip((coeff, lf, dmap, kx, kb), shardings)
    ]
    sharded_out = np.asarray(fn(*args))

    # single-device reference: same math, whole-plane
    from jxl_oxide_tpu.ops.dct import idct2d

    q = coeff.astype(np.float32)
    safe = np.where(q == 0.0, 1.0, q)
    biased = np.where(np.abs(q) <= 1.0, q * 0.1, q - 0.145 / safe)
    c = biased * dmap
    c[0] += kx * c[1]
    c[2] += kb * c[1]
    blocks = c.reshape(3, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)
    blocks[:, :, :, 0, 0] = lf
    pix = idct2d(blocks)
    pix = pix.transpose(0, 1, 3, 2, 4).reshape(3, h, w)
    expected = np.stack([
        np.asarray(gabor(pix[ch], (0.115169525, 0.061248592)))
        for ch in range(3)
    ])
    np.testing.assert_allclose(sharded_out, expected, atol=2e-4)


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)
    assert out.shape[0] == 3
    g.dryrun_multichip(8)


def test_multihost_mesh_equivalence():
    """2-D (hosts, chips) mesh decode == 1-D mesh decode == replicated:
    validates the DCN/ICI split sharding (SURVEY 5 multi-host design)."""
    import jax

    from jxl_oxide_tpu.parallel.sharded import (
        decode_mesh,
        decode_mesh_multihost,
        sharded_vardct_pipeline,
    )

    h, w = 128, 64
    rng = np.random.default_rng(31)
    coeff = rng.integers(-40, 40, (3, h, w)).astype(np.int32)
    lf = rng.normal(size=(3, h // 8, w // 8)).astype(np.float32)
    dmap = rng.uniform(0.5, 2.0, (3, h, w)).astype(np.float32)
    kx = rng.normal(size=(h, w)).astype(np.float32) * 0.1
    kb = rng.normal(size=(h, w)).astype(np.float32) * 0.1
    args = (coeff, lf, dmap, kx, kb)

    mesh1 = decode_mesh(8)
    fn1, sh1 = sharded_vardct_pipeline(mesh1, h, w)
    out1 = np.asarray(fn1(*(jax.device_put(a, s) for a, s in zip(args, sh1))))

    mesh2 = decode_mesh_multihost(2, 4)
    fn2, sh2 = sharded_vardct_pipeline(mesh2, h, w)
    out2 = np.asarray(fn2(*(jax.device_put(a, s) for a, s in zip(args, sh2))))

    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_sharded_epf_matches_single_device():
    """EPF across shards with an 8-row ICI halo equals the single-device
    whole-plane EPF (3px stencil contract, frame/lib.rs:626-649)."""
    import jax

    from jxl_oxide_tpu.headers.frame import EpfParams
    from jxl_oxide_tpu.ops.filters import apply_epf, apply_gabor
    from jxl_oxide_tpu.parallel.sharded import (
        decode_mesh,
        sharded_vardct_pipeline,
    )

    h, w = 128, 64
    epf = EpfParams(iters=3)
    rng = np.random.default_rng(43)
    coeff = rng.integers(-30, 30, (3, h, w)).astype(np.int32)
    lf = rng.normal(size=(3, h // 8, w // 8)).astype(np.float32)
    dmap = rng.uniform(0.5, 2.0, (3, h, w)).astype(np.float32)
    kx = rng.normal(size=(h, w)).astype(np.float32) * 0.1
    kb = rng.normal(size=(h, w)).astype(np.float32) * 0.1
    args = (coeff, lf, dmap, kx, kb)

    mesh = decode_mesh(8)
    fn, sh = sharded_vardct_pipeline(mesh, h, w, epf_params=epf)
    sharded = np.asarray(
        fn(*(jax.device_put(a, s) for a, s in zip(args, sh)))
    )

    # single-device reference: same pre-filter pipeline without EPF,
    # then whole-plane EPF
    fn0, sh0 = sharded_vardct_pipeline(decode_mesh(1), h, w)
    base = np.asarray(fn0(*args))
    sigma = np.full((h, w), epf.sigma_for_modular, dtype=np.float32)
    want = np.asarray(apply_epf(list(base), sigma, epf))
    np.testing.assert_allclose(sharded, want, atol=2e-5)


# ---------------------------------------------------------------------------
# Real-decoder mesh tests: the ACTUAL fused pipeline (bucketed varblocks,
# per-block EPF sigma, CfL grids, LF smoothing) under shard_map, decoding
# real bitstreams — output must be identical to the single-device path.


def _random_varblock_grid(bh, bw, rng, types):
    """Tile the block grid with random varblocks from `types`."""
    from jxl_oxide_tpu.models.vardct import TransformType as T

    sel = np.full((bh, bw), -1, dtype=np.int64)
    mul = np.zeros((bh, bw), dtype=np.int64)
    covered = np.zeros((bh, bw), dtype=bool)
    for y in range(bh):
        for x in range(bw):
            if covered[y, x]:
                continue
            cands = []
            for t in types:
                w8, h8 = T.SELECT_SIZE[t]
                if (
                    y + h8 <= bh and x + w8 <= bw
                    # varblocks never cross a 32-block (256px) pass-group
                    # border — the invariant that makes group-row sharding
                    # communication-free for the transforms
                    and (y % 32) + h8 <= 32 and (x % 32) + w8 <= 32
                    and not covered[y : y + h8, x : x + w8].any()
                ):
                    cands.append(t)
            t = cands[int(rng.integers(len(cands)))]
            w8, h8 = T.SELECT_SIZE[t]
            covered[y : y + h8, x : x + w8] = True
            sel[y, x] = t
            mul[y, x] = int(rng.integers(1, 4))
    return sel, mul


def _decode_planes(data, mesh=None):
    from jxl_oxide_tpu import JxlImage

    img = JxlImage.from_bytes(data, mesh=mesh)
    r = img.render_frame(0)
    return np.stack([np.asarray(p, dtype=np.float32) for p in r.planes])


def test_mesh_real_pipeline_dct8_epf_gabor():
    """A real DCT8 bitstream with gaborish + 2-pass EPF decodes bit-
    identically on a 2-device mesh (rows of groups under shard_map with
    ppermute halo rows) and on one device."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(91)
    h = w = 512
    base = rng.random((h // 8, w // 8, 3)).astype(np.float32)
    rgb = np.repeat(np.repeat(base, 8, 0), 8, 1)
    rgb = np.clip(
        rgb + 0.02 * rng.random((h, w, 3)).astype(np.float32), 0, 1
    )
    data = encode_jxl_vardct(rgb, gabor=True, epf_iters=2)
    single = _decode_planes(data)
    sharded = _decode_planes(data, mesh=decode_mesh(2))
    np.testing.assert_array_equal(sharded, single)


def test_mesh_real_pipeline_mixed_8dev_multi_lf_group():
    """A 4096-row mixed-transform bitstream (multiple LF groups, 16 group
    rows, DCT8..DCT32 + AFV + DCT2/4/Hornuss + rectangular types, random
    hf_mul, CfL grids, EPF sharpness grid) decodes identically on the full
    8-device mesh and on one device — the real decoder program, sharded
    (VERDICT r1 item 1)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct_tiled

    from jxl_oxide_tpu.models.vardct import TransformType as T

    rng = np.random.default_rng(92)
    h, w = 4096, 256
    bh, bw = h // 8, w // 8
    types = [
        T.DCT8, T.HORNUSS, T.DCT2, T.DCT4, T.DCT16, T.DCT32,
        T.DCT16X8, T.DCT8X16, T.DCT32X16, T.DCT4X8, T.AFV0, T.AFV2,
    ]
    sel, mul = _random_varblock_grid(bh, bw, rng, types)
    coeff = rng.integers(-20, 21, (3, h, w)).astype(np.int64)
    coeff[rng.random((3, h, w)) < 0.7] = 0  # sparse, like real streams
    lf_q = rng.integers(-80, 81, (3, bh, bw)).astype(np.int64)
    h64, w64 = -(-h // 64), -(-w // 64)
    cfl = (
        rng.integers(-40, 41, (h64, w64)).astype(np.int64),
        rng.integers(-40, 41, (h64, w64)).astype(np.int64),
    )
    sharp = rng.integers(0, 8, (bh, bw)).astype(np.int64)
    data = encode_jxl_vardct_tiled(
        h, w, sel, mul, coeff, lf_q,
        gabor=True, epf_iters=2, sharpness=sharp, cfl_grids=cfl,
        skip_lf_smoothing=False,
    )
    single = _decode_planes(data)
    assert np.isfinite(single).all()
    sharded = _decode_planes(data, mesh=decode_mesh(8))
    np.testing.assert_array_equal(sharded, single)


def test_mesh_real_pipeline_multihost_2d():
    """The same real decode over a 2-D (hosts x chips) mesh: halo rows
    cross the flattened axis (DCN only at host-band borders)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct

    from jxl_oxide_tpu.parallel import decode_mesh_multihost

    rng = np.random.default_rng(93)
    h, w = 1024, 256
    rgb = rng.random((h, w, 3)).astype(np.float32)
    data = encode_jxl_vardct(rgb, gabor=True, epf_iters=1)
    single = _decode_planes(data)
    mesh2 = decode_mesh_multihost(2, 2)  # 4 devices, 4 group rows
    sharded = _decode_planes(data, mesh=mesh2)
    np.testing.assert_array_equal(sharded, single)


def test_mesh_falls_back_when_not_divisible():
    """Group rows not divisible by the mesh: decode falls back to the
    single-device path and still returns correct pixels."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(94)
    rgb = rng.random((320, 256, 3)).astype(np.float32)  # 2 group rows
    data = encode_jxl_vardct(rgb)
    single = _decode_planes(data)
    sharded = _decode_planes(data, mesh=decode_mesh(8))  # 2 % 8 != 0
    np.testing.assert_array_equal(sharded, single)


def test_mesh_real_pipeline_lf_frame_and_two_pass():
    """Mesh decode equals single-device for an LF-frame chain (the LF
    planes arrive pre-dequantized from the rendered LF frame) and for a
    two-pass progressive stream (coefficients accumulate across passes)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from encoder_vardct import encode_jxl_vardct

    rng = np.random.default_rng(95)
    rgb = rng.random((512, 256, 3)).astype(np.float32)
    for kw in ({"use_lf_frame": True}, {"num_passes": 2},
               {"use_lf_frame": True, "lf_levels": 2}):
        data = encode_jxl_vardct(rgb, gabor=True, **kw)
        single = _decode_planes(data)
        sharded = _decode_planes(data, mesh=decode_mesh(2))
        np.testing.assert_array_equal(sharded, single, err_msg=str(kw))
