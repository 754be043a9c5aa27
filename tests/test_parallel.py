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
