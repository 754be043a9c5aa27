"""DCT family as MXU-friendly matmuls.

Behavioral parity: jxl-render/src/vardct/generic/dct.rs (recursive radix-2
DCT). The reference's normalization convention (verified by its unit tests,
dct.rs:300-430):

  forward:  F[k] = (1/N) * sum_n x[n] * cos(pi*k*(2n+1)/(2N)),  F[k!=0] *= sqrt(2)
  inverse:  x[k] = F[0] + sqrt(2) * sum_{n>=1} F[n] * cos(pi*n*(2k+1)/(2N))

Both are plain matrix products, so on TPU a 2D (I)DCT of an [n, h, w] batch of
blocks is two batched matmuls that map straight onto the MXU:

  idct2d(C) = B_h @ C @ B_w^T        with  B_N[x, k] = inv basis
  dct2d(X)  = A_h @ X @ A_w^T        with  A_N[k, x] = fwd basis

The reference's recursive implementation is an FFT-style algorithm for CPUs;
a matmul against a precomputed basis is the idiomatic TPU formulation (the
MXU does 128x128 systolic matmuls; all JXL block sizes are <= 256).

Basis matrices are computed in float64 and cast to float32 once, cached.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "dct_basis_forward",
    "dct_basis_inverse",
    "dct2d",
    "idct2d",
    "dct2d_batched_jax",
    "idct2d_batched_jax",
]


@functools.lru_cache(maxsize=None)
def dct_basis_forward(n: int) -> np.ndarray:
    """A[k, x]: forward DCT matrix, F = A @ x (float32, computed in f64)."""
    if n == 1:
        return np.ones((1, 1), dtype=np.float32)
    k = np.arange(n, dtype=np.float64)[:, None]
    x = np.arange(n, dtype=np.float64)[None, :]
    mat = np.cos(np.pi * k * (2.0 * x + 1.0) / (2.0 * n)) / n
    mat[1:, :] *= np.sqrt(2.0)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=None)
def dct_basis_inverse(n: int) -> np.ndarray:
    """B[x, k]: inverse DCT matrix, x = B @ F. Equals N * A^T."""
    if n == 1:
        return np.ones((1, 1), dtype=np.float32)
    x = np.arange(n, dtype=np.float64)[:, None]
    k = np.arange(n, dtype=np.float64)[None, :]
    mat = np.cos(np.pi * k * (2.0 * x + 1.0) / (2.0 * n))
    mat[:, 1:] *= np.sqrt(2.0)
    mat[:, 0] = 1.0
    return mat.astype(np.float32)


def dct2d(block: np.ndarray) -> np.ndarray:
    """Forward 2D DCT (numpy oracle), any power-of-two (h, w)."""
    h, w = block.shape[-2:]
    a_h = dct_basis_forward(h)
    a_w = dct_basis_forward(w)
    return np.einsum("ky,...yx,lx->...kl", a_h, block.astype(np.float32), a_w)


def idct2d(coeff: np.ndarray) -> np.ndarray:
    """Inverse 2D DCT (numpy oracle)."""
    h, w = coeff.shape[-2:]
    b_h = dct_basis_inverse(h)
    b_w = dct_basis_inverse(w)
    return np.einsum("yk,...kl,xl->...yx", b_h, coeff.astype(np.float32), b_w)


def dct2d_batched_jax(blocks, h: int, w: int):
    """Forward 2D DCT of [..., h, w] on device (two MXU matmuls)."""
    import jax.numpy as jnp

    a_h = jnp.asarray(dct_basis_forward(h))
    a_w = jnp.asarray(dct_basis_forward(w))
    return jnp.einsum(
        "ky,...yx,lx->...kl", a_h, blocks, a_w, preferred_element_type=jnp.float32
    )


def idct2d_batched_jax(coeffs, h: int, w: int):
    """Inverse 2D DCT of [..., h, w] on device (two MXU matmuls)."""
    import jax.numpy as jnp

    b_h = jnp.asarray(dct_basis_inverse(h))
    b_w = jnp.asarray(dct_basis_inverse(w))
    return jnp.einsum(
        "yk,...kl,xl->...yx", b_h, coeffs, b_w, preferred_element_type=jnp.float32
    )
