"""Batched cyclic-Jacobi eigensolver for small Hermitian matrices.

XLA's ``eigh`` lowers to a QR-style algorithm that is profiled to
dominate the whole enhancement pipeline for the (B*F, N, N) batches this
domain produces (N = mics <= 8, thousands of independent matrices).  A
cyclic Jacobi sweep is the textbook fit: every rotation is a tiny
batched matmul over the full (B, F) batch on the VPU, the pair schedule
is static, and a handful of sweeps reaches fp32 accuracy for N <= 8.

Matches jnp.linalg.eigh's convention: eigenvalues ascending, eigenvectors
in columns (up to per-column phase, which all downstream consumers are
invariant to or re-anchor via fix_steer_phase).
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["jacobi_eigh"]


def _rotation(a, p, q, eps):
    """Complex Givens rotation parameters zeroing A[p,q] (batched)."""
    app = jnp.real(a[..., p, p])
    aqq = jnp.real(a[..., q, q])
    apq = a[..., p, q]
    mag = jnp.abs(apq)
    # phase of the off-diagonal entry; identity rotation when ~zero
    safe = mag > eps
    phase = jnp.where(safe, apq / jnp.maximum(mag, eps), 1.0 + 0.0j)
    tau = (aqq - app) / (2.0 * jnp.maximum(mag, eps))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(safe, t, 0.0)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    return c.astype(a.dtype), (s * phase).astype(a.dtype)


@partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(a: jax.Array, sweeps: int = 8):
    """Eigendecomposition of batched Hermitian ``(..., N, N)`` matrices.

    Returns (w ascending real eigenvalues, v eigenvector columns).
    ``sweeps`` full cyclic sweeps (N(N-1)/2 rotations each); 6-10 is
    ample for N <= 8 in fp32.
    """
    n = a.shape[-1]
    eps = jnp.asarray(1e-30, dtype=jnp.float32)
    v = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    pairs = [(p, q) for p in range(n) for q in range(p + 1, n)]

    def sweep(carry, _):
        a, v = carry
        for p, q in pairs:  # static unroll: 15 rotations for N=6
            c, s = _rotation(a, p, q, eps)
            # apply G on columns p,q and G^H on rows p,q without
            # materializing the full rotation matrix
            col_p = a[..., :, p]
            col_q = a[..., :, q]
            new_p = c[..., None] * col_p - jnp.conj(s)[..., None] * col_q
            new_q = s[..., None] * col_p + c[..., None] * col_q
            a = a.at[..., :, p].set(new_p).at[..., :, q].set(new_q)
            row_p = a[..., p, :]
            row_q = a[..., q, :]
            new_rp = c[..., None] * row_p - s[..., None] * row_q
            new_rq = jnp.conj(s)[..., None] * row_p + c[..., None] * row_q
            a = a.at[..., p, :].set(new_rp).at[..., q, :].set(new_rq)
            vp = v[..., :, p]
            vq = v[..., :, q]
            nvp = c[..., None] * vp - jnp.conj(s)[..., None] * vq
            nvq = s[..., None] * vp + c[..., None] * vq
            v = v.at[..., :, p].set(nvp).at[..., :, q].set(nvq)
        return (a, v), None

    (a, v), _ = jax.lax.scan(sweep, (a, v), None, length=sweeps)
    w = jnp.real(jnp.diagonal(a, axis1=-2, axis2=-1))
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    return w, v
