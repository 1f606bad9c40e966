"""AuxIVA blind source separation (Ono 2011 auxiliary-function IP updates).

Math parity: /root/reference/scripts/sptk/apply_auxiva.py:24-57 — identity
demixing init, contrast R = sqrt(sum_f |y|^2), per-source rank-1 weighted
covariance V, IP update w = (W^H V)^{-1} e_n normalized by w^H V w.  The
reference loops every (f, n) pair on host; here the F-bin solves are one
batched ``jnp.linalg.solve`` and epochs run under ``lax.scan``.
"""

import jax
import jax.numpy as jnp

from setk_tpu.utils.common import EPSILON, GRAM_PRECISION

__all__ = ["auxiva"]


def auxiva(spectra: jax.Array, epochs: int = 20) -> jax.Array:
    """Separate (N, T, F) complex STFTs into N sources, same shape."""
    n, t, f = spectra.shape
    x = jnp.transpose(spectra, (2, 1, 0))  # F x T x N
    eye = jnp.eye(n, dtype=x.dtype)
    w_init = jnp.broadcast_to(eye, (f, n, n))

    def epoch(w, _):
        y = jnp.einsum("ftn,fnx->ftx", x, jnp.conj(w))
        r = jnp.sqrt(jnp.sum(jnp.abs(y)**2, axis=0))  # T x N
        gr = 1.0 / (r.T + EPSILON)  # N x T
        for src in range(n):  # static unroll, N is small
            # weighted covariance for this source: F x N x N
            v = jnp.einsum("t,ftx,fty->fxy", gr[src], x, jnp.conj(x),
                           precision=GRAM_PRECISION) / t
            # IP update: solve (W^H V) w = e_src per bin
            wh_v = jnp.einsum("fxn,fxy->fny", jnp.conj(w), v,
                              precision=GRAM_PRECISION)
            rhs = jnp.broadcast_to(eye[:, src], (f, n))
            wn = jnp.linalg.solve(wh_v, rhs[..., None])[..., 0]
            denom = jnp.einsum("fx,fxy,fy->f", jnp.conj(wn), v, wn,
                               precision=GRAM_PRECISION)
            w = w.at[:, :, src].set(wn / denom[:, None])
        return w, None

    w, _ = jax.lax.scan(epoch, w_init, None, length=epochs)
    y = jnp.einsum("ftn,fnx->ftx", x, jnp.conj(w))
    return jnp.transpose(y, (2, 1, 0))
