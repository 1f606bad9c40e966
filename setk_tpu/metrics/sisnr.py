"""Scale-invariant SNR (Si-SNR/Si-SDR) — batched JAX + permutation search.

Parity: /root/reference/scripts/sptk/libs/metric.py:13-60 (zero-mean
projection, 20*log10 ratio, max over source permutations).
"""

from itertools import permutations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["si_snr", "batch_si_snr", "permute_si_snr"]


def si_snr(x, s, eps: float = 1e-8, remove_dc: bool = True):
    """Si-SNR of estimate ``x`` vs reference ``s`` over the last axis.

    Accepts arbitrary leading batch axes; returns dB with the same
    leading shape.
    """
    x = jnp.asarray(x)
    s = jnp.asarray(s)
    if remove_dc:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
        s = s - jnp.mean(s, axis=-1, keepdims=True)
    t = (jnp.sum(x * s, axis=-1, keepdims=True) * s /
         (jnp.sum(s * s, axis=-1, keepdims=True) + eps))
    n = x - t
    ratio = (jnp.linalg.norm(t, axis=-1) /
             (jnp.linalg.norm(n, axis=-1) + eps))
    return 20 * jnp.log10(ratio + eps)


# alias used in batch pipelines
batch_si_snr = si_snr


def permute_si_snr(xlist, slist, align: bool = False):
    """Max average Si-SNR over source permutations.

    ``xlist``/``slist``: sequences (or stacked arrays with leading source
    axis) of equal-length signals.  With ``align=True`` also returns the
    best permutation tuple.
    """
    x = jnp.stack([jnp.asarray(v) for v in xlist])
    s = jnp.stack([jnp.asarray(v) for v in slist])
    num = x.shape[0]
    if num != s.shape[0]:
        raise RuntimeError(
            f"Source count mismatch: {num} vs {s.shape[0]}")
    # pairwise matrix in one shot: (est, ref)
    pair = si_snr(x[:, None, :], s[None, :, :])
    pair = np.asarray(pair)
    perms = list(permutations(range(num)))
    scores = [np.mean([pair[i, p[i]] for i in range(num)]) for p in perms]
    best = int(np.argmax(scores))
    if align:
        return float(scores[best]), perms[best]
    return float(scores[best])
