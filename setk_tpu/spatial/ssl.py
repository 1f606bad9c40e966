"""Sound-source localization: ML / SRP-PHAT / MUSIC — batched JAX.

Math parity: /root/reference/scripts/sptk/libs/ssl.py.  Layout convention
matches the reference CLIs: stft (M, T, F), steering grid sv (A, M, F),
masks (T, F) or (N, T, F); all backends reduce to a DoA-index argmax
computed on device (scores are also returned for visualization parity
with visualize_angular_spectrum.py).
"""

import jax
import jax.numpy as jnp

from setk_tpu.utils.common import GRAM_PRECISION

__all__ = ["ml_ssl", "srp_ssl", "music_ssl"]


def ml_ssl(stft: jax.Array,
           sv: jax.Array,
           compression: float = 0,
           eps: float = 1e-8,
           norm: bool = False,
           mask: jax.Array | None = None,
           return_scores: bool = False):
    """Maximum-likelihood SSL.

    Per-TF log-likelihood of each steering direction, mask-weighted and
    summed; multi-source masks (N, T, F) give one DoA per source.
    Parity: /root/reference/scripts/sptk/libs/ssl.py:12-43.
    """
    _, t, f = stft.shape
    if mask is None:
        mask = jnp.ones((t, f))
    sv = sv / jnp.linalg.norm(sv, axis=1, keepdims=True)
    if norm:
        stft = stft / jnp.maximum(jnp.abs(stft), eps)
    ssh = jnp.abs(jnp.einsum("mtf,mtf->tf", stft, jnp.conj(stft)))
    ssv = jnp.abs(jnp.einsum("amf,mtf->atf", sv, jnp.conj(stft)))**2
    delta = ssh[None] - ssv / (1 + eps)
    if compression <= 0:
        tf_loglike = -jnp.log(jnp.maximum(delta, eps))
    else:
        tf_loglike = -jnp.power(delta, compression)
    if mask.ndim == 2:
        loglike = jnp.sum(mask[None] * tf_loglike, axis=(1, 2))
    else:
        loglike = jnp.einsum("ntf,atf->na", mask, tf_loglike)
    idx = jnp.argmax(loglike, axis=-1)
    return (idx, loglike) if return_scores else idx


def srp_ssl(stft: jax.Array,
            sv: jax.Array,
            srp_pair,
            mask: jax.Array | None = None,
            return_scores: bool = False):
    """SRP-PHAT SSL over explicit mic index pairs.

    srp_pair: (index_l, index_r) arrays of pair indices.
    Parity: /root/reference/scripts/sptk/libs/ssl.py:46-77.
    """
    if srp_pair is None:
        raise ValueError("srp_pair cannot be None, (list, list)")
    _, t, f = stft.shape
    if mask is None:
        mask = jnp.ones((t, f))
    index_l, index_r = srp_pair
    index_l = jnp.asarray(index_l)
    index_r = jnp.asarray(index_r)
    obs_pha = jnp.angle(stft)
    ora_pha = jnp.angle(sv)
    obs_ipd = obs_pha[index_l] - obs_pha[index_r]  # P x T x F
    ora_ipd = ora_pha[:, index_l] - ora_pha[:, index_r]  # A x P x F
    # same sum as the reference's mean_p cos(obs - ora) summed over the
    # masked (T, F) plane, via cos(x - y) = cos x cos y + sin x sin y
    # with the T reduction FIRST: the naive (A, P, T, F) broadcast costs
    # A*P*T*F transcendentals (~175 ms at A=181 P=15 4 s — it dominated
    # the WPE->SRP->SD cascade), the factored form P*T*F trig + an
    # (A, P*F) matvec that rides the MXU (~100x fewer ops, bitwise-
    # equal argmax up to fp reassociation).
    co = jnp.sum(jnp.cos(obs_ipd) * mask[None], axis=1)  # P x F
    si = jnp.sum(jnp.sin(obs_ipd) * mask[None], axis=1)  # P x F
    srp = (jnp.einsum("apf,pf->a", jnp.cos(ora_ipd), co,
                      precision=GRAM_PRECISION) +
           jnp.einsum("apf,pf->a", jnp.sin(ora_ipd), si,
                      precision=GRAM_PRECISION)) / index_l.shape[0]
    idx = jnp.argmax(srp)
    return (idx, srp) if return_scores else idx


def music_ssl(stft: jax.Array,
              sv: jax.Array,
              mask: jax.Array | None = None,
              return_scores: bool = False):
    """MUSIC: noise-subspace orthogonality score, batched eigh over bins.

    Parity: /root/reference/scripts/sptk/libs/ssl.py:80-110.
    """
    _, t, f = stft.shape
    if mask is None:
        mask = jnp.ones((t, f))
    obs = jnp.transpose(stft * mask, (2, 0, 1))  # F x M x T
    covar = jnp.einsum("...at,...bt->...ab", obs, jnp.conj(obs),
                       precision=GRAM_PRECISION) / t
    from setk_tpu.ops.linalg import eigh as _eigh
    _, vecs = _eigh(covar)
    noise_sub = vecs[..., :-1]
    noise_covar = jnp.einsum("...at,...bt->...ab", noise_sub,
                             jnp.conj(noise_sub))
    sv_f = jnp.transpose(sv, (2, 0, 1))  # F x A x M
    denorm = jnp.einsum("fam,fmn,fan->fa", jnp.conj(sv_f), noise_covar, sv_f)
    score = jnp.sum(jnp.abs(denorm), axis=0)
    idx = jnp.argmin(score)
    return (idx, score) if return_scores else idx
