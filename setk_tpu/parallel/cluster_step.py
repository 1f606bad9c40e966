"""Sharded CGMM EM: the multi-chip spatial-clustering program.

The reference runs CGMM EM one utterance per process
(/root/reference/scripts/sptk/estimate_cgmm_masks.py with run.pl
sharding).  Here one SPMD program spans the (data, seq, freq) mesh:

    data — utterance batch shards (the run.pl analog)
    freq — per-bin mixture models are independent, so F shards freely
    seq  — the E/M sufficient statistics (covariance numerators, mask
           denominators, priors) are sums over frames T, psum-reduced
           over the ``seq`` axis each iteration — this domain's
           sequence parallelism (SURVEY.md §5)

Per iteration the only collectives are psums of (K, B_l, F_l, M, M)
numerators + (K, B_l, F_l) denominators over ``seq`` and a scalar psum
for the Q log — all riding ICI; posteriors never leave their shard.
Frequency-permutation alignment stays a host-side post-pass
(enhance/cluster.permu_aligner), as in the reference.
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from setk_tpu.enhance import beamformer as bf
from setk_tpu.enhance.cluster import _cgmm_quad, _posterior
from setk_tpu.ops.linalg import regularized_inverse
from setk_tpu.utils.common import EPSILON

__all__ = ["sharded_cgmm_step"]


def _psum_covar_stats(obs_l, weight_l):
    """Frame-shard covariance sufficient statistics, psum over seq."""
    num, den = bf.covar_stats(obs_l[None], weight_l)
    num = jax.lax.psum(num, "seq")
    den = jax.lax.psum(den, "seq")
    return num, den


def sharded_cgmm_step(mesh: Mesh,
                      num_classes: int = 2,
                      num_iters: int = 20,
                      update_alpha: bool = False,
                      seed: int = 0):
    """Build the jitted multi-chip CGMM EM over ``mesh``.

    Returns step(obs) with obs (B, F, M, T) complex64; B must divide by
    the ``data`` axis, F by ``freq``, T by ``seq``.  Output:
    (gamma (K, B, F, T) sharded like the input, q_history (num_iters,)
    replicated).  K=2 uses the deterministic Higuchi init (sample
    covariance / identity, reference cluster.py:419-426) with the
    sample covariance psum-reduced over seq.
    """
    t_shards = mesh.shape["seq"]

    def local_step(obs_l):
        # obs_l: (B_l, F_l, M, T_l)
        *_, m, t_l = obs_l.shape
        t_total = t_l * t_shards
        if num_classes == 2:
            rs_num, _ = _psum_covar_stats(
                obs_l, jnp.ones(obs_l.shape[:-2] + (t_l,),
                                dtype=jnp.float32)[None])
            rs = rs_num[0] / t_total
            rn = jnp.broadcast_to(jnp.eye(m, dtype=obs_l.dtype), rs.shape)
            covar = jnp.stack([rs, rn])
        else:
            # decorrelate the random init across shards
            key = jax.random.PRNGKey(seed)
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            key = jax.random.fold_in(key, jax.lax.axis_index("freq"))
            key = jax.random.fold_in(key, jax.lax.axis_index("seq"))
            gamma = jax.random.uniform(
                key, (num_classes, *obs_l.shape[:-2], t_l))
            gamma = gamma / jnp.sum(gamma, 0, keepdims=True)
            num, den = _psum_covar_stats(obs_l, gamma)
            covar = num / jnp.maximum(den, EPSILON)[..., None, None]
        r_inv = regularized_inverse(covar)
        phi = _cgmm_quad(obs_l, r_inv) / m
        alpha = jnp.full((num_classes, *obs_l.shape[:-2]),
                         1.0 / num_classes)
        gamma, _ = _predict(obs_l, phi, covar, alpha, m)

        def em_iter(carry, _):
            phi, covar, alpha, gamma = carry
            num, den = _psum_covar_stats(obs_l, gamma * m / phi)
            covar = num / jnp.maximum(den, EPSILON)[..., None, None]
            r_inv = regularized_inverse(covar)
            phi = _cgmm_quad(obs_l, r_inv) / m
            if update_alpha:
                alpha = (jax.lax.psum(jnp.sum(gamma, -1), "seq") /
                         t_total)
            gamma, q_local = _predict(obs_l, phi, covar, alpha, m)
            # global Q: mean over every shard (out_specs replicate it)
            q = jax.lax.pmean(
                jax.lax.pmean(jax.lax.pmean(q_local, "seq"), "freq"),
                "data")
            return (phi, covar, alpha, gamma), q

        (_, _, _, gamma), q_hist = jax.lax.scan(
            em_iter, (phi, covar, alpha, gamma), None, length=num_iters)
        return gamma, q_hist

    def _predict(obs_l, phi, covar, alpha, m):
        r_inv, logdet = regularized_inverse(covar, return_logdet=True)
        log_pdf = -m * jnp.log(phi) - logdet[..., None]
        return _posterior(log_pdf, alpha)

    fn = shard_map(local_step,
                   mesh=mesh,
                   in_specs=P("data", "freq", None, "seq"),
                   out_specs=(P(None, "data", "freq", "seq"), P()),
                   check_vma=False)
    return jax.jit(fn)
