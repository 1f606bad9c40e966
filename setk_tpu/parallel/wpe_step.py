"""Multi-chip WPE: (data x freq) sharded dereverberation step.

WPE's NK x NK normal equations are independent per (utterance, bin)
(/root/reference/scripts/sptk/libs/wpe.py:58-77 builds and solves one
system per frequency), so the SPMD program shards utterances over the
``data`` mesh axis and frequency bins over ``freq`` with NO collectives
— each shard runs the full tap-stack/lambda/solve iteration locally
(SURVEY.md §2.3 per-frequency independence).  The time axis stays
local: tap delays reach ``delay + taps`` frames back, so a ``seq``
sharding would need halo exchanges for no win (the solves, not the
sums, dominate).
"""

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from setk_tpu.enhance.wpe import wpe

__all__ = ["sharded_wpe_step", "sharded_wpd_step"]


def sharded_wpe_step(mesh: Mesh,
                     taps: int = 10,
                     delay: int = 3,
                     context: int = 1,
                     num_iters: int = 3):
    """Build the jitted multi-chip WPE step over ``mesh``.

    Returns step(obs) with obs (B, F, N, T) complex; B must divide by
    the ``data`` axis and F by ``freq``.  Output: dereverberated
    (B, F, N, T), sharded the same way.
    """

    def local(obs_l):
        return wpe(obs_l, taps=taps, delay=delay, context=context,
                   num_iters=num_iters)

    fn = shard_map(local,
                   mesh=mesh,
                   in_specs=(P("data", "freq", None, None),),
                   out_specs=P("data", "freq", None, None))
    return jax.jit(fn)


def sharded_wpd_step(mesh: Mesh,
                     cgmm_iters: int = 10,
                     wpd_iters: int = 3,
                     taps: int = 10,
                     delay: int = 3,
                     context: int = 1):
    """Build the jitted multi-chip factored-WPD step over ``mesh``.

    Every WPD stage (WPE normal equations, per-bin CGMM EM, per-bin
    weighted MVDR — /root/reference/scripts/sptk/libs/wpe.py:113-177)
    is independent per (utterance, bin), so the cascade shards
    (data x freq) shard-locally like ``sharded_wpe_step``.  Returns
    step(obs) -> (tf_mask (B, F, T), enhanced (B, F, T)).
    """
    from setk_tpu.enhance.wpe import wpd

    def local(obs_l):
        return wpd(obs_l, cgmm_iters=cgmm_iters, wpd_iters=wpd_iters,
                   taps=taps, delay=delay, context=context)

    fn = shard_map(local,
                   mesh=mesh,
                   in_specs=(P("data", "freq", None, None),),
                   out_specs=(P("data", "freq", None),
                              P("data", "freq", None)))
    return jax.jit(fn)
