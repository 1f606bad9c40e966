"""Pallas kernel tests (interpreter mode on CPU)."""

import numpy as np
import pytest

from setk_tpu.enhance.beamformer import (compute_covar, covar_stats,
                                         mvdr_weights)
from setk_tpu.ops.pallas.covariance import (compute_covar_pallas,
                                            masked_covar_pallas)
from setk_tpu.ops.pallas.mvdr import mvdr_power_pallas


def _obs(rng, b=2, f=24, n=4, t=96):
    obs = (rng.standard_normal((b, f, n, t)) +
           1j * rng.standard_normal((b, f, n, t))).astype(np.complex64)
    mask = rng.random((b, f, t)).astype(np.float32)
    return obs, mask


def test_kernel_matches_xla(rng):
    obs, mask = _obs(rng)
    ours = np.asarray(
        compute_covar_pallas(obs, mask, f_tile=8, interpret=True))
    ref = np.asarray(compute_covar(obs, mask))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_kernel_f_padding(rng):
    # F not a multiple of the tile -> internal padding path
    obs, mask = _obs(rng, f=13)
    ours = np.asarray(
        compute_covar_pallas(obs, mask, f_tile=8, interpret=True))
    ref = np.asarray(compute_covar(obs, mask))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_planar_outputs_hermitian(rng):
    obs, mask = _obs(rng, b=1, f=8, n=3, t=64)
    nre, nim, den = masked_covar_pallas(np.real(obs), np.imag(obs), mask,
                                        f_tile=8, interpret=True)
    num = np.asarray(nre) + 1j * np.asarray(nim)
    np.testing.assert_allclose(num, np.conj(np.swapaxes(num, -1, -2)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(den), mask.sum(-1), atol=1e-4)


def test_mvdr_kernel_matches_xla(rng):
    """Fused steer+Capon kernel vs the XLA power-iteration path."""
    obs, mask = _obs(rng, b=2, f=37, n=6, t=128)
    rs = compute_covar(obs, mask)
    rn = compute_covar(obs, 1 - mask)
    ref = np.asarray(mvdr_weights(rs, rn, steer="power", use_pallas=False))
    got = np.asarray(mvdr_power_pallas(rs, rn, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-4)


def test_mvdr_kernel_distortionless(rng):
    """w^H d = 1 on the (phase-anchored) steer direction."""
    obs, mask = _obs(rng, b=1, f=16, n=4, t=96)
    rs = compute_covar(obs, mask)
    rn = compute_covar(obs, 1 - mask)
    w = np.asarray(mvdr_power_pallas(rs, rn, interpret=True))
    from setk_tpu.ops.linalg import power_iteration, hermitianize
    from setk_tpu.enhance.beamformer import fix_steer_phase
    d = np.asarray(fix_steer_phase(power_iteration(hermitianize(rs),
                                                   num_iters=15)))
    resp = np.sum(np.conj(w) * d, axis=-1)
    np.testing.assert_allclose(resp, np.ones_like(resp), rtol=1e-3,
                               atol=1e-3)


def test_pair_covar_kernel_matches_two_calls(rng):
    from setk_tpu.ops.pallas.covariance_pair import compute_covar_pair_pallas
    obs, mask = _obs(rng, b=2, f=37, n=6, t=100)
    rs_ref = np.asarray(compute_covar(obs, mask))
    rn_ref = np.asarray(compute_covar(obs, 1 - mask))
    rs, rn = compute_covar_pair_pallas(obs, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(rs), rs_ref, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rn), rn_ref, atol=1e-4, rtol=1e-4)


def test_pair_covar_explicit_interference_mask(rng):
    from setk_tpu.ops.pallas.covariance_pair import compute_covar_pair_pallas
    obs, mask = _obs(rng, b=1, f=16, n=4, t=64)
    mask_n = np.random.default_rng(3).random((1, 16, 64)).astype(np.float32)
    _, rn = compute_covar_pair_pallas(obs, mask, mask_n, interpret=True)
    rn_ref = np.asarray(compute_covar(obs, mask_n))
    np.testing.assert_allclose(np.asarray(rn), rn_ref, atol=1e-4, rtol=1e-4)


def test_pair_covar_oracle_mask_stays_psd(rng):
    """Near-one masks: Rn from the literal (1-m) sum must stay PSD."""
    from setk_tpu.ops.pallas.covariance_pair import compute_covar_pair_pallas
    obs, _ = _obs(rng, b=1, f=8, n=4, t=64)
    mask = 1.0 - 1e-6 * rng.random((1, 8, 64)).astype(np.float32)
    _, rn = compute_covar_pair_pallas(obs, mask.astype(np.float32),
                                      interpret=True)
    evs = np.linalg.eigvalsh(np.asarray(rn))
    assert evs.min() > -1e-5, f"Rn indefinite: min eig {evs.min()}"


def test_pallas_stft_matches_fft(rng):
    import jax.numpy as jnp
    from setk_tpu.dsp.stft import StftConfig, forward_stft
    from setk_tpu.ops.pallas.stft import (forward_stft_pallas,
                                          forward_stft_pallas_planar)
    cfg = StftConfig()
    w = jnp.asarray(rng.standard_normal((2, 3, 16000)).astype(np.float32))
    ref = np.asarray(forward_stft(w, cfg, impl="fft"))
    got = np.asarray(forward_stft_pallas(w, cfg, interpret=True))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4
    re, im, nyq = forward_stft_pallas_planar(w, cfg, interpret=True)
    # exact-lane planar layout: F_HALF planes + separate Nyquist plane
    t = cfg.num_frames(16000)
    fh = cfg.n_fft // 2
    assert re.shape[-1] == fh and im.shape[-1] == fh
    ny_ref = ref[..., fh].real
    assert (np.abs(np.asarray(nyq)[..., :t] - ny_ref).max() /
            max(np.abs(ny_ref).max(), 1e-6)) < 1e-3


def test_pallas_stft_padfree_hop_aligned(rng):
    """S % hop == 0 takes the zero-copy wav-block + VMEM-edges path."""
    import jax.numpy as jnp
    from setk_tpu.dsp.stft import StftConfig, forward_stft
    from setk_tpu.ops.pallas.stft import forward_stft_pallas
    cfg = StftConfig()
    s = 256 * 64  # hop-aligned
    w = jnp.asarray(rng.standard_normal((3, s)).astype(np.float32))
    ref = np.asarray(forward_stft(w, cfg, impl="fft"))
    got = np.asarray(forward_stft_pallas(w, cfg, interpret=True))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4


def test_pallas_stft_chunked_long_signal(rng):
    """t_pad > _T_MAX takes the multi-chunk gather path."""
    import jax.numpy as jnp
    from setk_tpu.dsp.stft import StftConfig, forward_stft
    from setk_tpu.ops.pallas.stft import forward_stft_pallas
    cfg = StftConfig()
    s = 16000 * 11  # ~688 frames > 512-frame chunk
    w = jnp.asarray(rng.standard_normal((2, s)).astype(np.float32))
    ref = np.asarray(forward_stft(w, cfg, impl="fft"))
    got = np.asarray(forward_stft_pallas(w, cfg, interpret=True))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4


def test_planar_pipeline_matches_xla(rng):
    import jax.numpy as jnp
    from setk_tpu.dsp.stft import StftConfig, forward_stft, inverse_stft
    from setk_tpu.enhance import beamformer as bf
    from setk_tpu.enhance.pipeline import mvdr_enhance_planar
    cfg = StftConfig()
    B, N, S = 2, 4, 16000
    wav = jnp.asarray(rng.standard_normal((B, N, S)).astype(np.float32))
    mask = jnp.asarray(
        rng.random((B, cfg.num_frames(S), cfg.num_bins)).astype(np.float32))
    out_p = np.asarray(mvdr_enhance_planar(wav, mask, cfg, interpret=True))
    spec = forward_stft(wav, cfg)
    obs = jnp.transpose(spec, (0, 3, 1, 2))
    mk = jnp.transpose(mask, (0, 2, 1))
    rs, rn = bf.compute_covar_pair(obs, mk, use_pallas=False)
    wt = bf.mvdr_weights(rs, rn, steer="power", use_pallas=False)
    enh = bf.beamform(wt, obs)
    out_r = np.asarray(
        inverse_stft(jnp.swapaxes(enh, -1, -2), cfg, nsamps=S))
    assert np.abs(out_p - out_r).max() / np.abs(out_r).max() < 1e-3


def test_planar_pipeline_fused_istft_matches_xla(rng):
    """Hop-aligned lengths take the fused planar iSTFT kernel."""
    import jax.numpy as jnp
    from setk_tpu.dsp.stft import StftConfig, forward_stft, inverse_stft
    from setk_tpu.enhance import beamformer as bf
    from setk_tpu.enhance.pipeline import mvdr_enhance_planar
    cfg = StftConfig()
    B, N, S = 2, 4, 256 * 64  # S % hop == 0 and nsamps == (T-1)*hop
    wav = jnp.asarray(rng.standard_normal((B, N, S)).astype(np.float32))
    mask = jnp.asarray(
        rng.random((B, cfg.num_frames(S), cfg.num_bins)).astype(np.float32))
    out_p = np.asarray(mvdr_enhance_planar(wav, mask, cfg, interpret=True))
    spec = forward_stft(wav, cfg)
    obs = jnp.transpose(spec, (0, 3, 1, 2))
    mk = jnp.transpose(mask, (0, 2, 1))
    rs, rn = bf.compute_covar_pair(obs, mk, use_pallas=False)
    wt = bf.mvdr_weights(rs, rn, steer="power", use_pallas=False)
    enh = bf.beamform(wt, obs)
    out_r = np.asarray(
        inverse_stft(jnp.swapaxes(enh, -1, -2), cfg, nsamps=S))
    assert out_p.shape == out_r.shape
    assert np.abs(out_p - out_r).max() / np.abs(out_r).max() < 1e-3


def test_lane_cholesky_matches_xla(rng):
    """Medium-N lane-batched Hermitian solve vs the XLA Cholesky path."""
    import jax.numpy as jnp
    from setk_tpu.ops.linalg import hermitian_solve
    from setk_tpu.ops.pallas.cholesky import hermitian_solve_lanes_pallas
    BF, NK, K = 3, 24, 4
    a = (rng.standard_normal((BF, NK, 8)) +
         1j * rng.standard_normal((BF, NK, 8)))
    A = (a @ np.conj(a.transpose(0, 2, 1))).astype(np.complex64)
    A += np.eye(NK, dtype=np.complex64) * 2
    B = (rng.standard_normal((BF, NK, K)) +
         1j * rng.standard_normal((BF, NK, K))).astype(np.complex64)
    ref = np.asarray(hermitian_solve(jnp.asarray(A), jnp.asarray(B),
                                     use_pallas=False))
    got = np.asarray(hermitian_solve_lanes_pallas(jnp.asarray(A),
                                                  jnp.asarray(B),
                                                  interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
    # vector rhs through the dispatcher's reshape path
    bv = B[..., 0]
    refv = np.asarray(hermitian_solve(jnp.asarray(A), jnp.asarray(bv),
                                      use_pallas=False))
    gotv = np.asarray(hermitian_solve_lanes_pallas(
        jnp.asarray(A), jnp.asarray(bv)[..., None], interpret=True))[..., 0]
    np.testing.assert_allclose(gotv, refv, rtol=1e-3, atol=1e-4)


def test_covar_stats_broadcast_parity(rng):
    """K-class broadcast (cluster EM shape) through both backends."""
    obs, _ = _obs(rng, b=1, f=16, n=3, t=48)
    obs = obs[0]  # (F, N, T)
    gamma = rng.random((2, 16, 48)).astype(np.float32)  # K x F x T
    ref, _ = covar_stats(obs[None], gamma, use_pallas=False)
    # interpret-mode pallas inside the dispatcher is not exposed, so
    # exercise the broadcast plumbing via the wrapper directly
    import jax.numpy as jnp
    lead = np.broadcast_shapes(obs[None].shape[:-3], gamma.shape[:-2])
    flat = np.broadcast_to(np.asarray(obs)[None],
                           (*lead, 16, 3, 48)).reshape(-1, 16, 3, 48)
    mflat = np.broadcast_to(gamma, (*lead, 16, 48)).reshape(-1, 16, 48)
    nre, nim, _ = masked_covar_pallas(np.real(flat).copy(),
                                      np.imag(flat).copy(), mflat.copy(),
                                      f_tile=8, interpret=True)
    num = (np.asarray(nre) + 1j * np.asarray(nim)).reshape(2, 16, 3, 3)
    np.testing.assert_allclose(num, np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_jacobi_regularized_inverse_matches_xla(rng):
    """Lane-batched Jacobi EVD inverse vs the XLA eigh path, including
    near-singular covariances (where the eigenvalue floor activates)."""
    import jax.numpy as jnp
    from setk_tpu.ops.linalg import regularized_inverse
    from setk_tpu.ops.pallas.eigh_small import regularized_inverse_pallas
    BF, M = 37, 6
    a = (rng.standard_normal((BF, M, 8)) +
         1j * rng.standard_normal((BF, M, 8)))
    A = (a @ np.conj(a.transpose(0, 2, 1))).astype(np.complex64)
    # make a third of them near-singular (rank 1 + tiny noise)
    u = (rng.standard_normal((BF // 3, M, 1)) +
         1j * rng.standard_normal((BF // 3, M, 1)))
    A[:BF // 3] = (u @ np.conj(u.transpose(0, 2, 1)) +
                   1e-5 * np.eye(M)).astype(np.complex64)
    ref_inv, ref_ld = regularized_inverse(jnp.asarray(A),
                                          return_logdet=True,
                                          use_pallas=False)
    got_inv, got_ld = regularized_inverse_pallas(jnp.asarray(A),
                                                 return_logdet=True,
                                                 interpret=True)
    ref_inv, ref_ld = np.asarray(ref_inv), np.asarray(ref_ld)
    got_inv, got_ld = np.asarray(got_inv), np.asarray(got_ld)
    scale = np.abs(ref_inv).max(axis=(-1, -2), keepdims=True)
    err = (np.abs(got_inv - ref_inv) / scale).max(axis=(-1, -2))
    k = BF // 3
    # near-singular: ANY two f32 eigensolvers disagree on the tiny
    # eigenvalues by ~eps * lambda_max / lambda_small (~15% at this
    # conditioning) — XLA's f32 eigh carries the same absolute
    # uncertainty, so only structural agreement is checkable there
    assert err[:k].max() < 0.3
    assert err[k:].max() < 5e-3
    np.testing.assert_allclose(got_ld[k:], ref_ld[k:], rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(got_ld[:k], ref_ld[:k], atol=0.5)
    # the regularized inverse must stay Hermitian PSD everywhere
    herm_err = np.abs(got_inv - np.conj(np.swapaxes(got_inv, -1, -2))).max()
    assert herm_err < 1e-3 * np.abs(got_inv).max()
    assert np.linalg.eigvalsh(got_inv).min() > -1e-3


def test_fused_mvdr_pipeline_matches_xla(rng):
    """Zero-materialization fused pipeline (stft+covar / beamform+istft
    kernels, scrambled radix-2 lanes) vs the XLA reference path."""
    import jax.numpy as jnp
    from setk_tpu.dsp.stft import StftConfig, forward_stft, inverse_stft
    from setk_tpu.enhance import beamformer as bf
    from setk_tpu.enhance.pipeline import fused_supported, mvdr_enhance_fused
    cfg = StftConfig()
    B, N, S = 2, 3, 16384  # hop-aligned length
    assert fused_supported(cfg, N, S, S)
    wav = jnp.asarray(rng.standard_normal((B, N, S)).astype(np.float32))
    mask = jnp.asarray(
        rng.random((B, cfg.num_frames(S), cfg.num_bins)).astype(np.float32))
    out_f = np.asarray(mvdr_enhance_fused(wav, mask, cfg, interpret=True))
    spec = forward_stft(wav, cfg)
    obs = jnp.transpose(spec, (0, 3, 1, 2))
    mk = jnp.transpose(mask, (0, 2, 1))
    rs, rn = bf.compute_covar_pair(obs, mk, use_pallas=False)
    wt = bf.mvdr_weights(rs, rn, steer="power", use_pallas=False)
    enh = bf.beamform(wt, obs)
    out_r = np.asarray(
        inverse_stft(jnp.swapaxes(enh, -1, -2), cfg, nsamps=S))
    assert out_f.shape == out_r.shape
    assert np.abs(out_f - out_r).max() / np.abs(out_r).max() < 1e-3


def test_fused_mvdr_short_signal(rng):
    """Short utterance: most DIF quarters cover only padding frames."""
    import jax.numpy as jnp
    from setk_tpu.dsp.stft import StftConfig
    from setk_tpu.enhance.pipeline import (mvdr_enhance_fused,
                                           mvdr_enhance_planar)
    cfg = StftConfig()
    B, N, S = 1, 2, 4096
    wav = jnp.asarray(rng.standard_normal((B, N, S)).astype(np.float32))
    mask = jnp.asarray(
        rng.random((B, cfg.num_frames(S), cfg.num_bins)).astype(np.float32))
    out_f = np.asarray(mvdr_enhance_fused(wav, mask, cfg, interpret=True))
    out_p = np.asarray(mvdr_enhance_planar(wav, mask, cfg, interpret=True))
    assert np.abs(out_f - out_p).max() / np.abs(out_p).max() < 1e-3


def test_fused_mvdr_int16_input(rng):
    """int16 wav converts in VMEM (scale folded into the window) and
    matches the f32/32768 result."""
    import jax.numpy as jnp
    from setk_tpu.dsp.stft import StftConfig
    from setk_tpu.enhance.pipeline import mvdr_enhance_fused
    cfg = StftConfig()
    B, N, S = 1, 2, 8192
    w16 = (rng.standard_normal((B, N, S)) * 3000).astype(np.int16)
    mask = jnp.asarray(
        rng.random((B, cfg.num_frames(S), cfg.num_bins)).astype(np.float32))
    out_i = np.asarray(
        mvdr_enhance_fused(jnp.asarray(w16), mask, cfg, interpret=True))
    wf = jnp.asarray(w16.astype(np.float32) / 32768.0)
    out_f = np.asarray(mvdr_enhance_fused(wf, mask, cfg, interpret=True))
    assert np.abs(out_i - out_f).max() / np.abs(out_f).max() < 1e-4


def test_fused_mvdr_single_mic_full_tpad(rng):
    """Edge cases: N=1 (degenerate pair loop) and exactly T_pad=512
    frames (no mask row padding)."""
    import jax.numpy as jnp
    from setk_tpu.dsp.stft import StftConfig
    from setk_tpu.enhance.pipeline import (fused_supported,
                                           mvdr_enhance_fused,
                                           mvdr_enhance_planar)
    cfg = StftConfig()
    S = 511 * 256  # num_frames == 512 == the kernel's frame capacity
    assert cfg.num_frames(S) == 512
    wav = jnp.asarray(rng.standard_normal((1, 1, S)).astype(np.float32))
    mask = jnp.asarray(
        rng.random((1, 512, cfg.num_bins)).astype(np.float32))
    assert fused_supported(cfg, 1, S, S)
    out_f = np.asarray(mvdr_enhance_fused(wav, mask, cfg, interpret=True))
    out_p = np.asarray(mvdr_enhance_planar(wav, mask, cfg, interpret=True))
    assert out_f.shape == (1, S)
    assert np.abs(out_f - out_p).max() / np.abs(out_p).max() < 1e-3


def test_fused_mvdr_degenerate_inputs(rng):
    """Near-oracle masks (Rn from ~0.001 weights), near-zero masks,
    pure tones, a silent channel, full silence — finite everywhere and
    parity with the planar path (on-chip torture mirrored here)."""
    import jax.numpy as jnp
    from setk_tpu.dsp.stft import StftConfig
    from setk_tpu.enhance.pipeline import (mvdr_enhance_fused,
                                           mvdr_enhance_planar)
    cfg = StftConfig()
    sr, S, B, N = 16000, 8192, 3, 4
    t = np.arange(S) / sr
    wav = np.zeros((B, N, S), np.float32)
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32) * 0.5
    wav[0] = tone[None] + rng.standard_normal((N, S)).astype(np.float32) * 1e-3
    wav[0, 2] = 0.0                                    # silent channel
    wav[1] = rng.standard_normal((N, S)).astype(np.float32) * 1e-5
    wav[2] = np.clip(rng.standard_normal((N, S)) * 0.5, -0.999, 0.999)
    T, F = cfg.num_frames(S), cfg.num_bins
    mask = np.ones((B, T, F), np.float32)
    mask[0] *= 0.999
    mask[1] *= 0.0001
    mask[2] = rng.random((T, F)).astype(np.float32)
    out_f = np.asarray(mvdr_enhance_fused(
        jnp.asarray(wav), jnp.asarray(mask), cfg, interpret=True))
    out_p = np.asarray(mvdr_enhance_planar(
        jnp.asarray(wav), jnp.asarray(mask), cfg, interpret=True))
    assert np.isfinite(out_f).all()
    for b in range(B):
        sc = max(np.abs(out_p[b]).max(), 1e-6)
        assert np.abs(out_f[b] - out_p[b]).max() / sc < 1e-3


def test_fused_beamformer_family_matches_xla(rng):
    """Kernels A/B are weight-agnostic: GEVD / PMWF / MPDR / BAN ride
    the same fused pair, with only the small weight solve differing."""
    import jax.numpy as jnp
    from setk_tpu.dsp.stft import StftConfig, forward_stft, inverse_stft
    from setk_tpu.enhance import beamformer as bf
    from setk_tpu.enhance.pipeline import enhance_fused
    cfg = StftConfig()
    B, N, S = 1, 3, 8192
    # structured scene (steered broadband source + weaker noise): with
    # random masks GEVD's generalized eigenpairs go near-degenerate and
    # the two solvers legitimately pick different (equally optimal)
    # eigenvectors — realistic masks keep the problem well-posed
    t_fr = cfg.num_frames(S)
    # source in on/off bursts: the mask's TEMPORAL contrast is what
    # separates Rs from Rn (a flat mask makes them proportional and
    # every generalized eigenpair degenerate)
    gate_t = (np.arange(S) // 2048) % 2 == 0
    src = (rng.standard_normal((B, 1, S)) * 0.5 * gate_t).astype(np.float32)
    wav_np = np.concatenate(
        [np.roll(src, k, axis=-1) for k in range(N)], axis=1)
    wav_np += rng.standard_normal((B, N, S)).astype(np.float32) * 0.05
    wav = jnp.asarray(wav_np)
    gate_f = gate_t[np.minimum(np.arange(t_fr) * cfg.frame_hop, S - 1)]
    mask_np = np.where(gate_f[:, None], 0.95, 0.05).astype(np.float32)
    mask = jnp.asarray(np.broadcast_to(
        mask_np, (B, t_fr, cfg.num_bins)).copy())
    spec = forward_stft(wav, cfg)
    obs = jnp.transpose(spec, (0, 3, 1, 2))
    mk = jnp.transpose(mask, (0, 2, 1))
    for name, ban in (("gevd", False), ("pmwf-0", False), ("pmwf-1", False),
                      ("mpdr", False), ("mpdr-whiten", False),
                      ("mvdr", True)):
        out_f = np.asarray(enhance_fused(
            wav, mask, cfg, beamformer=name, ban=ban,
            steer="power" if name == "mvdr" else "eigh", interpret=True))
        kw = {"steer": "power"} if name == "mvdr" else {}
        enh = bf.supervised_run(name, obs, mk, ban=ban, **kw)
        out_r = np.asarray(
            inverse_stft(jnp.swapaxes(enh, -1, -2), cfg, nsamps=S))
        if name == "gevd":
            # the fused GEVD solve anchors the per-bin eigenvector phase
            # (solver-arbitrary in the XLA path) — compare magnitudes,
            # the convention of the reference golden tests
            ma = np.abs(np.asarray(forward_stft(jnp.asarray(out_f), cfg)))
            mb = np.abs(np.asarray(forward_stft(jnp.asarray(out_r), cfg)))
            cos = float(np.inner(ma.ravel(), mb.ravel()) /
                        (np.linalg.norm(ma) * np.linalg.norm(mb)))
            # near-degenerate bins admit different (equally optimal)
            # eigvecs — golden-test convention uses 0.93
            assert cos > 0.97, (name, cos)
            continue
        err = np.abs(out_f - out_r).max() / max(np.abs(out_r).max(), 1e-6)
        assert err < 2e-3, (name, ban, err)


def test_gevd_power_kernel_direction(rng):
    """gevd_power_pallas matches solve_pevd's principal generalized
    eigenvector up to per-bin phase, with v^H Rn v = 1."""
    from setk_tpu.enhance.beamformer import compute_covar
    from setk_tpu.ops.linalg import solve_pevd
    from setk_tpu.ops.pallas.mvdr import gevd_power_pallas
    obs, mask = _obs(rng, b=1, f=32, n=8, t=128)  # n=8: the kernel cap
    rs = compute_covar(obs, mask)
    rn = compute_covar(obs, 1 - mask)
    got = np.asarray(gevd_power_pallas(rs, rn, power_iters=30,
                                       interpret=True))
    ref = np.asarray(solve_pevd(rs, rn))
    rs_np, rn_np = np.asarray(rs), np.asarray(rn)
    # v^H Rn v = 1
    q = np.einsum("...a,...ab,...b->...", np.conj(got), rn_np, got)
    np.testing.assert_allclose(np.real(q), 1.0, atol=2e-3)
    # power iteration cannot pin near-degenerate eigenpairs (and there
    # the principal vector is ill-defined anyway) — the contract is the
    # generalized Rayleigh quotient, the SNR objective GEVD maximizes
    def rayleigh(v):
        num = np.einsum("...a,...ab,...b->...", np.conj(v), rs_np, v)
        den = np.einsum("...a,...ab,...b->...", np.conj(v), rn_np, v)
        return np.real(num) / np.maximum(np.real(den), 1e-12)

    ratio = rayleigh(got) / np.maximum(rayleigh(ref), 1e-12)
    # random masks at N=8 put a few bins near generalized degeneracy,
    # where 30 power iterations land a hair off the (flat) optimum —
    # an implementation bug shows up as ratio << 0.9 or a broken norm
    assert np.median(ratio) > 0.999, np.median(ratio)
    assert ratio.min() > 0.95, ratio.min()


def test_pmwf_solve_kernel_matches_xla(rng):
    """pmwf_solve_pallas + pmwf_select_ref == the XLA pmwf_weights."""
    from setk_tpu.enhance.beamformer import (compute_covar, pmwf_weights,
                                             pmwf_select_ref)
    from setk_tpu.ops.pallas.mvdr import pmwf_solve_pallas
    obs, mask = _obs(rng, b=2, f=24, n=4, t=96)
    rs = compute_covar(obs, mask)
    rn = compute_covar(obs, 1 - mask)
    for beta in (0.0, 1.0):
        ref = np.asarray(pmwf_weights(rs, rn, beta=beta))
        wm = pmwf_solve_pallas(rs, rn, beta=beta, interpret=True)
        got = np.asarray(pmwf_select_ref(wm, rs, rn))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=2e-3 * scale)


def test_fused_cacgmm_em_matches_xla(rng):
    """The in-kernel full-EM loop (interpret mode) reproduces the XLA
    scan: gamma, Q history and the resumable state."""
    import jax
    import jax.numpy as jnp
    from setk_tpu.enhance.cluster import cacgmm_em, norm_observation
    from setk_tpu.ops.pallas.cacgmm_em import cacgmm_em_pallas
    b, f, m, t, k, iters = 2, 24, 3, 16, 2, 4
    obs = (rng.standard_normal((b, f, m, t)) +
           1j * rng.standard_normal((b, f, m, t))).astype(np.complex64)
    key = jax.random.PRNGKey(0)
    ref_g, ref_q, ref_state = cacgmm_em(obs, k, num_iters=iters, key=key,
                                        return_state=True, use_fused=False)
    # same random init as cacgmm_em's fresh path
    obs_n = norm_observation(jnp.asarray(obs), axis=-2)
    gamma0 = jax.random.uniform(key, (k, b, f, t))
    gamma0 = gamma0 / jnp.sum(gamma0, 0, keepdims=True)
    kernel0 = jnp.ones((k, b, f, t))
    got_g, got_q, got_state = cacgmm_em_pallas(
        obs_n, gamma0, kernel0, iters, return_state=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q),
                               rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_state["alpha"]),
                               np.asarray(ref_state["alpha"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_state["covar"]),
                               np.asarray(ref_state["covar"]),
                               atol=2e-2, rtol=2e-2)


def test_fused_cacgmm_em_frame_mask(rng):
    """Frame-masked fused EM == XLA EM with the same mask; padded frames
    do not perturb the statistics."""
    import jax
    import jax.numpy as jnp
    from setk_tpu.enhance.cluster import cacgmm_em, norm_observation
    from setk_tpu.ops.pallas.cacgmm_em import cacgmm_em_pallas
    b, f, m, t, k, iters = 1, 16, 3, 20, 2, 3
    obs = (rng.standard_normal((b, f, m, t)) +
           1j * rng.standard_normal((b, f, m, t))).astype(np.complex64)
    obs[..., 14:] = 1e-6  # padded tail
    fm = np.zeros((b, 1, t), np.float32)
    fm[..., :14] = 1.0
    key = jax.random.PRNGKey(3)
    ref_g, ref_q = cacgmm_em(obs, k, num_iters=iters, key=key,
                             frame_mask=fm, use_fused=False)
    obs_n = norm_observation(jnp.asarray(obs), axis=-2)
    gamma0 = jax.random.uniform(key, (k, b, f, t))
    gamma0 = gamma0 / jnp.sum(gamma0, 0, keepdims=True)
    kernel0 = jnp.ones((k, b, f, t))
    got_g, got_q = cacgmm_em_pallas(obs_n, gamma0, kernel0, iters,
                                    frame_mask=jnp.asarray(fm),
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got_g)[..., :14],
                               np.asarray(ref_g)[..., :14], atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q),
                               rtol=2e-3, atol=1e-3)


def test_fused_online_mvdr_matches_xla(rng):
    """Online fused pipeline (per-chunk EMA covariances + in-kernel
    per-chunk MVDR solves) vs beamformer.online_supervised_run with the
    same power-iteration steer and zero-padded noise mask."""
    import jax.numpy as jnp
    from functools import partial as _partial
    from setk_tpu.dsp.stft import StftConfig, forward_stft, inverse_stft
    from setk_tpu.enhance import beamformer as bf
    from setk_tpu.enhance.pipeline import (fused_online_supported,
                                           mvdr_enhance_fused_online)
    cfg = StftConfig()
    B, N, S, CHUNK, ALPHA = 2, 3, 16384, 16, 0.7
    assert fused_online_supported(cfg, N, S, S, CHUNK)
    wav = jnp.asarray(rng.standard_normal((B, N, S)).astype(np.float32))
    t = cfg.num_frames(S)
    mask = jnp.asarray(rng.random((B, t, cfg.num_bins)).astype(np.float32))
    out_f = np.asarray(mvdr_enhance_fused_online(
        wav, mask, cfg, chunk_size=CHUNK, alpha=ALPHA, interpret=True))

    spec = forward_stft(wav, cfg)
    obs = jnp.transpose(spec, (0, 3, 1, 2))            # (B, F, N, T)
    mk = jnp.transpose(mask, (0, 2, 1))                # (B, F, T)
    mn = 1.0 - mk
    pad = (-t) % CHUNK
    if pad:
        obs = jnp.pad(obs, ((0, 0), (0, 0), (0, 0), (0, pad)))
        mk = jnp.pad(mk, ((0, 0), (0, 0), (0, pad)))
        mn = jnp.pad(mn, ((0, 0), (0, 0), (0, pad)))
    orig = bf.WEIGHT_FNS["mvdr"]
    bf.WEIGHT_FNS["mvdr"] = _partial(bf.mvdr_weights, steer="power",
                                     use_pallas=False)
    try:
        enh = bf.online_supervised_run("mvdr", obs, mk, mask_n=mn,
                                       chunk_size=CHUNK,
                                       alpha=ALPHA)[..., :t]
    finally:
        bf.WEIGHT_FNS["mvdr"] = orig
    out_r = np.asarray(
        inverse_stft(jnp.swapaxes(enh, -1, -2), cfg, nsamps=S))
    assert out_f.shape == out_r.shape
    assert np.abs(out_f - out_r).max() / np.abs(out_r).max() < 2e-3


def test_fused_online_short_and_chunk32(rng):
    """Short utterance (pad quarters skipped) + a 32-frame chunk."""
    import jax.numpy as jnp
    from setk_tpu.dsp.stft import StftConfig
    from setk_tpu.enhance.pipeline import mvdr_enhance_fused_online
    cfg = StftConfig()
    B, N, S = 1, 2, 8192
    wav = jnp.asarray(rng.standard_normal((B, N, S)).astype(np.float32))
    t = cfg.num_frames(S)
    mask = jnp.asarray(rng.random((B, t, cfg.num_bins)).astype(np.float32))
    out = np.asarray(mvdr_enhance_fused_online(
        wav, mask, cfg, chunk_size=32, alpha=0.8, interpret=True))
    assert out.shape == (B, S) and np.isfinite(out).all()


def test_fused_wpe_matches_xla(rng):
    """Tap-free fused WPE (gram + apply kernels, interpret) vs the XLA
    scan path on random reverberant-ish input."""
    import jax.numpy as jnp
    from setk_tpu.enhance.wpe import wpe, _wpe_fused
    b, f, n, t = 2, 12, 3, 64
    obs = (rng.standard_normal((b, f, n, t)) +
           1j * rng.standard_normal((b, f, n, t))).astype(np.complex64)
    # mild reverberation: add a delayed copy so the filter has work
    obs[..., 5:] += 0.4 * obs[..., :-5]
    ref = np.asarray(wpe(jnp.asarray(obs), taps=4, delay=2, context=1,
                         num_iters=3, use_fused=False))
    got = np.asarray(_wpe_fused(jnp.asarray(obs), taps=4, delay=2,
                                context=1, num_iters=3, interpret=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-3 * scale)


def test_fused_wpe_chirp_torture(rng):
    """The pure-chirp near-singular case that NaN'd round-1 WPE without
    the hermitianize pass — the fused gram must stay finite too."""
    import jax.numpy as jnp
    from setk_tpu.dsp.stft import StftConfig, forward_stft
    from setk_tpu.enhance.wpe import _wpe_fused, wpe
    sr = 16000
    tt = np.arange(2 * sr) / sr
    chirp = np.sin(2 * np.pi * (100 + 400 * tt) * tt).astype(np.float32)
    wav = np.stack([chirp, np.roll(chirp, 7)])
    cfg = StftConfig()
    spec = np.asarray(forward_stft(jnp.asarray(wav), cfg))
    obs = spec.transpose(2, 0, 1).astype(np.complex64)[:48]  # (F, N, T)
    got = np.asarray(_wpe_fused(jnp.asarray(obs), taps=4, delay=2,
                                context=1, num_iters=3, interpret=True))
    assert np.isfinite(got).all()
    ref = np.asarray(wpe(jnp.asarray(obs), taps=4, delay=2, context=1,
                         num_iters=3, use_fused=False))
    assert np.isfinite(ref).all()


def test_fused_cgmm_em_matches_xla(rng):
    """The model="cg" in-kernel EM loop (interpret mode) reproduces the
    XLA CGMM scan: gamma, Q history and the resumable state, from the
    SAME Higuchi K=2 init the driver computes."""
    import jax.numpy as jnp
    from setk_tpu.enhance.cluster import (cgmm_em, _cgmm_predict,
                                          _cgmm_quad)
    from setk_tpu.ops.linalg import regularized_inverse
    from setk_tpu.ops.pallas.cacgmm_em import cgmm_em_pallas
    b, f, m, t, k, iters = 2, 24, 3, 16, 2, 4
    obs = (rng.standard_normal((b, f, m, t)) +
           1j * rng.standard_normal((b, f, m, t))).astype(np.complex64)
    # give class 0 structure so the EM separates something
    obs[:, :, 1:, :] += 0.5 * obs[:, :, :1, :]
    ref_g, ref_q, ref_state = cgmm_em(obs, k, num_iters=iters,
                                      return_state=True, use_fused=False)
    # replicate the Higuchi K=2 init of cgmm_em's fresh path
    obs_j = jnp.asarray(obs)
    rs = jnp.einsum("...xt,...yt->...xy", obs_j, jnp.conj(obs_j)) / t
    rn = jnp.broadcast_to(jnp.eye(m, dtype=obs.dtype), rs.shape)
    covar = jnp.stack([rs, rn])
    phi = _cgmm_quad(obs_j, regularized_inverse(covar)) / m
    alpha = jnp.full((k, b, f), 1.0 / k)
    gamma, _ = _cgmm_predict(obs_j, phi, covar, alpha)
    got_g, got_q, got_state = cgmm_em_pallas(
        obs_j, gamma, phi, iters, return_state=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q),
                               rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_state["phi"]),
                               np.asarray(ref_state["phi"]),
                               rtol=5e-3, atol=1e-4)
    ref_c = np.asarray(ref_state["covar"])
    np.testing.assert_allclose(np.asarray(got_state["covar"]), ref_c,
                               atol=2e-2 * np.abs(ref_c).max(), rtol=2e-2)


def test_fused_cgmm_em_frame_mask_and_dispatch(rng):
    """Frame-masked fused CGMM == XLA CGMM with the same mask, driven
    through the cgmm_em(use_fused=...) dispatch path itself (interpret
    monkey-patched in)."""
    import jax.numpy as jnp
    from functools import partial as _partial
    import setk_tpu.ops.pallas.cacgmm_em as fused_mod
    from setk_tpu.enhance.cluster import cgmm_em
    b, f, m, t, k, iters = 1, 16, 3, 20, 2, 3
    obs = (rng.standard_normal((b, f, m, t)) +
           1j * rng.standard_normal((b, f, m, t))).astype(np.complex64)
    obs[..., 14:] = 1e-6  # padded tail
    fm = np.zeros((b, 1, t), np.float32)
    fm[..., :14] = 1.0
    ref_g, ref_q = cgmm_em(obs, k, num_iters=iters, frame_mask=fm,
                           use_fused=False)
    orig = fused_mod.cgmm_em_pallas
    fused_mod.cgmm_em_pallas = _partial(orig, interpret=True)
    try:
        got_g, got_q = cgmm_em(obs, k, num_iters=iters, frame_mask=fm,
                               use_fused=True)
    finally:
        fused_mod.cgmm_em_pallas = orig
    np.testing.assert_allclose(np.asarray(got_g)[..., :14],
                               np.asarray(ref_g)[..., :14], atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q),
                               rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("form", ["plane", "cov"])
def test_fused_em_inkernel_higuchi_init(rng, form):
    """init="higuchi" (the K=2 covariance init folded into the fused
    kernel, r05 — it replaces an XLA entry path that measured
    ~6.7 ms/call, the whole CGMM-vs-CACGMM gap) matches the XLA init +
    scan for BOTH mixture models, driven through the public dispatch.
    Both loop forms are exercised: "plane" (fast, init e_step before
    the plane-carry loop) and "cov" (long-T packed covariance carry),
    selected by forcing the footprint model."""
    from functools import partial as _partial
    import setk_tpu.ops.pallas.cacgmm_em as fused_mod
    from setk_tpu.enhance.cluster import cacgmm_em, cgmm_em
    b, f, m, t, k, iters = 2, 24, 3, 16, 2, 4
    obs = (rng.standard_normal((b, f, m, t)) +
           1j * rng.standard_normal((b, f, m, t))).astype(np.complex64)
    obs[:, :, 1:, :] += 0.5 * obs[:, :, :1, :]
    ref_g, ref_q = cgmm_em(obs, k, num_iters=iters, use_fused=False)
    orig = fused_mod.cgmm_em_pallas
    orig_fits = fused_mod._plane_init_fits
    fused_mod.cgmm_em_pallas = _partial(orig, interpret=True)
    fused_mod._plane_init_fits = lambda *a: form == "plane"
    try:
        got_g, got_q = cgmm_em(obs, k, num_iters=iters, use_fused=True)
    finally:
        fused_mod.cgmm_em_pallas = orig
        fused_mod._plane_init_fits = orig_fits
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref_q),
                               rtol=2e-3, atol=1e-3)
    ref_g2, ref_q2 = cacgmm_em(obs, k, num_iters=iters, cgmm_init=True,
                               use_fused=False)
    orig2 = fused_mod.cacgmm_em_pallas
    fused_mod.cacgmm_em_pallas = _partial(orig2, interpret=True)
    fused_mod._plane_init_fits = lambda *a: form == "plane"
    try:
        got_g2, got_q2 = cacgmm_em(obs, k, num_iters=iters,
                                   cgmm_init=True, use_fused=True)
    finally:
        fused_mod.cacgmm_em_pallas = orig2
        fused_mod._plane_init_fits = orig_fits
    np.testing.assert_allclose(np.asarray(got_g2), np.asarray(ref_g2),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_q2), np.asarray(ref_q2),
                               rtol=2e-3, atol=1e-3)


def test_pmwf_solve_kernel_powers(rng):
    """pmwf_solve_pallas(return_powers=True): the in-kernel per-channel
    SNR powers reproduce the einsum selection (pmwf_select_ref) and the
    selected weights match the XLA pmwf_weights."""
    from setk_tpu.enhance.beamformer import (compute_covar, pmwf_weights,
                                             pmwf_select_powers,
                                             pmwf_select_ref)
    from setk_tpu.ops.pallas.mvdr import pmwf_solve_pallas
    obs, mask = _obs(rng, b=2, f=24, n=4, t=96)
    rs = compute_covar(obs, mask)
    rn = compute_covar(obs, 1 - mask)
    ref = np.asarray(pmwf_weights(rs, rn, beta=0.0))
    wm, ps, pn = pmwf_solve_pallas(rs, rn, beta=0.0, return_powers=True,
                                   interpret=True)
    got = np.asarray(pmwf_select_powers(wm, ps, pn))
    got_ein = np.asarray(pmwf_select_ref(wm, rs, rn))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-3 * scale)
    np.testing.assert_allclose(got, got_ein, atol=1e-4 * scale)


@pytest.mark.parametrize("NK", [9, 10, 11, 12, 30])
def test_solve_wpe_gram_planar(rng, NK):
    """Planar gram-layout solve (in-kernel slicing + optional
    equilibration) vs the complex-assembly reference path.

    NK sweeps every mod-4 residue of the unrolled substitution loops
    (a tail-guard bug double-subtracted rows at NK % 4 in {2, 3}),
    plus the 3-mic taps=10 default shape NK=30."""
    import jax.numpy as jnp
    from setk_tpu.ops.linalg import (equilibrated_hermitian_solve,
                                     hermitian_solve)
    from setk_tpu.ops.pallas.cholesky import solve_wpe_gram_pallas
    BINS, N0 = 5, 3
    G, COLS = max(16, -(-(N0 + NK) // 8) * 8), N0 + NK  # plane pad vs valid
    a = (rng.standard_normal((BINS, COLS, 6)) +
         1j * rng.standard_normal((BINS, COLS, 6)))
    gram = (a @ np.conj(a.transpose(0, 2, 1))).astype(np.complex64)
    gram += np.eye(COLS, dtype=np.complex64) * 0.5
    planes_re = np.zeros((BINS, G, G), np.float32)
    planes_im = np.zeros((BINS, G, G), np.float32)
    planes_re[:, :COLS, :COLS] = gram.real
    planes_im[:, :COLS, :COLS] = gram.imag
    ref = np.asarray(hermitian_solve(
        jnp.asarray(gram[:, N0:, N0:]), jnp.asarray(gram[:, N0:, :N0]),
        use_pallas=False))
    xr, xi = solve_wpe_gram_pallas(jnp.asarray(planes_re),
                                   jnp.asarray(planes_im),
                                   row0=N0, n=NK, k=N0, interpret=True)
    got = np.asarray(xr) + 1j * np.asarray(xi)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
    # equilibrated variant on a badly row-scaled gram (the WPD regime)
    scale = np.exp(rng.uniform(-6, 6, size=(BINS, COLS))).astype(np.float32)
    gram_s = gram * scale[:, :, None] * scale[:, None, :]
    planes_re[:, :COLS, :COLS] = gram_s.real
    planes_im[:, :COLS, :COLS] = gram_s.imag
    ref_e = np.asarray(equilibrated_hermitian_solve(
        jnp.asarray(gram_s[:, N0:, N0:]),
        jnp.asarray(gram_s[:, N0:, :N0]), eps_rel=1e-5))
    xr, xi = solve_wpe_gram_pallas(jnp.asarray(planes_re),
                                   jnp.asarray(planes_im),
                                   row0=N0, n=NK, k=N0, eps_rel=1e-5,
                                   equilibrate=True, interpret=True)
    got_e = np.asarray(xr) + 1j * np.asarray(xi)
    rel = (np.abs(got_e - ref_e).max() /
           max(np.abs(ref_e).max(), 1e-9))
    assert rel < 5e-3, rel
    assert np.isfinite(got_e).all()


def test_fused_em_sweeps_knob(rng):
    """sweeps=3 (the WPD inner-loop configuration) stays close to the
    sweeps=6 parity default — the Jacobi inverse is nearly converged
    for these well-conditioned 3x3 covariances, so masks barely move."""
    import jax
    import jax.numpy as jnp
    from setk_tpu.enhance.cluster import norm_observation
    from setk_tpu.ops.pallas.cacgmm_em import cacgmm_em_pallas
    b, f, m, t, k, iters = 2, 24, 3, 16, 2, 4
    obs = (rng.standard_normal((b, f, m, t)) +
           1j * rng.standard_normal((b, f, m, t))).astype(np.complex64)
    key = jax.random.PRNGKey(0)
    obs_n = norm_observation(jnp.asarray(obs), axis=-2)
    gamma0 = jax.random.uniform(key, (k, b, f, t))
    gamma0 = gamma0 / jnp.sum(gamma0, 0, keepdims=True)
    kernel0 = jnp.ones((k, b, f, t))
    g6, _ = cacgmm_em_pallas(obs_n, gamma0, kernel0, iters, sweeps=6,
                             interpret=True)
    g3, _ = cacgmm_em_pallas(obs_n, gamma0, kernel0, iters, sweeps=3,
                             interpret=True)
    assert np.abs(np.asarray(g6) - np.asarray(g3)).mean() < 5e-3


def test_em_dispatch_gates_calibrated():
    """The fused-EM dispatch gates encode on-chip compile points: the
    bench/golden shapes stay fused, the chip-verified long-T init form
    is admitted, and the operand shape that OOM'd on the v5e (M=6
    T=501, latent since r04) falls back to the XLA scan."""
    from setk_tpu.ops.pallas.cacgmm_em import cacgmm_fused_supported
    # (shape, init_in, operand_in)
    cases = [
        ((1, 257, 6, 251), True, True),    # bench/WPD shape
        ((1, 257, 5, 368), True, True),    # golden EM shape
        ((1, 257, 6, 501), True, False),   # cov-form verified / OOM
        ((1, 257, 6, 600), False, False),  # beyond every verified point
        ((1, 257, 6, 1001), False, False),
    ]
    for shape, init_in, operand_in in cases:
        assert cacgmm_fused_supported(shape, 2, 20, init=True) == init_in, \
            shape
        assert cacgmm_fused_supported(shape, 2, 20) == operand_in, shape
