"""Fused-sequence BLSTM kernel tests (interpreter mode on CPU, f32).

The reference delegates BLSTM mask training to Kaldi nnet3
(/root/reference/steps/train_rnn_mask.sh); the kernel under test is
the recurrence of models/mask_net.py FastLSTM.  Oracle: a pure-jnp
time scan with identical gate math, differentiated by jax autodiff.
"""

import jax
import jax.numpy as jnp
import numpy as np

from setk_tpu.ops.pallas.lstm_seq import lstm_seq_bidir, lstm_seq_supported

T, B, H = 12, 8, 128


def _ref_dir(xg, wh, reverse):
    """Pure-jnp unidirectional LSTM over (T, B, 4H) preactivations."""
    h = wh.shape[0]

    def step(carry, xg_t):
        hc, cc = carry
        gates = xg_t + hc @ wh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        cc = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(g)
        hc = jax.nn.sigmoid(o) * jnp.tanh(cc)
        return (hc, cc), hc

    xs = jnp.flip(xg, 0) if reverse else xg
    h0 = jnp.zeros((xg.shape[1], h), xg.dtype)
    _, ys = jax.lax.scan(step, (h0, h0), xs)
    return jnp.flip(ys, 0) if reverse else ys


def _ref_bidir(xgf, xgb, whf, whb):
    return _ref_dir(xgf, whf, False), _ref_dir(xgb, whb, True)


def _inputs(rng):
    xgf = rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.5
    xgb = rng.standard_normal((T, B, 4 * H)).astype(np.float32) * 0.5
    whf = (rng.standard_normal((H, 4 * H)) / np.sqrt(H)).astype(np.float32)
    whb = (rng.standard_normal((H, 4 * H)) / np.sqrt(H)).astype(np.float32)
    return xgf, xgb, whf, whb


def test_supported_guard():
    assert lstm_seq_supported(64, 512)
    assert not lstm_seq_supported(63, 512)
    assert not lstm_seq_supported(64, 100)


def test_forward_matches_scan(rng):
    args = _inputs(rng)
    ysf, ysb = lstm_seq_bidir(*args, interpret=True)
    rf, rb = _ref_bidir(*args)
    np.testing.assert_allclose(np.asarray(ysf), np.asarray(rf),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ysb), np.asarray(rb),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_scan(rng):
    args = _inputs(rng)
    # weight the two outputs asymmetrically so every gradient path
    # (dy_f, dy_b, the W_h carries, the c chain) is exercised
    wf = jnp.asarray(rng.standard_normal((T, B, H)).astype(np.float32))
    wb = jnp.asarray(rng.standard_normal((T, B, H)).astype(np.float32))

    def loss_kernel(*a):
        ysf, ysb = lstm_seq_bidir(*a, interpret=True)
        return jnp.sum(ysf * wf) + jnp.sum(ysb * wb)

    def loss_ref(*a):
        rf, rb = _ref_bidir(*a)
        return jnp.sum(rf * wf) + jnp.sum(rb * wb)

    got = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(*args)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for g, w, name in zip(got, want, ("dxg_f", "dxg_b", "dwh_f", "dwh_b")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_module_dispatch_parity(rng, monkeypatch):
    """FastLSTM through the kernel path == the XLA scan path."""
    import setk_tpu.models.mask_net as mn
    from setk_tpu.models.mask_net import FastLSTM

    x = jnp.asarray(rng.standard_normal((B, T, 64)).astype(np.float32))
    mod = FastLSTM(H, bidirectional=True)
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    monkeypatch.setattr(mn, "_KERNEL_TEST_MODE", True)
    got = mod.apply(params, x)
    # the scan path's recurrent matmul is bf16 (f32 accum) while test
    # mode runs the kernel in f32 — bound the drift, not the ulps
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=0)
