"""Worker process for the true multi-process distributed test.

Each OS process joins a 2-process jax.distributed cluster (CPU backend,
4 virtual devices per process => one global 8-device mesh), takes its
manifest shard, runs the SPMD sharded_enhance_step on globally-sharded
arrays, allgathers the result, and writes artifacts for the parent
pytest to compare against the single-process run.

This is the TPU-native equivalent of the reference's only scale-out
mechanism (utils/queue.pl job arrays, /root/reference/utils/
queue.pl:13-30): one process per host joined via jax.distributed.
Invoked by tests/test_multiprocess.py — not a pytest module itself.
"""

import os
import sys


def main():
    port, pid, nproc, out_dir = (int(sys.argv[1]), int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") +
        " --xla_force_host_platform_device_count=4").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from setk_tpu.parallel.launch import init_distributed, process_info
    assert init_distributed(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from setk_tpu.dsp import StftConfig, forward_stft
    from setk_tpu.parallel import make_mesh, sharded_enhance_step
    from setk_tpu.parallel.executor import shard_manifest

    # --- manifest sharding by process index (split_scp semantics) -----
    index, count = process_info()
    keys = [f"utt{i:02d}" for i in range(10)]
    mine = shard_manifest(keys, count, index)
    with open(os.path.join(out_dir, f"shard_{pid}.txt"), "w") as f:
        f.write("\n".join(mine))

    # --- identical global inputs on every process (fixed seed) --------
    rng = np.random.default_rng(1234)
    b, n, s = 2, 4, 8192
    cfg = StftConfig()
    clean = rng.standard_normal((b, s)).astype(np.float32) * 0.2
    wav = (np.stack([clean] * n, axis=1) +
           rng.standard_normal((b, n, s)).astype(np.float32) * 0.05)
    spec = np.asarray(forward_stft(wav, cfg))  # (B, N, T, F)
    mesh = make_mesh(4 * nproc)
    t_pad = -spec.shape[2] % mesh.shape["seq"]
    spec = np.pad(spec, ((0, 0), (0, 0), (0, t_pad), (0, 0)))
    mask_tf = np.abs(spec[:, 0]) / (np.abs(spec[:, 0]) + 0.05)
    obs = np.ascontiguousarray(spec.transpose(0, 3, 1, 2)).astype(
        np.complex64)
    mask = np.ascontiguousarray(mask_tf.transpose(0, 2, 1)).astype(
        np.float32)
    f_pad = -obs.shape[1] % mesh.shape["freq"]
    obs = np.pad(obs, ((0, 0), (0, f_pad), (0, 0), (0, 0)))
    mask = np.pad(mask, ((0, 0), (0, f_pad), (0, 0)))

    # --- globally-sharded arrays + the SPMD step ----------------------
    obs_sh = NamedSharding(mesh, P("data", "freq", None, "seq"))
    mask_sh = NamedSharding(mesh, P("data", "freq", "seq"))
    obs_g = jax.make_array_from_callback(obs.shape, obs_sh,
                                         lambda idx: obs[idx])
    mask_g = jax.make_array_from_callback(mask.shape, mask_sh,
                                          lambda idx: mask[idx])
    step = sharded_enhance_step(mesh, cfg, nsamps=s)
    with mesh:
        out = step(obs_g, mask_g)
    from jax.experimental import multihost_utils
    out_full = np.asarray(multihost_utils.process_allgather(
        out, tiled=True))
    np.save(os.path.join(out_dir, f"out_{pid}.npy"), out_full)

    # --- sharded WPE over (data x freq), same globally-sharded obs ----
    from setk_tpu.parallel import sharded_wpe_step
    wstep = sharded_wpe_step(mesh, taps=2, delay=1, num_iters=2)
    wpe_sh = NamedSharding(mesh, P("data", "freq", None, None))
    obs_w = jax.make_array_from_callback(obs.shape, wpe_sh,
                                         lambda idx: obs[idx])
    with mesh:
        derev = wstep(obs_w)
    derev_full = np.asarray(multihost_utils.process_allgather(
        derev, tiled=True))
    np.save(os.path.join(out_dir, f"wpe_{pid}.npy"), derev_full)
    print(f"worker {pid}: OK {out_full.shape} wpe {derev_full.shape}",
          flush=True)


if __name__ == "__main__":
    main()
