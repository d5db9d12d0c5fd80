"""One process of a 2-process CPU cluster driving the batched eval step.

Proves the multi-host claim in parallel/mesh.py: `init_distributed` +
`make_mesh` + `shard_batch` run the SAME batched-eval shard_map program
(parallel/evaluation.py) over a mesh that spans processes, with per-process
global-array construction and addressable-shard readback — and the sharded
result equals the single-device reference, lane by lane.

Spawned (one per process) by tests/test_multihost.py:

  python scripts/multihost_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices; the global mesh is
(2*num_processes, 1) over the `data` axis. Collectives between processes
ride the gloo CPU backend — the DCN stand-in."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOCAL_DEVICES = 2


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from vosesam_tpu.parallel import mesh as meshlib

    meshlib.init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    ndev = LOCAL_DEVICES * nproc
    assert jax.device_count() == ndev, jax.device_count()
    assert len(jax.local_devices()) == LOCAL_DEVICES

    import jax.numpy as jnp
    import numpy as np

    from vosesam_tpu.config import (
        FrameworkConfig, MemoryConfig, RefinementConfig, SAMConfig, XMemConfig,
    )
    from vosesam_tpu.inference import core
    from vosesam_tpu.models.xmem import network as xnet
    from vosesam_tpu.parallel import evaluation

    h, w = 32, 32
    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=2),
        memory=MemoryConfig(
            max_mid_term_frames=3, min_mid_term_frames=2,
            max_long_term_elements=32, num_prototypes=4, top_k=4, mem_every=2),
        sam=SAMConfig(model_type="vit_b", image_size=64, window_size=4,
                      vit_dims=(("vit_b", 32, 2, 2, (1,)),)),
        refinement=RefinementConfig(use_refinement=False),
        dtype="float32",
    )
    mesh = meshlib.make_mesh(cfg.parallel)
    assert mesh.devices.shape == (ndev, 1)
    assert {d.process_index for d in mesh.devices.flat} == set(range(nproc))

    # b = ndev videos, each with DIFFERENT frames so cross-lane mixups show
    r = np.random.default_rng(0)
    b = ndev
    frames_np = r.integers(0, 255, (b, h, w, 3), np.uint8)
    masks_np = np.zeros((b, 2, h, w), np.float32)
    valid_np = np.zeros((b, 2), bool)
    for i in range(b):
        masks_np[i, 0, 4 + i:20 + i, 8:24] = 1.0
        valid_np[i, 0] = True

    states = evaluation.init_batched_state(cfg, (h, w), b)
    states = meshlib.shard_batch(states, mesh, cfg.parallel)
    frames = meshlib.shard_batch(jnp.asarray(frames_np), mesh, cfg.parallel)
    masks = meshlib.shard_batch(jnp.asarray(masks_np), mesh, cfg.parallel)
    valid = meshlib.shard_batch(jnp.asarray(valid_np), mesh, cfg.parallel)

    xmem_params = xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem)

    first = evaluation.make_batched_first_step(cfg, mesh)
    prop = evaluation.make_batched_prop_step(cfg, mesh, with_refinement=False)
    states, idx1, _ = first(xmem_params, states, frames, masks, valid)
    states, idx2, sc2 = prop(xmem_params, None, states, frames)

    # Readback: only this process's addressable lanes exist locally.
    def local_lanes(garr):
        return {int(s.index[0].start): np.asarray(s.data)[0]
                for s in garr.addressable_shards}

    lanes1, lanes2 = local_lanes(idx1), local_lanes(idx2)
    assert len(lanes1) == LOCAL_DEVICES

    # Single-device reference for every lane this process owns.
    for lane, got1 in lanes1.items():
        st = core.init_tracker_state(cfg, (h, w))
        st, p1, _ = core.step_with_mask(
            xmem_params, st, jnp.asarray(frames_np[lane]),
            jnp.asarray(masks_np[lane]), jnp.asarray(valid_np[lane]), cfg)
        st, p2, _ = core.step(xmem_params, st, jnp.asarray(frames_np[lane]), cfg)
        np.testing.assert_array_equal(got1, np.argmax(np.asarray(p1), 0))
        np.testing.assert_array_equal(
            lanes2[lane], np.argmax(np.asarray(p2), 0))

    print(f"MULTIHOST OK pid={pid} procs={jax.process_count()} "
          f"devices={jax.device_count()} lanes={sorted(lanes1)}", flush=True)


if __name__ == "__main__":
    main()
