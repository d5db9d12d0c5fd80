"""Train XMem on a DAVIS-style tree — the end-to-end loop the reference's
vestigial trainer (tracker/model/trainer.py, broken imports + DDP never
initialized) was meant to run.

  python scripts/train_xmem.py --data /path/to/DAVIS --steps 1000 \
      --batch 8 --save /tmp/xmem_ckpt [--imset 2017/train.txt] [--dp]

--dp shards the clip batch over a mesh `data` axis (all local devices);
the gradient all-reduce is inserted by jit (training/trainer.py,
certified by tests/test_parallel.py TestDataParallelTraining).
Max-skip curriculum: max_jump steps 5 -> 10 -> 15 -> 5 at the standard
[10%, 30%, 80%] fractions of total steps.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--imset", default="2017/train.txt")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq-length", type=int, default=8)
    ap.add_argument("--crop", type=int, default=384)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--max-objects", type=int, default=3)
    ap.add_argument("--key-dim", type=int, default=64)
    ap.add_argument("--value-dim", type=int, default=512)
    ap.add_argument("--hidden-dim", type=int, default=64)
    ap.add_argument("--save", default=None, help="orbax checkpoint path")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="sequential microbatches per optimizer step "
                         "(TrainConfig.grad_accum; 2 fits the standard "
                         "B=4 T=8 384px recipe on one v5e chip — "
                         "898 ms/step measured, zero accumulation "
                         "overhead vs the B=2 microbatch rate)")
    ap.add_argument("--dp", action="store_true",
                    help="data-parallel over all local devices")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vosesam_tpu.config import FrameworkConfig, ParallelConfig, XMemConfig
    from vosesam_tpu.eval.datasets import DavisDataset
    from vosesam_tpu.models.xmem import network as xnet
    from vosesam_tpu.training import trainer as T
    from vosesam_tpu.training.data import ClipSampler, ClipSamplerConfig

    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=args.max_objects, key_dim=args.key_dim,
                        value_dim=args.value_dim, hidden_dim=args.hidden_dim),
        dtype="float32")
    tcfg = T.TrainConfig(lr=args.lr, seq_length=args.seq_length,
                         grad_accum=args.grad_accum)
    ds = DavisDataset(args.data, imset=args.imset)
    sampler = ClipSampler(
        ds, ClipSamplerConfig(seq_length=args.seq_length, crop=args.crop),
        args.max_objects, seed=args.seed)

    params = xnet.xmem_init(jax.random.PRNGKey(args.seed), cfg.xmem)
    state = T.init_train_state(params, tcfg)
    if args.resume:
        state = T.load_checkpoint(args.resume, state)

    shard = lambda tree: tree
    if args.dp:
        from vosesam_tpu.parallel import mesh as meshlib

        pcfg = ParallelConfig()
        mesh = meshlib.make_mesh(pcfg)
        rep = meshlib.replicated(mesh)
        state = jax.tree.map(lambda x: jax.device_put(x, rep), state)
        shard = lambda tree: meshlib.shard_batch(tree, mesh, pcfg)
        if args.batch % mesh.devices.shape[0]:
            ap.error(f"--batch must divide the {mesh.devices.shape[0]}-way "
                     "data axis")

    # max-skip curriculum at the standard step fractions
    schedule = [(0.1, 10), (0.3, 15), (0.8, 5)]
    start_it = int(state.it)
    # On resume, apply the latest boundary already passed so a checkpoint
    # restored past a schedule step doesn't silently train at the initial
    # jump of 5.
    for frac, jump in schedule:
        if start_it >= int(args.steps * frac):
            sampler.set_max_jump(jump)
            print(f"[resume {start_it}] max_jump -> {jump}", flush=True)
    t0 = time.time()
    for it in range(start_it, args.steps):
        for frac, jump in schedule:
            if it == int(args.steps * frac) and it != start_it:
                sampler.set_max_jump(jump)
                print(f"[{it}] max_jump -> {jump}", flush=True)
        frames, gt, valid = sampler.sample_batch(args.batch)
        batch = shard((jnp.asarray(frames), jnp.asarray(gt),
                       jnp.asarray(valid)))
        state, aux = T.train_step(state, *batch, cfg, tcfg)
        if it % args.log_every == 0 or it == args.steps - 1:
            loss = float(aux["loss"])
            if not np.isfinite(loss):
                raise RuntimeError(f"non-finite loss at step {it}")
            rate = (it + 1) / max(time.time() - t0, 1e-9)
            print(f"[{it}] loss {loss:.4f}  ({rate:.2f} it/s)", flush=True)

    if args.save:
        T.save_checkpoint(state, args.save)
        print(f"saved {args.save}", flush=True)


if __name__ == "__main__":
    main()
