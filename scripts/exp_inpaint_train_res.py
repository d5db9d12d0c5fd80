"""Measure one E2FGVI GAN training step on the real chip at a given
resolution — the "lower-res first stage" practical-route probe.

Context (BASELINE.md "Training throughput"): the standard T=8 240x432
step fits with stage-level generator remat but runs at ~78 s/step on one
v5e — the deform-align scatter wall's gradient form. The documented
practical route is a lower-resolution first stage; this script turns that
suggestion into a measured number:

    python scripts/exp_inpaint_train_res.py --hw 120x216 --steps 3

Prints compile time, then per-step wall time (median of --steps), with a
full np.asarray sync per step (block_until_ready is unreliable on this
tunnel). Params ride as jit ARGUMENTS via the train state (closed-over
constants hang the remote compiler — verify-skill rule).
"""

import argparse
import time
from functools import partial

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="120x216",
                    help="training crop HxW (std recipe is 240x432)")
    ap.add_argument("--t", type=int, default=8, help="clip length")
    ap.add_argument("--nl", type=int, default=5, help="local frames")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="e.g. cpu for a correctness smoke (the axon "
                         "sitecustomize wins over env vars)")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from vosesam_tpu.config import InpainterConfig
    from vosesam_tpu.models.e2fgvi import discriminator as D
    from vosesam_tpu.models.e2fgvi import generator as G
    from vosesam_tpu.training import inpaint_data as ID
    from vosesam_tpu.training import inpaint_trainer as IT

    cfg = InpainterConfig()
    tcfg = IT.InpaintTrainConfig(remat=not args.no_remat)
    gen = G.generator_init(jax.random.PRNGKey(0), cfg)
    disc = D.discriminator_init(jax.random.PRNGKey(1))
    state = IT.init_train_state(gen, disc, tcfg)
    n_par = sum(x.size for x in jax.tree.leaves(gen))
    print(f"[exp] {h}x{w} T={args.t} nl={args.nl} remat={tcfg.remat} "
          f"gen params {n_par/1e6:.1f}M, platform "
          f"{jax.devices()[0].platform}", flush=True)

    r = np.random.default_rng(0)
    frames = jnp.asarray(
        r.uniform(-1, 1, (args.t, h, w, 3)).astype(np.float32))
    # the real stroke-mask recipe, not a box — drives the same sparsity
    # the sampler produces
    masks = np.stack([
        ID.random_stroke_mask(r, h, w) for _ in range(args.t)
    ]).astype(np.float32)[..., None]
    masks_j = jnp.asarray(masks)

    step = jax.jit(
        partial(IT.train_step, num_local=args.nl, cfg=cfg, tcfg=tcfg))

    t0 = time.perf_counter()
    state, metrics = step(state, frames, masks_j)
    gt = float(np.asarray(metrics["gen_total"]))
    t_compile = time.perf_counter() - t0
    print(f"[exp] compile+first step {t_compile:.1f} s, gen_total {gt:.4f}",
          flush=True)
    assert np.isfinite(gt)

    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = step(state, frames, masks_j)
        g = float(np.asarray(metrics["gen_total"]))
        times.append(time.perf_counter() - t0)
        print(f"[exp] step {i}: {times[-1]:.2f} s gen_total {g:.4f}",
              flush=True)
        assert np.isfinite(g)
    print(f"[exp] RESULT {h}x{w}: median {np.median(times):.2f} s/step "
          f"(runs {[round(t, 2) for t in times]})", flush=True)


if __name__ == "__main__":
    main()
