"""Map hot trace op names (fusion.N / step.N / vmap__.N) to their HLO
definitions for the bench-config programs.

The op-level trace (scripts/profile_trace.py) reports opaque XLA op names;
this script AOT-compiles the SAME jitted programs (shape-only lowering, no
device data) for the real backend and prints, for each requested op name,
its defining HLO line and — for fusions — the fused computation's root and
any dots/convolutions inside it.

Run: python scripts/hlo_attrib.py fusion.634 fusion.2142 step.1 vmap__.6 ...
     (no args: prints a default hot list from the 2026-08-18 trace)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


DEFAULT_OPS = [
    "step.1", "cond.2", "vmap__.6", "vmap__.7", "vmap__.8", "vmap__.9",
    "fusion.69", "fusion.634", "fusion.615", "fusion.618", "fusion.913",
    "fusion.919", "fusion.565", "fusion.1035", "fusion.2142", "fusion.2196",
    "convert_reduce_fusion.2", "pad.15",
]


def build_programs():
    from vosesam_tpu.config import (
        FrameworkConfig, RefinementConfig, SAMConfig, XMemConfig,
    )
    from vosesam_tpu.inference import core
    from vosesam_tpu.inference.chunked import (
        _refine_chunk, _xmem_chunk_step, _xmem_chunk_step_impl,
    )
    from vosesam_tpu.models.sam import predictor
    from vosesam_tpu.models.xmem import network as xnet

    cfg = FrameworkConfig(
        xmem=XMemConfig(max_objects=3),
        sam=SAMConfig(model_type="vit_h", hq=True, use_flash_attention=True,
                      windowed_attention_impl="xla_fused_bias",
                      encode_rect=True),
        refinement=RefinementConfig(use_refinement=True, mode="both_neg",
                                    optimized=True),
        dtype="bfloat16",
    )
    h, w, K, O = 480, 854, 8, 3

    def sds(tree):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)

    xmem_params = jax.eval_shape(
        lambda: xnet.xmem_init(jax.random.PRNGKey(0), cfg.xmem,
                               dtype=jnp.bfloat16))
    sam_params = jax.eval_shape(
        lambda: predictor.sam_init(jax.random.PRNGKey(1), cfg.sam,
                                   dtype=jnp.bfloat16))
    state = sds(jax.eval_shape(
        lambda: core.init_tracker_state(cfg, (h, w))))
    frame = jax.ShapeDtypeStruct((h, w, 3), jnp.uint8)

    xstep = jax.jit(_xmem_chunk_step_impl, static_argnames=("cfg",)).lower(
        xmem_params, state, frame, cfg)

    pf_one = jax.eval_shape(
        lambda: (
            jnp.zeros((O, h, w)), jnp.zeros((O, h, w)), jnp.zeros((O,)),
            jnp.zeros((h, w), jnp.int32), jnp.zeros((O,), bool),
        ))
    per_frame = tuple(sds(pf_one) for _ in range(K))
    frames = tuple(frame for _ in range(K))
    refine = _refine_chunk.lower(sam_params, frames, per_frame, cfg)
    return {"xmem": xstep, "refine": refine}


def attribute(txt: str, name: str, label: str) -> bool:
    # defining line: `  %name = type fusion(...), calls=%comp ...`
    pat = re.compile(r"^\s*%?" + re.escape(name) + r"\s*=\s*(.*)$",
                     re.MULTILINE)
    m = pat.search(txt)
    if not m:
        return False
    line = m.group(1)
    print(f"\n=== {name}  [{label}]")
    print("  " + line[:300])
    cm = re.search(r"calls=%?([\w\.\-]+)", line)
    if cm:
        comp = cm.group(1)
        cpat = re.compile(r"^%?" + re.escape(comp) + r"\s.*?\{(.*?)^\}",
                          re.MULTILINE | re.DOTALL)
        c = cpat.search(txt)
        if c:
            body = c.group(1)
            lines = body.strip().splitlines()
            interesting = [
                ln.strip() for ln in lines
                if re.search(r"= \S+ (dot|convolution|reduce|transpose|"
                             r"gather|scatter|sort|rng|exponential|copy)\(",
                             ln)
            ]
            root = [ln.strip() for ln in lines if "ROOT" in ln]
            print(f"  computation {comp}: {len(lines)} instrs")
            for ln in (interesting[:8] + root[:1]):
                print("    " + ln[:240])
    return True


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    ops = sys.argv[1:] or DEFAULT_OPS
    progs = build_programs()
    texts = {}
    for label, lowered in progs.items():
        print(f"compiling {label} ...", flush=True)
        texts[label] = lowered.compile().as_text()
        print(f"  {label}: {len(texts[label]):,} chars", flush=True)
    for name in ops:
        found = any(attribute(texts[label], name, label)
                    for label in texts)
        if not found:
            print(f"\n=== {name}: NOT FOUND in either module")


if __name__ == "__main__":
    main()
