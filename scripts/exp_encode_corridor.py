"""Encode-resolution corridor: the letterbox fast gear vs the official square.

The letterbox gear (SAMConfig.encode_letterbox_hw=(448, 896)) runs the
trained encoder at ~0.875x the official internal resolution with the
official resize+pad semantics (geometry-true). It is 1.41x faster on-chip
(BENCH_r03) but parked opt-in pending J&F validation. This harness repeats
the round-3 prompt-corridor method (exp_prompt_corridor.py) on the OTHER
axis — internal encode resolution — against the same torch oracle with the
same converted weights:

  tm_ref       torch SamModel @ official square        (reference behavior)
  jm_official  JAX predictor  @ official square        (numerics-only column;
               torch-vs-JAX parity at equal geometry is already proven by
               tests/test_reference_parity_sam.py)
  jm_letterbox JAX predictor  @ letterbox grid, SAME prompts
  tm_jitter    torch @ official square, prompts jittered ±2 px — the
               decoder-chaos CONTROL (random weights make the decoder
               chaotic under ANY perturbation; a geometry change can only
               be judged RELATIVE to this)

plus an embedding-field column that sidesteps the random decoder entirely:
cosine similarity between the letterbox content grid (bilinearly aligned)
and the official content grid, against the same similarity for a ±1-patch
translational jitter of the official encode.

All masks are compared at ORIGINAL resolution (the product output space).

IMPORTANT CAVEAT (printed with the results): with random weights the
encoder is not scale-robust the way the trained SAM is — published SAM
evidence and the trained checkpoint are the only way to settle absolute
J&F. This corridor bounds the RELATIVE geometry effect the same way the
round-3 prompt corridor did, and is recorded in BASELINE.md either to
promote the gear or to justify keeping it opt-in.

Run: python scripts/exp_encode_corridor.py [--scale full|half]
  full: frames (480, 854), official 1024 square, letterbox (448, 896) —
        the production geometry (slow on CPU: ~15-30 min).
  half: frames (240, 427), official 512 square, letterbox (224, 448) —
        IDENTICAL scale ratios (0.933 fit vs 1.199 official), 4x cheaper;
        what tests/test_encode_corridor.py asserts.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAM_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_STD = np.array([58.395, 57.12, 57.375], np.float32)


# ---------------------------------------------------------------- corpus

def corpus(hw):
    """Masks from the round-3 prompt corpus, resized to the frame size."""
    import cv2

    from scripts.exp_prompt_corridor import corpus as base_corpus

    h, w = hw
    out = []
    for name, m in base_corpus(256):
        mm = cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
        if mm.sum() < 40:
            continue
        out.append((name, mm))
    return out


def image_for(mask, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, mask.shape + (3,), np.uint8)
    obj = np.array([210, 60, 60], np.uint8)
    return np.where(mask[..., None] > 0,
                    (0.25 * img + 0.75 * obj).astype(np.uint8), img)


def prompts_for(mask):
    """Deterministic prompt pack: 3 interior positive points + 1 negative
    (identical in every column — the corridor isolates encode geometry)."""
    ys, xs = np.nonzero(mask)
    order = np.argsort(ys * mask.shape[1] + xs)
    picks = order[[len(order) // 4, len(order) // 2, (3 * len(order)) // 4]]
    pos = np.stack([xs[picks], ys[picks]], -1).astype(np.float32)
    bg = np.nonzero(mask == 0)
    neg = np.array([[bg[1][len(bg[1]) // 2], bg[0][len(bg[0]) // 2]]],
                   np.float32)
    coords = np.concatenate([pos, neg], 0)
    labels = np.array([1, 1, 1, 0], np.int32)
    return coords, labels


# ---------------------------------------------------------------- oracle

def build_models(image_size, letterbox_hw):
    """Random-weight HF SamModel @ vit_b/image_size + the SAME weights in
    the JAX predictor under three geometries (official / letterbox)."""
    import torch
    import transformers

    from tests.test_reference_parity_sam import _hf_key_to_official
    from vosesam_tpu.config import SAMConfig
    from vosesam_tpu.utils.checkpoint import load_sam_checkpoint

    torch.manual_seed(0)
    hf_cfg = transformers.SamConfig(
        vision_config=dict(image_size=image_size),
        prompt_encoder_config=dict(image_size=image_size),
    )
    hf = transformers.SamModel(hf_cfg).eval()
    official = {}
    for k, v in hf.state_dict().items():
        ok = _hf_key_to_official(k)
        if ok:
            official[ok] = v
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "sam_vit_b.pth")
        torch.save(official, p)
        base = dict(model_type="vit_b", image_size=image_size, hq=False,
                    use_flash_attention=False, windowed_attention_impl="xla")
        cfg_sq = SAMConfig(**base)
        cfg_lb = SAMConfig(**base, encode_letterbox_hw=letterbox_hw)
        params = load_sam_checkpoint(p, cfg_sq)
    return hf, params, cfg_sq, cfg_lb


def torch_embed(hf, img, image_size):
    """Official ResizeLongestSide + normalize + square pad -> embeddings."""
    import torch
    import torch.nn.functional as F

    h0, w0 = img.shape[:2]
    scale = image_size / max(h0, w0)
    nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
    t = torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None]
    t = F.interpolate(t, (nh, nw), mode="bilinear", align_corners=False)
    t = (t - torch.from_numpy(SAM_MEAN)[None, :, None, None]) / \
        torch.from_numpy(SAM_STD)[None, :, None, None]
    t = F.pad(t, (0, image_size - nw, 0, image_size - nh))
    with torch.no_grad():
        emb = hf.get_image_embeddings(t)
    return emb, (nh, nw), scale


def torch_mask(hf, emb, input_hw, scale, coords, labels, orig_hw, image_size):
    """Decode with prompts (original-space xy) -> bool mask at orig res."""
    import torch
    import torch.nn.functional as F

    pts = torch.from_numpy(coords * scale)[None, None]
    lbl = torch.from_numpy(labels.astype(np.int64))[None, None]
    with torch.no_grad():
        out = hf(image_embeddings=emb, input_points=pts, input_labels=lbl,
                 multimask_output=False)
    low = out.pred_masks[0, 0]                       # (1, 256, 256)
    up = F.interpolate(low[None], (image_size, image_size),
                       mode="bilinear", align_corners=False)[0]
    up = up[:, : input_hw[0], : input_hw[1]]
    full = F.interpolate(up[None], orig_hw, mode="bilinear",
                         align_corners=False)[0, 0]
    return full.numpy() > 0


def jax_encode(params, cfg, img):
    import jax
    import jax.numpy as jnp

    from vosesam_tpu.models.sam import predictor

    fn = jax.jit(predictor.encode_image, static_argnums=2)
    return fn(params, jnp.asarray(img), cfg)


def jax_mask(params, cfg, emb, coords, labels):
    import jax
    import jax.numpy as jnp

    from vosesam_tpu.models.sam import predictor

    fn = jax.jit(predictor.predict, static_argnums=5)
    pred = fn(params, emb, jnp.asarray(coords), jnp.asarray(labels),
              None, cfg)
    return np.asarray(pred.masks[0])


def iou(a, b):
    a = a.astype(bool); b = b.astype(bool)
    u = (a | b).sum()
    return float((a & b).sum() / u) if u else 1.0


def content_grid(emb_arr, input_hw, patch=16):
    """Crop the embedding grid to content tokens (ceil(input/patch))."""
    gh = -(-input_hw[0] // patch)
    gw = -(-input_hw[1] // patch)
    return np.asarray(emb_arr)[:gh, :gw]


def field_cosine(a, b):
    """Bilinear-align grid b to a's shape; mean per-location cosine."""
    import jax
    import jax.numpy as jnp

    bb = np.asarray(jax.image.resize(
        jnp.asarray(b), (a.shape[0], a.shape[1], b.shape[2]), "linear"))
    num = (a * bb).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(bb, axis=-1) + 1e-9
    return float((num / den).mean())


# ------------------------------------------------------------------- main

def run_corridor(scale="half"):
    import jax

    if scale == "full":
        frame_hw, image_size, lb = (480, 854), 1024, (448, 896)
    elif scale == "tiny":
        # same fit ratios (0.933 letterbox vs 1.196 official longest-side)
        # at 1/4 cost — what tests/test_encode_corridor.py asserts
        frame_hw, image_size, lb = (120, 214), 256, (112, 224)
    else:
        frame_hw, image_size, lb = (240, 427), 512, (224, 448)

    hf, params, cfg_sq, cfg_lb = build_models(image_size, lb)
    rows = []
    for seed, (name, mask) in enumerate(corpus(frame_hw)):
        img = image_for(mask, seed)
        coords, labels = prompts_for(mask)

        temb, input_hw_t, tscale = torch_embed(hf, img, image_size)
        tm_ref = torch_mask(hf, temb, input_hw_t, tscale, coords, labels,
                            frame_hw, image_size)
        jr = np.random.default_rng(100 + seed)
        cj = coords + jr.integers(-2, 3, coords.shape).astype(np.float32)
        tm_jit = torch_mask(hf, temb, input_hw_t, tscale, cj, labels,
                            frame_hw, image_size)

        emb_sq = jax_encode(params, cfg_sq, img)
        emb_lb = jax_encode(params, cfg_lb, img)
        jm_sq = jax_mask(params, cfg_sq, emb_sq, coords, labels)
        jm_lb = jax_mask(params, cfg_lb, emb_lb, coords, labels)

        # embedding-field geometry column (decoder-free): letterbox content
        # grid vs official content grid, against a 1-patch translational
        # jitter of the official grid as the control.
        g_sq = content_grid(emb_sq.embedding, emb_sq.input_hw)
        g_lb = content_grid(emb_lb.embedding, emb_lb.input_hw)
        cos_lb = field_cosine(g_sq, g_lb)
        cos_jit = field_cosine(g_sq[1:, 1:], g_sq[:-1, :-1])

        rows.append({
            "mask": name,
            "iou_numerics": round(iou(tm_ref, jm_sq), 4),   # torch vs JAX, same geometry
            "iou_letterbox": round(iou(tm_ref, jm_lb), 4),  # the gear under test
            "iou_jitter": round(iou(tm_ref, tm_jit), 4),    # ±2px prompt control
            "emb_cos_letterbox": round(cos_lb, 4),
            "emb_cos_shift1": round(cos_jit, 4),
        })
        print(rows[-1], flush=True)
    return rows


def summarize(rows):
    med = lambda k: float(np.median([r[k] for r in rows]))
    s = {k: round(med(k), 4) for k in
         ("iou_numerics", "iou_letterbox", "iou_jitter",
          "emb_cos_letterbox", "emb_cos_shift1")}
    s["letterbox_vs_jitter"] = round(s["iou_letterbox"] - s["iou_jitter"], 4)
    return s


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="half", choices=("tiny", "half", "full"))
    args = ap.parse_args()
    rows = run_corridor(args.scale)
    cols = list(rows[0].keys())
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |")
    print("medians:", summarize(rows))
    print("CAVEAT: random weights — the corridor is RELATIVE (letterbox vs "
          "the jitter control); absolute J&F needs real checkpoints.")


if __name__ == "__main__":
    main()
