"""SAM prompt encoder, functional JAX.

Re-implements segment_anything's PromptEncoder: random-Fourier positional
encoding of point/box prompts, learned per-label embeddings, and the conv
mask-prompt downscaler. Consumed by the refinement loop's 10 prompt modes
(tracker/base_tracker.py:683-976 drives these through BaseSegmenter.predict).

Static-shape design: points always arrive as a fixed-size (P, 2) array with
integer labels, where label
    -1 = padding (not-a-point), 0 = negative, 1 = positive,
     2 = box corner 1, 3 = box corner 2
exactly the official label convention, which natively supports padded
prompts — the fixed budget costs nothing semantically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vosesam_tpu.config import SAMConfig
from vosesam_tpu.models.layers import Params, conv2d, conv_init, gelu, layer_norm, ln_init


def prompt_encoder_init(key, cfg: SAMConfig, dtype=jnp.float32) -> Params:
    d = cfg.prompt_embed_dim
    ks = jax.random.split(key, 8)
    return {
        "pe_layer": {
            "positional_encoding_gaussian_matrix": jax.random.normal(ks[0], (2, d // 2), dtype)
        },
        "point_embeddings": {
            str(i): {"weight": 0.02 * jax.random.normal(ks[1 + i], (1, d), dtype)}
            for i in range(4)
        },
        "not_a_point_embed": {"weight": 0.02 * jax.random.normal(ks[5], (1, d), dtype)},
        "no_mask_embed": {"weight": 0.02 * jax.random.normal(ks[6], (1, d), dtype)},
        "mask_downscaling": _mask_downscaling_init(ks[7], d, dtype),
    }


def _mask_downscaling_init(key, d, dtype) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "0": conv_init(ks[0], 2, 2, 1, 4, dtype=dtype),      # stride 2
        "1": ln_init(4, dtype),
        "3": conv_init(ks[1], 2, 2, 4, 16, dtype=dtype),     # stride 2
        "4": ln_init(16, dtype),
        "6": conv_init(ks[2], 1, 1, 16, d, dtype=dtype),
    }


def _pe_encode(coords01: jax.Array, gauss: jax.Array) -> jax.Array:
    """coords01 in [0,1] -> random Fourier features (official
    PositionEmbeddingRandom._pe_encoding)."""
    c = 2.0 * coords01 - 1.0
    c = jnp.dot(c.astype(jnp.float32), gauss.astype(jnp.float32))
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def dense_pe(params: Params, grid_hw: Tuple[int, int]) -> jax.Array:
    """Positional encoding over the embedding grid -> (H, W, 256)."""
    h, w = grid_hw
    g = params["pe_layer"]["positional_encoding_gaussian_matrix"]
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2[x,y])
    return _pe_encode(grid, g)


def encode_points(
    params: Params,
    coords: jax.Array,   # (P, 2) xy in the model's 1024-input pixel space
    labels: jax.Array,   # (P,) int32 in {-1, 0, 1, 2, 3}
    cfg: SAMConfig,
    input_hw: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """-> (P, 256) sparse prompt embeddings.

    ``input_hw`` is the model input size the coords are normalized over
    (official forward_with_coords divides x by W and y by H). Defaults to
    the (image_size, image_size) square; rect-encode callers pass the padded
    rect so point PE stays consistent with the dense grid PE."""
    g = params["pe_layer"]["positional_encoding_gaussian_matrix"]
    ih, iw = input_hw if input_hw is not None else (cfg.image_size, cfg.image_size)
    pts = (coords + 0.5) / jnp.asarray([iw, ih], jnp.float32)
    pe = _pe_encode(pts, g)
    pe = jnp.where((labels == -1)[:, None], 0.0, pe)
    table = jnp.concatenate(
        [
            params["not_a_point_embed"]["weight"],      # index 0 <- label -1
            params["point_embeddings"]["0"]["weight"],  # negative
            params["point_embeddings"]["1"]["weight"],  # positive
            params["point_embeddings"]["2"]["weight"],  # box corner 1
            params["point_embeddings"]["3"]["weight"],  # box corner 2
        ],
        axis=0,
    )
    return pe + table[labels + 1]


def encode_mask(params: Params, mask: jax.Array) -> jax.Array:
    """mask: (256, 256) logits -> (64, 64, 256) dense embedding (official
    mask_downscaling: conv-LN-GELU ×2 + 1x1)."""
    p = params["mask_downscaling"]
    y = mask[None, :, :, None]
    y = gelu(layer_norm(conv2d(y, p["0"], stride=2), p["1"]))
    y = gelu(layer_norm(conv2d(y, p["3"], stride=2), p["4"]))
    return conv2d(y, p["6"])[0]


def no_mask_dense(params: Params, grid_hw: Tuple[int, int]) -> jax.Array:
    h, w = grid_hw
    return jnp.broadcast_to(
        params["no_mask_embed"]["weight"].reshape(1, 1, -1), (h, w, params["no_mask_embed"]["weight"].shape[-1])
    )


def box_to_points(box: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(4,) xyxy box -> two corner points with labels (2, 3)."""
    pts = jnp.stack([box[:2], box[2:]], axis=0)
    return pts, jnp.array([2, 3], jnp.int32)
