"""Interactive first-frame seeding (click prompts).

Reference: tools/interact_tools.py SamControler.first_frame_click (:49-89) —
one point-prompt pass (multimask, argmax score); when the click history holds
a negative click and the latest click is positive, a second pass feeds the
first pass's best mask logit back as a mask prompt ('both' mode, :57-71);
the chosen mask and the click points are painted for the UI.

TPU latency notes: every device call here is JITTED — the decode+select
and the 3-layer paint each run as a single dispatch. The eager version of
this path measured 690 ms p50 per click on the tunneled chip (predict
alone 443 ms of per-op dispatch overhead); see BASELINE.md.

Prompt-pack convention: the click history travels RAW plus exactly ONE
(0, 0, -1) pad point — the official predictor's `_embed_points(pad=True)`
semantics, the same convention the torch-oracle parity tests pin
(tests/test_reference_parity_sam.py:174-176). Pad tokens are REAL decoder
tokens (not_a_point embeds participate in attention), so a fixed
max_points-padded pack is NOT equivalent — it measured ~40% mask
divergence under random weights and was rejected. Cost: one decoder
compile per distinct click count (persistently cached; click counts are
small integers)."""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vosesam_tpu.config import SAMConfig
from vosesam_tpu.models.sam import predictor
from vosesam_tpu.viz.painter import mask_painter, point_painter

_encode = jax.jit(predictor.encode_image, static_argnames=("cfg",))


@partial(jax.jit, static_argnames=("cfg", "multimask", "two_pass"))
def _click_full(params, emb, image, coords, labels, cfg, multimask,
                two_pass):
    """The WHOLE click in one dispatch: predict (+ the optional second
    'both'-mode pass — its trigger depends only on the click labels, which
    the host knows before dispatching) + mask selection + the 3-layer
    paint. One device round trip per click instead of two/three."""
    pred = predictor.predict(params, emb, coords, labels, None, cfg)
    mask, _, score, low_res = predictor.select_best(pred, cfg, multimask)
    if two_pass:   # interact_tools.py:57-71
        pred2 = predictor.predict(params, emb, coords, labels, low_res, cfg)
        mask, _, score, low_res = predictor.select_best(pred2, cfg, multimask)
    painted = mask_painter(image, mask, jnp.asarray([255, 99, 71], jnp.uint8))
    pos, neg = labels == 1, labels == 0
    painted = point_painter(painted, coords, pos,
                            jnp.asarray([0, 255, 0], jnp.uint8))
    painted = point_painter(painted, coords, neg,
                            jnp.asarray([255, 0, 0], jnp.uint8))
    return mask, low_res, painted


class SamController:
    """Host session: embedding cache + click-driven predictions."""

    def __init__(self, sam_params: predictor.SamParams, cfg: SAMConfig) -> None:
        self.params = sam_params
        self.cfg = cfg
        self.emb: Optional[predictor.ImageEmbedding] = None

    def set_image(self, image: np.ndarray) -> None:
        """BaseSegmenter.set_image (:31-40): encode once, cache by value."""
        self.emb = _encode(self.params, jnp.asarray(image), self.cfg)

    def reset_image(self) -> None:
        self.emb = None

    def first_frame_click(
        self,
        image: np.ndarray,
        points: np.ndarray,      # (P, 2) xy click history
        labels: np.ndarray,      # (P,) 1 pos / 0 neg
        multimask: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (mask (H, W) bool, logit (256, 256), painted image)."""
        if self.emb is None:
            self.set_image(image)
        labels_np = np.asarray(labels)
        # Official prompt pack: the raw clicks + ONE (0,0,-1) pad point
        # (see module docstring).
        pts = np.concatenate(
            [np.asarray(points, np.float32).reshape(-1, 2),
             np.zeros((1, 2), np.float32)], 0)
        lbl = np.concatenate([labels_np.astype(np.int32), [-1]], 0)
        # Two-pass refine when mixing positive + negative clicks (:57-71).
        two_pass = bool(
            len(labels_np) > 1 and labels_np[-1] == 1
            and (labels_np == 0).any())
        mask, low_res, painted = _click_full(
            self.params, self.emb, jnp.asarray(image), jnp.asarray(pts),
            jnp.asarray(lbl), self.cfg, multimask, two_pass)
        return np.asarray(mask), np.asarray(low_res), np.asarray(painted)
