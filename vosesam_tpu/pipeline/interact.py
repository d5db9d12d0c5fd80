"""Interactive first-frame seeding (click prompts).

Reference: tools/interact_tools.py SamControler.first_frame_click (:49-89) —
one point-prompt pass (multimask, argmax score); when the click history holds
a negative click and the latest click is positive, a second pass feeds the
first pass's best mask logit back as a mask prompt ('both' mode, :57-71);
the chosen mask and the click points are painted for the UI."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vosesam_tpu.config import SAMConfig
from vosesam_tpu.models.sam import predictor
from vosesam_tpu.viz.painter import mask_painter, point_painter


class SamController:
    """Host session: embedding cache + click-driven predictions."""

    def __init__(self, sam_params: predictor.SamParams, cfg: SAMConfig) -> None:
        self.params = sam_params
        self.cfg = cfg
        self.emb: Optional[predictor.ImageEmbedding] = None

    def set_image(self, image: np.ndarray) -> None:
        """BaseSegmenter.set_image (:31-40): encode once, cache by value."""
        self.emb = predictor.encode_image(self.params, jnp.asarray(image), self.cfg)

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
        coords = jnp.asarray(points, jnp.float32)
        lbls = jnp.asarray(labels, jnp.int32)

        pred = predictor.predict(self.params, self.emb, coords, lbls, None, self.cfg)
        mask, _, score, low_res = predictor.select_best(pred, self.cfg, multimask)

        # Two-pass refine when mixing positive + negative clicks (:57-71).
        if len(labels) > 1 and labels[-1] == 1 and (np.asarray(labels) == 0).any():
            pred2 = predictor.predict(
                self.params, self.emb, coords, lbls, low_res, self.cfg
            )
            mask, _, score, low_res = predictor.select_best(pred2, self.cfg, multimask)

        painted = mask_painter(
            jnp.asarray(image), mask, jnp.asarray([255, 99, 71], jnp.uint8)
        )
        pos = lbls == 1
        painted = point_painter(painted, coords, pos, jnp.asarray([0, 255, 0], jnp.uint8))
        painted = point_painter(painted, coords, ~pos, jnp.asarray([255, 0, 0], jnp.uint8))
        return np.asarray(mask), np.asarray(low_res), np.asarray(painted)
