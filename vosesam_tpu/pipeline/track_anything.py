"""TrackingAnything facade: the public pipeline entry point.

Reference: track_anything.py (:14-95) — wires the SAM controller, the
tracker, and (optionally) the inpainter behind one object with:
  - first_frame_click(image, points, labels, multimask)   (:48-50)
  - generator(images, template_mask)                      (:56-81)
  - parse_augment()                                       (:84-95)

Checkpoints are loaded when paths exist; otherwise models are random-
initialized (lets the pipeline run end-to-end without the original weights,
e.g. in tests — real evaluations must pass real checkpoints)."""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vosesam_tpu.config import (
    FrameworkConfig,
    RefinementConfig,
    SAMConfig,
    XMemConfig,
)
from vosesam_tpu.inference.tracker import Tracker
from vosesam_tpu.models.sam import predictor as sam_predictor
from vosesam_tpu.models.xmem import network as xnet
from vosesam_tpu.pipeline.interact import SamController


def load_or_init_xmem(checkpoint: Optional[str], cfg: XMemConfig):
    if checkpoint and os.path.exists(checkpoint):
        from vosesam_tpu.utils.checkpoint import load_xmem_checkpoint

        tree, cfg = load_xmem_checkpoint(checkpoint, cfg)
        return jax.tree.map(jnp.asarray, tree), cfg
    return xnet.xmem_init(jax.random.PRNGKey(0), cfg), cfg


def load_or_init_sam(checkpoint: Optional[str], cfg: SAMConfig):
    if checkpoint and os.path.exists(checkpoint):
        from vosesam_tpu.utils.checkpoint import load_sam_checkpoint

        return load_sam_checkpoint(checkpoint, cfg)
    return sam_predictor.sam_init(jax.random.PRNGKey(1), cfg)


class TrackingAnything:
    """track_anything.py:14-33 equivalent."""

    def __init__(
        self,
        sam_checkpoint: Optional[str] = None,
        xmem_checkpoint: Optional[str] = None,
        e2fgvi_checkpoint: Optional[str] = None,
        cfg: Optional[FrameworkConfig] = None,
        runname: Optional[str] = None,
        save_inner_masks_folder: Optional[str] = None,
        inpaint_mesh=None,
    ) -> None:
        """`inpaint_mesh`: optional jax.sharding.Mesh — inpaint windows run
        data-parallel over its leading axis (parallel/inpaint_shard.py)."""
        self.cfg = cfg or FrameworkConfig()
        self.runname = runname
        xmem_params, xmem_cfg = load_or_init_xmem(xmem_checkpoint, self.cfg.xmem)
        self.cfg = dataclasses.replace(self.cfg, xmem=xmem_cfg)
        self.xmem_params = xmem_params
        self.sam_params = (
            load_or_init_sam(sam_checkpoint, self.cfg.sam)
            if (self.cfg.refinement.use_refinement or sam_checkpoint)
            else None
        )
        self.samcontroler = (
            SamController(self.sam_params, self.cfg.sam)
            if self.sam_params is not None
            else None
        )
        self.xmem = Tracker(
            self.xmem_params, self.sam_params, self.cfg,
            save_inner_masks_folder=save_inner_masks_folder,
        )
        self.baseinpainter = None  # built lazily via vosesam_tpu.models.e2fgvi
        if e2fgvi_checkpoint:
            from vosesam_tpu.pipeline.inpaint import Inpainter

            self.baseinpainter = Inpainter(
                e2fgvi_checkpoint, self.cfg.inpainter, mesh=inpaint_mesh)

    # ------------------------------------------------------------- interact
    def first_frame_click(
        self, image: np.ndarray, points: np.ndarray, labels: np.ndarray,
        multimask: bool = True,
    ):
        """track_anything.py:48-50."""
        return self.samcontroler.first_frame_click(image, points, labels, multimask)

    # ------------------------------------------------------------ batch eval
    def generator(
        self, images: Sequence[np.ndarray], template_mask: np.ndarray
    ) -> Tuple[List[np.ndarray], List[np.ndarray], List[np.ndarray], List[list]]:
        """track_anything.py:56-81: frame 0 seeds with the template mask,
        the rest propagate. Returns (masks, logits, painted_images, scores)."""
        masks, logits, painted, scores = [], [], [], []
        for i, img in enumerate(images):
            if i == 0:
                m, lg, p, s = self.xmem.track(img, template_mask)
            else:
                m, lg, p, s = self.xmem.track(img)
            masks.append(m)
            logits.append(lg)
            painted.append(p)
            scores.append(s)
        return masks, logits, painted, scores

    def generator_chunked(
        self, images: Sequence[np.ndarray], template_mask: np.ndarray,
        chunk: int = 4, paint: bool = False,
    ):
        """Throughput variant of generator(): frame 0 seeds per-frame, the
        rest run through the chunked scan+batched-SAM path (bit-equal masks,
        tests/test_chunked.py; the path behind the headline bench). Skips
        logits accumulation. Returns (masks, scores); with `paint=True`,
        (masks, painted_images, scores) — painted bit-identical to
        generator()'s (same jitted painter, one vmapped dispatch/chunk)."""
        m0, _lg, p0, s0 = self.xmem.track(images[0], template_mask)
        if paint:
            masks, painted, scores = self.xmem.track_batch(
                list(images[1:]), chunk=chunk, paint=True)
            return [m0] + masks, [p0] + painted, [s0] + scores
        masks, scores = self.xmem.track_batch(list(images[1:]), chunk=chunk)
        return [m0] + masks, [s0] + scores


def parse_augment() -> argparse.Namespace:
    """track_anything.py:84-95."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--sam_model_type", type=str, default="vit_h")
    parser.add_argument("--port", type=int, default=6080)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--mask_save", type=bool, default=False)
    return parser.parse_args()
