"""Video inpainting driver (BaseInpainter equivalent).

Reference: inpainter/base_inpainter.py —
  - `inpaint` (:176-247): split the video into `num_subset_frames`=50 chunks
    with `num_external_ref`=2 temporal-context frames at stride `step`=10
    prepended/appended; remainder folded into the first split;
  - `inpaint_efficient` (:53-174): dilate masks (radius 15), optional
    downscale, per-window loop with stride `neighbor_stride`=5 plus strided
    reference frames (`get_ref_index` :37-51), pad H to mod-60 / W to mod-108
    by flip-reflection, composite predictions into the masked region and
    50/50-average overlapping windows.

The generator runs jitted per (window length, H, W) signature; the windowing
logic stays on host (pure orchestration)."""

from __future__ import annotations

import os
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vosesam_tpu.config import InpainterConfig
from vosesam_tpu.models.e2fgvi import generator as G
from vosesam_tpu.ops import morphology as morph


def get_ref_index(f: int, neighbor_ids: List[int], length: int,
                  num_ref: int, ref_length: int) -> List[int]:
    """Strided reference-frame selection (base_inpainter.py:37-51)."""
    ref_index = []
    if num_ref == -1:
        for i in range(0, length, ref_length):
            if i not in neighbor_ids:
                ref_index.append(i)
    else:
        start = max(0, f - ref_length * (num_ref // 2))
        end = min(length, f + ref_length * (num_ref // 2))
        for i in range(start, end + 1, ref_length):
            if i not in neighbor_ids:
                ref_index.append(i)
                if len(ref_index) >= num_ref:
                    break
    return ref_index


def static_window_plan(f: int, t: int, stride: int, step: int, r_static: int):
    """Fixed-shape window plan for anchor `f` (InpainterConfig.static_windows).

    Returns (ids, num_local, n_valid, write_ids) with len(ids) == num_local
    + r_static and num_local == min(t, 2*stride+1), both constant across all
    anchors of a t-frame subset, so ONE jit signature covers the whole video:
      - neighbors: the 2*stride+1 window clamped INSIDE [0, t) — edge
        windows slide inward and gain real context frames instead of
        shrinking (interior anchors get exactly the reference's neighbors);
      - refs: the reference's rule (stride-`step` frames outside the
        neighbor set, base_inpainter.py:37-51), PADDED to `r_static` slots
        with dummy frames that the generator masks out of every attention
        softmax (frame_valid) — so a padded window's predictions are
        bit-identical to the unpadded computation;
      - write_ids: the REFERENCE'S neighbor set (base_inpainter.py:123-128)
        — compositing/blending structure stays exactly reference-shaped.
    """
    n_nb = min(t, 2 * stride + 1)
    start = min(max(0, f - stride), t - n_nb)
    neighbor_ids = list(range(start, start + n_nb))
    write_ids = list(range(max(0, f - stride), min(t, f + stride + 1)))
    refs = [i for i in range(0, t, step) if i not in neighbor_ids]
    n_valid = n_nb + len(refs)
    ids = neighbor_ids + refs + [0] * (r_static - len(refs))
    return ids, n_nb, n_valid, write_ids


def static_ref_budget(t: int, stride: int, step: int) -> int:
    """max_f len(refs) for the static plan — the padded ref-slot count."""
    n_nb = min(t, 2 * stride + 1)
    best = 0
    for f in range(0, t, stride):
        start = min(max(0, f - stride), t - n_nb)
        nb = range(start, start + n_nb)
        best = max(best, len([i for i in range(0, t, step) if i not in nb]))
    return best


@jax.jit
def _to_uint8(c: jax.Array) -> jax.Array:
    return jnp.clip(c, 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnums=(1,))
def _dilate_n(m: jax.Array, n: int) -> jax.Array:
    """n rounds of 3x3 dilation over (T, H, W) masks, one jit (the host
    path's per-iteration round trips cost ~6 MB x n over the dev tunnel)."""
    for _ in range(n):
        m = jax.vmap(lambda x: morph.dilate(x, 1))(m)
    return m


@partial(jax.jit, static_argnums=(2, 3))
def _resize_all(frames_u8: jax.Array, masks: jax.Array, nh: int, nw: int):
    t = frames_u8.shape[0]
    fr = jax.image.resize(
        frames_u8.astype(jnp.float32), (t, nh, nw, 3), "linear")
    mk = jax.image.resize(masks, (t, nh, nw), "nearest")
    return fr, mk


@jax.jit
def _norm_pad(frames_f: jax.Array, masks: jax.Array) -> jax.Array:
    """[0,255] frames -> [-1,1] masked video, flip-padded to mod-60/108
    (the device twin of _flip_pad)."""
    h, w = frames_f.shape[1:3]
    ph = -h % 60
    pw = -w % 108
    masked = (frames_f / 127.5 - 1.0) * (1.0 - masks[..., None])
    if ph:
        masked = jnp.concatenate([masked, masked[:, h - ph:][:, ::-1]], axis=1)
    if pw:
        wcur = masked.shape[2]
        masked = jnp.concatenate(
            [masked, masked[:, :, wcur - pw:][:, :, ::-1]], axis=2)
    return masked


def _flip_pad(x: np.ndarray, mod_h: int = 60, mod_w: int = 108) -> np.ndarray:
    """Pad H/W to the generator's module sizes by flip reflection
    (base_inpainter.py:149-158)."""
    t, h, w = x.shape[:3]
    ph = -h % mod_h
    pw = -w % mod_w
    if ph:
        x = np.concatenate([x, x[:, h - ph:][:, ::-1]], axis=1)
    if pw:
        x = np.concatenate([x, x[:, :, x.shape[2] - pw:][:, :, ::-1]], axis=2)
    return x


class Inpainter:
    """Host session holding generator params + the windowing policy."""

    def __init__(
        self,
        checkpoint: Optional[str] = None,
        cfg: InpainterConfig = InpainterConfig(),
        params=None,
        mesh=None,
    ) -> None:
        """`mesh`: optional jax.sharding.Mesh — static windows run
        data-parallel over its leading axis, one window per device (the
        per-chip optimum; on-chip vmapped batching loses, BASELINE.md).
        Window grouping, tail padding and compositing are unchanged."""
        self.cfg = cfg
        self.mesh = mesh
        if params is not None:
            self.params = params
        elif checkpoint and os.path.exists(checkpoint):
            from vosesam_tpu.utils.checkpoint import load_e2fgvi_checkpoint

            self.params = load_e2fgvi_checkpoint(checkpoint)
        else:
            self.params = G.generator_init(jax.random.PRNGKey(0), cfg)
        # ONE jit for all windows (num_local static): building a fresh
        # jax.jit(partial(...)) per call would re-trace every window —
        # the window loop calls this dozens of times per video.
        self._fwd = jax.jit(
            lambda p, f, nl: G.generator_forward(p, f, nl, self.cfg),
            static_argnums=2,
        )
        # Device-composite fast path (InpainterConfig.device_composite): the
        # window gather happens INSIDE the jit from the once-uploaded padded
        # video (ids traced i32) — no per-window host->device window upload.
        self._fwd_gather = jax.jit(
            lambda p, video, ids, nl, fv: G.generator_forward(
                p, video[ids], nl, self.cfg, frame_valid=fv)[0],
            static_argnums=3,
        )
        self._composite_fns = {}   # (n_written, h, w) -> jitted update
        self._fwd_masked = jax.jit(
            lambda p, f, nl, fv: G.generator_forward(
                p, f, nl, self.cfg, frame_valid=fv),
            static_argnums=2,
        )
        # window_batch > 1: B independent static windows per call (vmapped;
        # see InpainterConfig.window_batch). One extra jit signature.
        self._fwd_masked_batched = jax.jit(
            lambda p, f, nl, fv: jax.vmap(
                lambda ff, fvv: G.generator_forward(
                    p, ff, nl, self.cfg, frame_valid=fvv)[0])(f, fv),
            static_argnums=2,
        )
        if mesh is not None:
            from vosesam_tpu.parallel import inpaint_shard

            self._shardlib = inpaint_shard
            self.params = inpaint_shard.replicate_params(self.params, mesh)
            self._sharded_fns = {}  # num_local -> jitted shard_map fn

    # ------------------------------------------------------------- core

    def _run_window(self, frames_np: np.ndarray, num_local: int,
                    frame_valid: Optional[np.ndarray] = None) -> np.ndarray:
        """frames_np: (T, H, W, 3) float in [-1, 1] (already padded)."""
        if frame_valid is not None:
            out, _ = self._fwd_masked(
                self.params, jnp.asarray(frames_np), num_local,
                jnp.asarray(frame_valid))
        else:
            out, _ = self._fwd(self.params, jnp.asarray(frames_np), num_local)
        return np.asarray(out)

    # ---------------------------------------------- device composite path

    def _composite_update_fn(self, n_written: int, h: int, w: int):
        """Jitted masked-composite + 50/50 overlap blend for one window's
        contiguous write span (base_inpainter.py:129-146 arithmetic, same
        order as the host path). One signature per distinct span length."""
        key = (n_written, h, w)
        fn = self._composite_fns.get(key)
        if fn is None:

            def update(comp, seen, pred, frames_f, masks_f, w0, nb_start):
                seg = jax.lax.dynamic_slice(
                    pred, (w0 - nb_start, 0, 0, 0),
                    (n_written, pred.shape[1], pred.shape[2], 3))[:, :h, :w]
                seg = (seg + 1.0) / 2.0 * 255.0
                m = jax.lax.dynamic_slice(
                    masks_f, (w0, 0, 0), (n_written, h, w))[..., None]
                img = jax.lax.dynamic_slice(
                    frames_f, (w0, 0, 0, 0), (n_written, h, w, 3))
                compseg = seg * m + img * (1.0 - m)
                old = jax.lax.dynamic_slice(
                    comp, (w0, 0, 0, 0), (n_written, h, w, 3))
                oldseen = jax.lax.dynamic_slice(seen, (w0,), (n_written,))
                new = jnp.where(oldseen[:, None, None, None],
                                0.5 * old + 0.5 * compseg, compseg)
                comp = jax.lax.dynamic_update_slice(comp, new, (w0, 0, 0, 0))
                seen = jax.lax.dynamic_update_slice(
                    seen, jnp.ones((n_written,), bool), (w0,))
                return comp, seen

            fn = jax.jit(update)
            self._composite_fns[key] = fn
        return fn

    def _preprocess_device(self, frames, masks, ratio, radius):
        """Mask dilation, optional downscale, normalization and flip-pad,
        all in device-resident jits (the host path round-trips per dilation
        iteration — ~6 MB x radius over the dev tunnel)."""
        h, w = frames[0].shape[:2]
        frames_u8 = jnp.asarray(np.stack(frames))
        masks_b = jnp.asarray(
            np.stack([np.asarray(m) > 0 for m in masks]), jnp.float32)

        if radius > 0:
            masks_b = _dilate_n(masks_b, radius)

        if ratio != 1.0:
            nh = max(50, int(h * ratio)) // 2 * 2
            nw = max(50, int(w * ratio)) // 2 * 2
            frames_f, masks_b = _resize_all(frames_u8, masks_b, nh, nw)
            h, w = nh, nw
        else:
            frames_f = frames_u8.astype(jnp.float32)

        padded = _norm_pad(frames_f, masks_b)
        return frames_f, masks_b, padded, h, w

    def inpaint_efficient(
        self, frames: Sequence[np.ndarray], masks: Sequence[np.ndarray],
        ratio: float = 1.0, dilate_radius: Optional[int] = None,
    ) -> List[np.ndarray]:
        """base_inpainter.py:53-174 for one subset."""
        if self.cfg.device_composite:
            return self._inpaint_efficient_device(
                frames, masks, ratio, dilate_radius)
        return self._inpaint_efficient_host(frames, masks, ratio, dilate_radius)

    def _inpaint_efficient_device(
        self, frames: Sequence[np.ndarray], masks: Sequence[np.ndarray],
        ratio: float = 1.0, dilate_radius: Optional[int] = None,
    ) -> List[np.ndarray]:
        """Device-composite fast path: the padded video uploads once, every
        window is gathered and predicted on-device, the reference's
        composite/blend runs in a jitted update, and ONE uint8 array comes
        back per subset — vs a ~19 MB fp32 round trip per window on the
        host path (same windows, same blend order/arithmetic;
        tests/test_inpainter.py asserts equality)."""
        cfg = self.cfg
        radius = cfg.dilate_radius if dilate_radius is None else dilate_radius
        t = len(frames)
        frames_f, masks_f, padded, h, w = self._preprocess_device(
            frames, masks, ratio, radius)

        use_static = (
            cfg.static_windows and cfg.num_ref == -1
            and t > 2 * cfg.neighbor_stride + 1
        )
        r_static = (static_ref_budget(t, cfg.neighbor_stride, cfg.step)
                    if use_static else 0)
        anchors = list(range(0, t, cfg.neighbor_stride))
        dp = 0
        if self.mesh is not None and use_static:
            dp = self.mesh.devices.shape[0]
            wb = dp * max(1, cfg.window_batch)
        else:
            wb = cfg.window_batch if use_static else 1

        comp = jnp.zeros((t, h, w, 3), jnp.float32)
        seen = jnp.zeros((t,), bool)

        for g in range(0, len(anchors), max(wb, 1)):
            group = anchors[g:g + max(wb, 1)]
            preds_dev = None
            if use_static:
                plans = [static_window_plan(
                    f, t, cfg.neighbor_stride, cfg.step, r_static)
                    for f in group]
                if wb > 1:
                    n_real = len(plans)
                    pad_plans = plans + [plans[-1]] * (wb - n_real)
                    # window gather on device (one slice dispatch per group)
                    idsb = jnp.asarray([p[0] for p in pad_plans], jnp.int32)
                    windows = padded[idsb]
                    valids = jnp.asarray(np.stack([
                        np.arange(len(p[0])) < p[2] for p in pad_plans]))
                    if dp:
                        nl = plans[0][1]
                        fn = self._sharded_fns.get(nl)
                        if fn is None:
                            fn = self._shardlib.make_sharded_window_fn(
                                cfg, self.mesh, nl)
                            self._sharded_fns[nl] = fn
                        wj, vj = self._shardlib.shard_windows(
                            windows, valids, self.mesh)
                        preds_dev = fn(self.params, wj, vj)
                    else:
                        preds_dev = self._fwd_masked_batched(
                            self.params, windows, plans[0][1], valids)
            for bi, f in enumerate(group):
                if use_static:
                    ids, num_local, n_valid, write_ids = plans[bi]
                    nb_start = ids[0]
                    if wb > 1:
                        pred = preds_dev[bi]
                    else:
                        valid = jnp.asarray(np.arange(len(ids)) < n_valid)
                        pred = self._fwd_gather(
                            self.params, padded,
                            jnp.asarray(ids, jnp.int32), num_local, valid)
                else:
                    write_ids = list(
                        range(max(0, f - cfg.neighbor_stride),
                              min(t, f + cfg.neighbor_stride + 1))
                    )
                    ref_ids = get_ref_index(
                        f, write_ids, t, cfg.num_ref, cfg.step)
                    ids = write_ids + ref_ids
                    num_local = len(write_ids)
                    nb_start = write_ids[0]
                    pred = self._fwd_gather(
                        self.params, padded, jnp.asarray(ids, jnp.int32),
                        num_local, jnp.ones((len(ids),), bool))

                upd = self._composite_update_fn(len(write_ids), h, w)
                comp, seen = upd(comp, seen, pred, frames_f, masks_f,
                                 jnp.int32(write_ids[0]), jnp.int32(nb_start))

        out = np.asarray(_to_uint8(comp))
        return [out[i] for i in range(t)]

    # ------------------------------------------------- host composite path

    def _inpaint_efficient_host(
        self, frames: Sequence[np.ndarray], masks: Sequence[np.ndarray],
        ratio: float = 1.0, dilate_radius: Optional[int] = None,
    ) -> List[np.ndarray]:
        """base_inpainter.py:53-174 for one subset (host compositing —
        the reference-shaped path, kept as the equality baseline)."""
        cfg = self.cfg
        radius = cfg.dilate_radius if dilate_radius is None else dilate_radius
        t = len(frames)
        h, w = frames[0].shape[:2]

        masks_np = np.stack([np.asarray(m, np.float32) > 0 for m in masks])
        if radius > 0:
            # the reference uses a (2r+1) kernel once; n rounds of 3x3 are
            # equivalent — one jitted call, no per-iteration retrace.
            masks_np = np.asarray(_dilate_n(jnp.asarray(masks_np), radius))
        masks_np = masks_np.astype(np.float32)

        if ratio != 1.0:
            nh = max(50, int(h * ratio)) // 2 * 2
            nw = max(50, int(w * ratio)) // 2 * 2
            frames = [
                np.asarray(jax.image.resize(jnp.asarray(f, jnp.float32), (nh, nw, 3), "linear"))
                for f in frames
            ]
            masks_np = np.asarray(
                jax.image.resize(jnp.asarray(masks_np), (t, nh, nw), "nearest")
            )
            h, w = nh, nw

        video = np.stack([np.asarray(f, np.float32) / 127.5 - 1.0 for f in frames])
        masked = video * (1.0 - masks_np[..., None])

        padded = _flip_pad(masked)
        comp_frames: List[Optional[np.ndarray]] = [None] * t

        # static_windows: one jit signature for the whole subset (vs one per
        # distinct neighbors+refs count on the variable path)
        use_static = (
            cfg.static_windows and cfg.num_ref == -1
            and t > 2 * cfg.neighbor_stride + 1
        )
        r_static = (static_ref_budget(t, cfg.neighbor_stride, cfg.step)
                    if use_static else 0)

        anchors = list(range(0, t, cfg.neighbor_stride))
        dp = 0
        if self.mesh is not None and use_static:
            # one window per device over the mesh's data axis (times any
            # explicit on-chip window_batch — default 1, the measured optimum)
            dp = self.mesh.devices.shape[0]
            wb = dp * max(1, cfg.window_batch)
        else:
            wb = cfg.window_batch if use_static else 1
        for g in range(0, len(anchors), max(wb, 1)):
            group = anchors[g:g + max(wb, 1)]
            if use_static:
                plans = [static_window_plan(
                    f, t, cfg.neighbor_stride, cfg.step, r_static)
                    for f in group]
                if wb > 1:
                    # one vmapped call for the group; short tail groups pad
                    # by repeating the last window (outputs discarded) so
                    # the whole video runs ONE batched jit signature
                    n_real = len(plans)
                    pad_plans = plans + [plans[-1]] * (wb - n_real)
                    windows = np.stack([padded[p[0]] for p in pad_plans])
                    valids = np.stack([
                        np.arange(len(p[0])) < p[2] for p in pad_plans])
                    if dp:
                        nl = plans[0][1]
                        fn = self._sharded_fns.get(nl)
                        if fn is None:
                            fn = self._shardlib.make_sharded_window_fn(
                                cfg, self.mesh, nl)
                            self._sharded_fns[nl] = fn
                        wj, vj = self._shardlib.shard_windows(
                            jnp.asarray(windows), jnp.asarray(valids),
                            self.mesh)
                        preds = np.asarray(fn(self.params, wj, vj))[:n_real]
                    else:
                        preds = np.asarray(self._fwd_masked_batched(
                            self.params, jnp.asarray(windows), plans[0][1],
                            jnp.asarray(valids)))[:n_real]
                else:
                    preds = [None]
            for bi, f in enumerate(group):
                if use_static:
                    ids, num_local, n_valid, write_ids = plans[bi]
                    nb_start = ids[0]
                    if wb > 1:
                        pred = preds[bi]
                    else:
                        valid = np.arange(len(ids)) < n_valid
                        pred = self._run_window(padded[ids], num_local, valid)
                else:
                    write_ids = list(
                        range(max(0, f - cfg.neighbor_stride),
                              min(t, f + cfg.neighbor_stride + 1))
                    )
                    ref_ids = get_ref_index(
                        f, write_ids, t, cfg.num_ref, cfg.step)
                    ids = write_ids + ref_ids
                    num_local = len(write_ids)
                    nb_start = write_ids[0]
                    pred = self._run_window(padded[ids], num_local, None)
                pred = (pred[:, :h, :w] + 1.0) / 2.0 * 255.0

                for idx in write_ids:
                    m = masks_np[idx][..., None]
                    img = np.asarray(frames[idx], np.float32)
                    comp = pred[idx - nb_start] * m + img * (1.0 - m)
                    if comp_frames[idx] is None:
                        comp_frames[idx] = comp
                    else:
                        comp_frames[idx] = 0.5 * comp_frames[idx] + 0.5 * comp
        return [np.clip(c, 0, 255).astype(np.uint8) for c in comp_frames]

    def inpaint(
        self, frames: Sequence[np.ndarray], masks: Sequence[np.ndarray],
        ratio: float = 1.0, dilate_radius: Optional[int] = None,
    ) -> List[np.ndarray]:
        """base_inpainter.py:176-247: subset splitting with temporal context."""
        cfg = self.cfg
        t = len(frames)
        n = cfg.num_subset_frames
        if t <= n:
            return self.inpaint_efficient(frames, masks, ratio, dilate_radius)

        out: List[np.ndarray] = []
        # remainder folds into the FIRST split ("if OOM, let it happen at
        # the beginning", base_inpainter.py:200-208)
        first_len = n + (t % n)
        splits = [(0, first_len)]
        s = first_len
        while s < t:
            splits.append((s, min(s + n, t)))
            s += n

        for si, (a, b) in enumerate(splits):
            pre_ids = [
                max(0, a - cfg.step * (i + 1))
                for i in range(cfg.num_external_ref)
            ][::-1] if a > 0 else []
            post_ids = [
                min(t - 1, b - 1 + cfg.step * (i + 1))
                for i in range(cfg.num_external_ref)
            ] if b < t else []
            ids = pre_ids + list(range(a, b)) + post_ids
            sub_frames = [frames[i] for i in ids]
            sub_masks = [masks[i] for i in ids]
            comp = self.inpaint_efficient(sub_frames, sub_masks, ratio,
                                          dilate_radius)
            out.extend(comp[len(pre_ids): len(pre_ids) + (b - a)])
        return out
