"""Numerics tests for the core ops against naive NumPy references.

The naive references implement the math exactly as described in the survey of
the PyTorch reference (memory_util.py / aggregate.py / tensor_util.py), so
these act as parity tests without needing torch checkpoints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.ops.aggregate import soft_aggregate
from vosesam_tpu.ops.image import (
    pad_divide_by,
    resize_mask_prompt,
    unpad,
    im_normalize,
)
from vosesam_tpu.ops.memory_attention import (
    get_similarity,
    read_memory_multiobject,
    readout,
    topk_softmax,
)


def naive_similarity(mk, ms, qk, qe):
    """Direct loop-free NumPy version of the anisotropic L2 similarity."""
    # sim[q, m] = ms[m] * -sum_c qe[q,c] * (mk[m,c] - qk[q,c])**2 / sqrt(C)
    d = mk[None, :, :] - qk[:, None, :]          # (Q, M, C)
    w = qe[:, None, :] if qe is not None else 1.0
    sim = -np.sum(w * d * d, axis=-1)
    if ms is not None:
        sim = sim * ms[None, :]
    return sim / np.sqrt(mk.shape[-1])


def naive_topk_softmax(sim, k):
    """Scatter-style top-k softmax like memory_util.py:41-54."""
    q, m = sim.shape
    out = np.zeros_like(sim)
    for i in range(q):
        idx = np.argsort(sim[i])[::-1][:k]
        vals = sim[i][idx]
        e = np.exp(vals - vals.max())
        out[i][idx] = e / e.sum()
    return out


class TestSimilarity:
    def test_matches_naive(self, rng):
        mk = rng.normal(size=(40, 16)).astype(np.float32)
        ms = (1 + rng.random(40)).astype(np.float32)
        qk = rng.normal(size=(12, 16)).astype(np.float32)
        qe = rng.random((12, 16)).astype(np.float32)
        got = np.asarray(get_similarity(jnp.array(mk), jnp.array(ms), jnp.array(qk), jnp.array(qe)))
        want = naive_similarity(mk, ms, qk, qe)
        # The framework uses the reference's expanded form (-a²+2ab-b²),
        # which differs from the direct (a-b)² form by fp32 cancellation.
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-2)

    def test_no_selection_ranking_matches(self, rng):
        # Without qe the reference drops the constant -q² term; rankings and
        # softmax results must still match the full expression per query.
        mk = rng.normal(size=(30, 8)).astype(np.float32)
        qk = rng.normal(size=(5, 8)).astype(np.float32)
        got = np.asarray(get_similarity(jnp.array(mk), None, jnp.array(qk), None))
        full = naive_similarity(mk, None, qk, None)
        for i in range(5):
            np.testing.assert_array_equal(np.argsort(got[i]), np.argsort(full[i]))


class TestTopKSoftmax:
    def test_matches_scatter_version(self, rng):
        sim = rng.normal(size=(9, 50)).astype(np.float32)
        aff, _ = topk_softmax(jnp.array(sim), None, top_k=7)
        want = naive_topk_softmax(sim, 7)
        np.testing.assert_allclose(np.asarray(aff), want, rtol=1e-5, atol=1e-6)

    def test_validity_mask_excludes_slots(self, rng):
        sim = rng.normal(size=(4, 20)).astype(np.float32)
        valid = np.zeros(20, bool)
        valid[:10] = True
        aff, usage = topk_softmax(jnp.array(sim), jnp.array(valid), top_k=5, return_usage=True)
        aff = np.asarray(aff)
        assert np.all(aff[:, 10:] == 0)
        np.testing.assert_allclose(aff.sum(-1), 1.0, rtol=1e-5)
        assert np.asarray(usage).shape == (20,)
        np.testing.assert_allclose(np.asarray(usage), aff.sum(0), rtol=1e-6)

    def test_k_larger_than_m(self, rng):
        sim = rng.normal(size=(3, 6)).astype(np.float32)
        aff, _ = topk_softmax(jnp.array(sim), None, top_k=30)
        # Degenerates to a full softmax.
        want = np.exp(sim - sim.max(-1, keepdims=True))
        want /= want.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(aff), want, rtol=1e-5, atol=1e-6)


class TestReadMemoryMultiObject:
    def test_per_object_extents(self, rng):
        M, Q, Ck, Cv, O = 32, 10, 8, 12, 3
        mk = rng.normal(size=(M, Ck)).astype(np.float32)
        ms = (1 + rng.random(M)).astype(np.float32)
        mv = rng.normal(size=(O, M, Cv)).astype(np.float32)
        qk = rng.normal(size=(Q, Ck)).astype(np.float32)
        qe = rng.random((Q, Ck)).astype(np.float32)
        key_valid = np.ones(M, bool)
        key_valid[28:] = False
        value_valid = np.zeros((O, M), bool)
        value_valid[0, :28] = True   # oldest object sees all slots
        value_valid[1, 10:28] = True  # joined later
        value_valid[2, 20:28] = True
        out, usage = read_memory_multiobject(
            *(jnp.array(a) for a in (mk, ms, mv, qk, qe)),
            key_valid=jnp.array(key_valid),
            value_valid=jnp.array(value_valid),
            top_k=5,
            return_usage=True,
        )
        assert out.shape == (O, Q, Cv)
        # Object 2 readout must equal a single-object read restricted to its span.
        sim = naive_similarity(mk, ms, qk, qe)
        sim_masked = np.where((key_valid & value_valid[2])[None, :], sim, -1e30)
        aff2 = naive_topk_softmax(sim_masked, 5)
        want2 = aff2 @ mv[2]
        # Loose tolerance: expanded-form similarity (see TestSimilarity) can
        # flip near-tied top-k boundary entries vs the direct form.
        np.testing.assert_allclose(np.asarray(out[2]), want2, rtol=0.1, atol=5e-2)
        # Usage only accrues on valid slots.
        assert np.all(np.asarray(usage)[28:] == 0)


class TestAggregate:
    def test_matches_reference_math(self, rng):
        p = rng.random((4, 6, 5)).astype(np.float32) * 0.9
        got = np.asarray(soft_aggregate(jnp.array(p)))
        eps = 1e-7
        bg = np.prod(1 - p, axis=0, keepdims=True)
        st = np.concatenate([bg, p], 0)
        st = np.clip(st, eps, 1 - eps)
        logits = np.log(st / (1 - st))
        want = np.exp(logits) / np.exp(logits).sum(0, keepdims=True)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(got.sum(0), 1.0, rtol=1e-5)

    def test_invalid_objects_are_background(self, rng):
        p = rng.random((3, 4, 4)).astype(np.float32)
        valid = jnp.array([True, True, False])
        out = np.asarray(soft_aggregate(jnp.array(p), valid))
        assert np.all(out[3] == 0)  # padded object never wins
        np.testing.assert_allclose(out.sum(0), 1.0, rtol=1e-5)


class TestImageOps:
    def test_pad_unpad_roundtrip(self, rng):
        x = rng.normal(size=(37, 53, 3)).astype(np.float32)
        padded, pad = pad_divide_by(jnp.array(x), 16)
        assert padded.shape[0] % 16 == 0 and padded.shape[1] % 16 == 0
        back = np.asarray(unpad(padded, pad))
        np.testing.assert_array_equal(back, x)

    def test_pad_is_symmetric_ish(self):
        x = jnp.zeros((30, 30, 1))
        _, (lw, uw, lh, uh) = pad_divide_by(x, 16)
        assert lw + uw == 2 and lh + uh == 2
        assert abs(lw - uw) <= 1 and abs(lh - uh) <= 1

    def test_mask_prompt_resize(self, rng):
        logit = rng.normal(size=(480, 854)).astype(np.float32)
        out = np.asarray(resize_mask_prompt(jnp.array(logit), 256))
        assert out.shape == (256, 256)
        # wide image: width fills 256, height ~143; rows below are min-padded
        nh = int(round(480 * 256 / 854))
        assert np.all(out[nh + 1:] == logit.min())

    def test_normalize(self):
        img = jnp.full((4, 4, 3), 255, jnp.uint8)
        out = np.asarray(im_normalize(img))
        want = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
        np.testing.assert_allclose(out[0, 0], want, rtol=1e-5)


def test_eight_virtual_devices():
    assert jax.device_count() >= 8
