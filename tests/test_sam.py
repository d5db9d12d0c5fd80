"""SAM model tests (vit_b-small config on CPU, random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosesam_tpu.config import SAMConfig
from vosesam_tpu.models.sam import (
    image_encoder,
    mask_decoder,
    predictor,
    prompt_encoder,
)

# Tiny ViT for CPU tests: 256-input -> 16x16 embedding grid.
CFG = SAMConfig(model_type="vit_b", image_size=256, max_points=8)
CFG_HQ = SAMConfig(model_type="vit_b", image_size=256, max_points=8, hq=True)


@pytest.fixture(scope="module")
def tiny_cfg():
    # shrink vit_b to 2 blocks for speed; window 7 divides nothing -> pads
    return SAMConfig(
        model_type="vit_b", image_size=256, window_size=7,
        vit_dims=(("vit_b", 96, 2, 3, (1,)),),
    )


@pytest.fixture(scope="module")
def tiny_hq_cfg():
    return SAMConfig(
        model_type="vit_b", image_size=256, window_size=7, hq=True,
        vit_dims=(("vit_b", 96, 2, 3, (1,)),),
    )


class TestImageEncoder:
    def test_embedding_shape(self, tiny_cfg):
        params = image_encoder.vit_init(jax.random.PRNGKey(0), tiny_cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (256, 256, 3))
        emb = jax.jit(lambda p, x: image_encoder.vit_encode(p, x, tiny_cfg))(params, x)
        assert emb.shape == (16, 16, 256)
        assert np.isfinite(np.asarray(emb)).all()

    def test_interm_features(self, tiny_cfg):
        params = image_encoder.vit_init(jax.random.PRNGKey(0), tiny_cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (256, 256, 3))
        emb, interm = image_encoder.vit_encode(params, x, tiny_cfg, return_interm=True)
        assert len(interm) == 1 and interm[0].shape == (16, 16, 96)

    def test_rel_pos_interpolation(self):
        rel = jnp.arange(27, dtype=jnp.float32)[:, None] * jnp.ones((1, 4))
        out = image_encoder._get_rel_pos(7, 7, rel)   # 27 -> 13 entries
        assert out.shape == (7, 7, 4)
        # same-size fast path: q=k=14 needs exactly 27 entries, no resize
        out2 = image_encoder._get_rel_pos(14, 14, rel)
        assert out2.shape == (14, 14, 4)
        np.testing.assert_allclose(np.asarray(out2[0, 0]), np.asarray(rel[13]))

    @pytest.mark.parametrize("impl", ["xla", "xla_fused_bias"])
    def test_block_matches_pad_first_composition(self, impl):
        """_block on a non-window-multiple grid == the explicit pad-first
        composition (_window_partition + _attention + unpartition + MLP).

        Guards the block's windowed wiring. NOTE (2026-08-17 on-chip A/B):
        computing qkv/proj on the UNPADDED grid (pad q/k/v with the qkv
        bias, crop before proj; -27.6% qkv/proj FLOPs at rect shapes) was
        implemented, proven equivalent by this test, and REVERTED — encode
        standalone was a wash (75.3 vs 75.7 ms/frame; the pad-tensor writes
        eat the matmul savings) and the vmapped refine path regressed 22
        ms/frame (12.49 -> 11.12 fps end-to-end). RE-MEASURED 2026-08-19
        under the single-einsum fused-bias path (bias-free linears
        pre-partition, bias added post-partition): 40.6 -> 52.5 ms/frame
        standalone (exp_encode_ab, best of 5) — the three per-tensor
        window-major partitions (14-sublane-hostile transposes) cost more
        than the 27.6% projection-FLOP saving. Rejected twice; don't
        retry without a layout-level fix."""
        heads, c, window = 2, 16, 7
        h, w = 10, 12   # pads to 14x14 -> 4 windows
        key = jax.random.PRNGKey(0)
        p = {
            "norm1": {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            "attn": {
                "qkv": {
                    "weight": jax.random.normal(key, (c, 3 * c)) * 0.1,
                    "bias": jax.random.normal(jax.random.fold_in(key, 1), (3 * c,)),
                },
                "proj": {
                    "weight": jax.random.normal(jax.random.fold_in(key, 2), (c, c)) * 0.1,
                    "bias": jnp.zeros((c,)),
                },
                "rel_pos_h": jax.random.normal(jax.random.fold_in(key, 3), (2 * window - 1, c // heads)),
                "rel_pos_w": jax.random.normal(jax.random.fold_in(key, 4), (2 * window - 1, c // heads)),
            },
            "norm2": {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            "mlp": {
                "lin1": {"weight": jnp.eye(c, 4 * c), "bias": jnp.zeros((4 * c,))},
                "lin2": {"weight": jnp.eye(4 * c, c), "bias": jnp.zeros((c,))},
            },
        }
        x = jax.random.normal(jax.random.fold_in(key, 5), (2, h, w, c))

        got = image_encoder._block(x, p, heads, window, windowed_impl=impl)

        # pad-first order: zero-pad the normed tokens, qkv inside _attention
        from vosesam_tpu.models.layers import layer_norm, linear, gelu
        ln = layer_norm(x, p["norm1"])
        wins, pad_hw = image_encoder._window_partition(ln, window)
        att = image_encoder._attention(
            wins, p["attn"], heads, (window, window), windowed_impl=impl)
        att = image_encoder._window_unpartition(att, window, pad_hw, (h, w))
        ref = x + att
        y = layer_norm(ref, p["norm2"])
        ref = ref + linear(gelu(linear(y, p["mlp"]["lin1"])), p["mlp"]["lin2"])

        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gelu_fast_error_below_bf16_noise(self, tiny_cfg):
        """The encoder's tanh-gelu-in-bf16 (layers.gelu_fast) must not add
        error beyond what bf16 itself already costs: at the whole-encoder
        level, |bf16-tanh - fp32-erf| stays within a small factor of
        |bf16-erf - fp32-erf| (the representation error we already accept),
        and fp32 gelu_fast IS exact erf (bit-equal encoder output)."""
        from vosesam_tpu.models import layers

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.PRNGKey(1), (256, 256, 3))

        p32 = image_encoder.vit_init(key, tiny_cfg, dtype=jnp.float32)
        ref32 = np.asarray(
            image_encoder.vit_encode(p32, x, tiny_cfg), np.float32)

        # fp32 path: gelu_fast dispatches to exact erf -> bit-equal to a
        # monkeypatched always-erf encoder
        orig = image_encoder.gelu_fast
        try:
            image_encoder.gelu_fast = layers.gelu
            ref32_erf = np.asarray(
                image_encoder.vit_encode(p32, x, tiny_cfg), np.float32)
        finally:
            image_encoder.gelu_fast = orig
        np.testing.assert_array_equal(ref32, ref32_erf)

        p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p32)
        x16 = x.astype(jnp.bfloat16)
        out_tanh = np.asarray(
            image_encoder.vit_encode(p16, x16, tiny_cfg), np.float32)
        try:
            image_encoder.gelu_fast = layers.gelu
            out_erf = np.asarray(
                image_encoder.vit_encode(p16, x16, tiny_cfg), np.float32)
        finally:
            image_encoder.gelu_fast = orig

        err_repr = np.abs(out_erf - ref32).max()     # bf16 representation
        err_tanh = np.abs(out_tanh - ref32).max()    # bf16 + approximation
        assert err_tanh <= 2.0 * err_repr + 1e-6, (
            f"tanh-gelu error {err_tanh:.4g} exceeds 2x the bf16 "
            f"representation error {err_repr:.4g}")

    def test_window_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
        w, pad_hw = image_encoder._window_partition(x, 7)
        assert w.shape == (9, 7, 7, 4)    # 16 -> pad 21 -> 3x3 windows
        back = image_encoder._window_unpartition(w, 7, pad_hw, (16, 16))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))


class TestPromptEncoder:
    @pytest.fixture(scope="class")
    def params(self):
        return prompt_encoder.prompt_encoder_init(jax.random.PRNGKey(0), CFG)

    def test_point_labels(self, params):
        coords = jnp.array([[10.0, 20.0], [50.0, 60.0], [0.0, 0.0]])
        labels = jnp.array([1, 0, -1], jnp.int32)
        out = prompt_encoder.encode_points(params, coords, labels, CFG)
        assert out.shape == (3, 256)
        # padding point embeds exactly the not-a-point vector
        np.testing.assert_allclose(
            np.asarray(out[2]), np.asarray(params["not_a_point_embed"]["weight"][0]),
            rtol=1e-6,
        )

    def test_mask_prompt(self, params):
        m = jax.random.normal(jax.random.PRNGKey(1), (256, 256))
        out = prompt_encoder.encode_mask(params, m)
        assert out.shape == (64, 64, 256)

    def test_dense_pe_unit_norm_ish(self, params):
        pe = prompt_encoder.dense_pe(params, (16, 16))
        assert pe.shape == (16, 16, 256)
        # sin²+cos² structure: per-position squared norm == d/2
        n = np.asarray(jnp.sum(pe * pe, -1))
        np.testing.assert_allclose(n, 128.0, rtol=1e-4)


class TestMaskDecoder:
    def test_decode_shapes(self, tiny_cfg):
        dp = mask_decoder.mask_decoder_init(jax.random.PRNGKey(0), tiny_cfg)
        pp = prompt_encoder.prompt_encoder_init(jax.random.PRNGKey(1), tiny_cfg)
        emb = jax.random.normal(jax.random.PRNGKey(2), (16, 16, 256))
        pe = prompt_encoder.dense_pe(pp, (16, 16))
        sparse = jax.random.normal(jax.random.PRNGKey(3), (5, 256))
        dense = prompt_encoder.no_mask_dense(pp, (16, 16))
        masks, iou = jax.jit(
            lambda *a: mask_decoder.decode_masks(*a, tiny_cfg)
        )(dp, emb, pe, sparse, dense)
        assert masks.shape == (4, 64, 64)
        assert iou.shape == (4,)

    def test_hq_decode(self, tiny_hq_cfg):
        dp = mask_decoder.mask_decoder_init(jax.random.PRNGKey(0), tiny_hq_cfg)
        pp = prompt_encoder.prompt_encoder_init(jax.random.PRNGKey(1), tiny_hq_cfg)
        emb = jax.random.normal(jax.random.PRNGKey(2), (16, 16, 256))
        interm = jax.random.normal(jax.random.PRNGKey(4), (16, 16, 96))
        pe = prompt_encoder.dense_pe(pp, (16, 16))
        sparse = jax.random.normal(jax.random.PRNGKey(3), (5, 256))
        dense = prompt_encoder.no_mask_dense(pp, (16, 16))
        masks, iou = mask_decoder.decode_masks(
            dp, emb, pe, sparse, dense, tiny_hq_cfg, interm_vit=interm
        )
        assert masks.shape == (5, 64, 64)   # 4 SAM + 1 HQ token
        assert iou.shape == (5,)


class TestPredictorEndToEnd:
    def test_full_predict(self, tiny_cfg):
        params = predictor.sam_init(jax.random.PRNGKey(0), tiny_cfg)
        img = (np.random.default_rng(0).random((120, 180, 3)) * 255).astype(np.uint8)
        emb = jax.jit(
            lambda p, im: predictor.encode_image(p, im, tiny_cfg)
        )(params, jnp.array(img))
        assert emb.embedding.shape == (16, 16, 256)
        assert emb.input_hw == (171, 256)   # round(120*256/180)

        coords = jnp.array([[90.0, 60.0], [10.0, 10.0]])
        labels = jnp.array([1, -1], jnp.int32)
        pred = jax.jit(
            lambda p, e, c, l: predictor.predict(p, e, c, l, None, tiny_cfg)
        )(params, emb, coords, labels)
        assert pred.masks.shape == (4, 120, 180)
        assert pred.low_res.shape == (4, 64, 64)
        assert pred.iou.shape == (4,)
        m, lg, s, lr = predictor.select_best(pred, tiny_cfg, multimask=True)
        assert m.shape == (120, 180) and lr.shape == (64, 64)

    def test_mask_prompt_roundtrip(self, tiny_cfg):
        params = predictor.sam_init(jax.random.PRNGKey(0), tiny_cfg)
        img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
        emb = predictor.encode_image(params, jnp.array(img), tiny_cfg)
        coords = jnp.zeros((1, 2))
        labels = jnp.array([-1], jnp.int32)
        mask_in = jax.random.normal(jax.random.PRNGKey(5), (64, 64))
        pred = predictor.predict(params, emb, coords, labels, mask_in, tiny_cfg)
        assert np.isfinite(np.asarray(pred.logits_full)).all()
