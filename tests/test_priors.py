import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.priors.depth_anything import (
    DepthAnything,
    DepthAnythingV2,
    convert_torch_checkpoint,
)
from g4splat_tpu.priors.dinov2 import DINOv2, convert_torch_dinov2
from g4splat_tpu.priors.dpt import resize_bilinear_ac
from g4splat_tpu.priors.vit import (
    Attention,
    Block,
    DecoderBlock,
    apply_rope_2d,
    grid_positions,
)


class TestViTBlocks:
    def test_block_shapes(self):
        blk = Block(num_heads=4)
        x = jnp.zeros((2, 10, 64))
        params = blk.init(jax.random.PRNGKey(0), x)
        y = blk.apply(params, x)
        assert y.shape == x.shape

    def test_rope_preserves_norm(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 12, 32))
        pos = grid_positions(2, 3, 4)
        y = apply_rope_2d(x, pos)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(x), axis=-1),
            np.linalg.norm(np.asarray(y), axis=-1),
            rtol=1e-5,
        )

    def test_rope_relative_invariance(self):
        # Attention scores under RoPE depend only on relative positions.
        q = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, 16))
        k = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 1, 16))
        def score(py, px, ky, kx):
            qq = apply_rope_2d(q, jnp.array([[[py, px]]]))
            kk = apply_rope_2d(k, jnp.array([[[ky, kx]]]))
            return float(jnp.sum(qq * kk))
        s1 = score(0, 0, 2, 3)
        s2 = score(5, 7, 7, 10)  # same relative offset (2, 3)
        assert s1 == pytest.approx(s2, abs=1e-4)

    def test_decoder_block(self):
        blk = DecoderBlock(num_heads=4, use_rope=True)
        x = jnp.zeros((2, 12, 64))
        ctx = jnp.zeros((2, 20, 64))
        pos = grid_positions(2, 3, 4)
        cpos = grid_positions(2, 4, 5)
        params = blk.init(jax.random.PRNGKey(0), x, ctx, pos, cpos)
        y = blk.apply(params, x, ctx, pos, cpos)
        assert y.shape == x.shape


class TestDINOv2:
    def test_tiny_forward(self):
        m = DINOv2(embed_dim=64, depth=4, num_heads=4, patch_size=14)
        x = jnp.zeros((1, 56, 56, 3))
        params = m.init(jax.random.PRNGKey(0), x, out_indices=(1, 3))
        outs, grid = m.apply(params, x, out_indices=(1, 3))
        assert grid == (4, 4)
        assert len(outs) == 2
        patches, cls = outs[0]
        assert patches.shape == (1, 16, 64)
        assert cls.shape == (1, 64)

    def test_torch_conversion_runs(self):
        # Synthesize a torch-format state dict for a tiny model and convert.
        D, depth, heads = 32, 2, 2
        rng = np.random.RandomState(0)
        state = {
            "patch_embed.proj.weight": rng.randn(D, 3, 14, 14) * 0.02,
            "patch_embed.proj.bias": np.zeros(D),
            "cls_token": rng.randn(1, 1, D) * 0.02,
            "pos_embed": rng.randn(1, 37 * 37 + 1, D) * 0.02,
            "norm.weight": np.ones(D), "norm.bias": np.zeros(D),
        }
        for i in range(depth):
            pre = f"blocks.{i}."
            state.update({
                pre + "norm1.weight": np.ones(D), pre + "norm1.bias": np.zeros(D),
                pre + "norm2.weight": np.ones(D), pre + "norm2.bias": np.zeros(D),
                pre + "attn.qkv.weight": rng.randn(3 * D, D) * 0.02,
                pre + "attn.qkv.bias": np.zeros(3 * D),
                pre + "attn.proj.weight": rng.randn(D, D) * 0.02,
                pre + "attn.proj.bias": np.zeros(D),
                pre + "mlp.fc1.weight": rng.randn(4 * D, D) * 0.02,
                pre + "mlp.fc1.bias": np.zeros(4 * D),
                pre + "mlp.fc2.weight": rng.randn(D, 4 * D) * 0.02,
                pre + "mlp.fc2.bias": np.zeros(D),
                pre + "ls1.gamma": np.full(D, 1e-5),
                pre + "ls2.gamma": np.full(D, 1e-5),
            })
        params = convert_torch_dinov2(state, depth=depth)
        m = DINOv2(embed_dim=D, depth=depth, num_heads=heads)
        x = jnp.zeros((1, 28, 28, 3))
        outs, grid = m.apply(params, x, out_indices=(0, 1))
        assert outs[0][0].shape == (1, 4, D)


class TestDPT:
    def test_resize_align_corners_exact(self):
        # align_corners: corners map to corners exactly.
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        y = resize_bilinear_ac(x, (7, 7))
        assert float(y[0, 0, 0, 0]) == 0.0
        assert float(y[0, -1, -1, 0]) == 15.0
        assert float(y[0, 0, -1, 0]) == 3.0

    @pytest.mark.slow
    def test_depth_anything_tiny_e2e(self):
        # Full model with ViT-S config on a small input: shapes + positivity.
        model = DepthAnything(encoder="vits", input_size=56)
        img = np.random.RandomState(0).rand(60, 80, 3).astype(np.float32)
        disp = model.infer_image(img)
        assert disp.shape == (60, 80)
        assert np.all(disp >= 0)
        assert np.isfinite(disp).all()

    @pytest.mark.slow
    def test_infer_images_matches_per_view(self):
        # Batched path == per-image path (same resize/normalize/head math;
        # the ViT has no cross-batch coupling).
        model = DepthAnything(encoder="vits", input_size=56)
        imgs = np.random.RandomState(1).rand(3, 60, 80, 3).astype(np.float32)
        batched = model.infer_images(imgs)
        assert batched.shape == (3, 60, 80)
        for v in range(3):
            single = model.infer_image(imgs[v])
            np.testing.assert_allclose(batched[v], single, atol=1e-5)
        # Slab chunking (dense-view memory bound) is value-identical.
        slabbed = model.infer_images(imgs, max_batch=2)
        np.testing.assert_allclose(slabbed, batched, atol=1e-5)

    @pytest.mark.slow
    def test_infer_images_sharded_mesh(self):
        # View axis sharded over the (virtual) device mesh; values match the
        # unsharded batch. V=3 with 2+ devices exercises the pad path.
        import jax as _jax

        from g4splat_tpu.parallel.mesh import make_mesh

        if len(_jax.devices()) < 2:
            pytest.skip("needs a multi-device mesh")
        model = DepthAnything(encoder="vits", input_size=56)
        imgs = np.random.RandomState(2).rand(3, 60, 80, 3).astype(np.float32)
        base = model.infer_images(imgs)
        sharded = model.infer_images(imgs, mesh=make_mesh(n_data=2))
        np.testing.assert_allclose(sharded, base, atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
