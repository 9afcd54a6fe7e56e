import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.priors.clip_vision import (
    CLIPImageEmbedder,
    CLIPVision,
    convert_torch_clip_vision,
)


class TestCLIPVision:
    def test_tiny_forward(self):
        m = CLIPVision(embed_dim=64, depth=2, num_heads=2, patch_size=14,
                       image_size=56, projection_dim=32)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 56, 56, 3))
        params = m.init(jax.random.PRNGKey(1), x)
        proj, tokens = m.apply(params, x)
        assert proj.shape == (2, 32)
        assert tokens.shape == (2, 1 + 16, 64)

    def test_embedder_callable(self):
        m = CLIPVision(embed_dim=64, depth=2, num_heads=2, patch_size=14,
                       image_size=224, projection_dim=16)
        emb = CLIPImageEmbedder(m, n_tokens=4)
        img = np.random.RandomState(0).rand(48, 64, 3).astype(np.float32)
        ctx = emb(img)
        assert ctx.shape == (1, 4, 16)
        # Different images → different embeddings.
        ctx2 = emb(1.0 - img)
        assert float(jnp.abs(ctx - ctx2).max()) > 1e-6

    def test_default_towers_share_context_width(self):
        # The UNet context is prompt_embeds + image_embeds (pipeline_mvd_
        # warp_mix_classifier.py:681): ViT-H projection_dim must equal the
        # SD2.1 text width or the sum fails (budget-run regression:
        # "(1, 77, 1024) vs (1, 77, 768)").
        from g4splat_tpu.priors.clip_text import CLIPText
        from g4splat_tpu.priors.see3d import UNetConfig

        assert (CLIPVision().projection_dim == CLIPText().width
                == UNetConfig().context_dim == 1024)

    def test_torch_conversion(self):
        D, depth = 32, 2
        rng = np.random.RandomState(0)
        n0 = (56 // 14) ** 2 + 1
        state = {
            "vision_model.embeddings.patch_embedding.weight":
                rng.randn(D, 3, 14, 14) * 0.02,
            "vision_model.embeddings.class_embedding": rng.randn(D) * 0.02,
            "vision_model.embeddings.position_embedding.weight":
                rng.randn(n0, D) * 0.02,
            "vision_model.pre_layrnorm.weight": np.ones(D),
            "vision_model.pre_layrnorm.bias": np.zeros(D),
            "vision_model.post_layernorm.weight": np.ones(D),
            "vision_model.post_layernorm.bias": np.zeros(D),
            "visual_projection.weight": rng.randn(16, D) * 0.02,
        }
        for i in range(depth):
            b = f"vision_model.encoder.layers.{i}."
            for nm, shape in [
                ("self_attn.q_proj", (D, D)), ("self_attn.k_proj", (D, D)),
                ("self_attn.v_proj", (D, D)), ("self_attn.out_proj", (D, D)),
                ("mlp.fc1", (4 * D, D)), ("mlp.fc2", (D, 4 * D)),
            ]:
                state[b + nm + ".weight"] = rng.randn(*shape) * 0.02
                state[b + nm + ".bias"] = np.zeros(shape[0])
            state[b + "layer_norm1.weight"] = np.ones(D)
            state[b + "layer_norm1.bias"] = np.zeros(D)
            state[b + "layer_norm2.weight"] = np.ones(D)
            state[b + "layer_norm2.bias"] = np.zeros(D)
        params = convert_torch_clip_vision(state, depth=depth)
        m = CLIPVision(embed_dim=D, depth=depth, num_heads=2, patch_size=14,
                       image_size=56, projection_dim=16)
        proj, _ = m.apply(params, jnp.zeros((1, 56, 56, 3)))
        assert proj.shape == (1, 16)
        assert np.isfinite(np.asarray(proj)).all()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
