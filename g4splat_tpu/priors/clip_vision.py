"""CLIP vision encoder (flax) — See3D's image-conditioning tower.

The reference conditions its MVDream-style UNet on CLIP image embeddings
from ``CLIP-ViT-H-14-laion2B-s32B-b79K`` (See3D_modules/mv_diffusion.py:35
loads ``CLIPVisionModelWithProjection``): embed 1280, 32 layers, 16 heads,
projection_dim 1024 — the projection width deliberately matches the SD2.1
OpenCLIP text tower's 1024 so ``prompt_embeds + image_embeds`` is a plain
sum (pipeline_mvd_warp_mix_classifier.py:681). This is the standard CLIP
ViT: conv patch embed + class token + learned positions, pre-LN
transformer, final LN, linear projection. The UNet cross-attends to the
projected class token (and optionally the patch tokens).

`convert_torch_clip_vision` maps a huggingface CLIPVisionModel state dict;
random init keeps the conditioning path exercisable offline.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from g4splat_tpu.priors.vit import Block

_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVision(nn.Module):
    embed_dim: int = 1280         # OpenCLIP ViT-H/14 (mv_diffusion.py:35)
    depth: int = 32
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    projection_dim: int = 1024    # == SD2.1 text width, so ctx sums cleanly

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, H, W, 3) CLIP-normalized → (cls_proj (B, P),
        tokens (B, 1+N, C))."""
        B = x.shape[0]
        p = self.patch_size
        h = nn.Conv(self.embed_dim, (p, p), strides=(p, p), use_bias=False,
                    name="patch_embed")(x)
        gh, gw = h.shape[1], h.shape[2]
        h = h.reshape(B, gh * gw, self.embed_dim)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.embed_dim,))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, self.embed_dim)), h], axis=1
        )
        n0 = (self.image_size // p) ** 2 + 1
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (n0, self.embed_dim))
        if h.shape[1] != n0:
            from g4splat_tpu.priors.vit import interpolate_pos_embed

            patch_pos = interpolate_pos_embed(pos[1:], gh, gw)
            pos_used = jnp.concatenate([pos[:1], patch_pos], axis=0)
        else:
            pos_used = pos
        h = h + pos_used[None]
        h = nn.LayerNorm(name="pre_ln")(h)
        for i in range(self.depth):
            h = Block(self.num_heads, 4.0, qkv_bias=True,
                      name=f"blocks_{i}")(h)
        h = nn.LayerNorm(name="post_ln")(h)
        cls_out = h[:, 0]
        proj = nn.Dense(self.projection_dim, use_bias=False,
                        name="visual_projection")(cls_out)
        return proj, h


class CLIPImageEmbedder:
    """Callable for Priors.image_embedder: (H, W, 3) [0,1] image →
    (1, M, context_dim) conditioning tokens for the MV UNet.

    Matches the reference's image conditioning exactly: 0.2× the projected
    class embedding repeated over the 77 prompt-token positions, to be
    summed with the prompt embedding
    (pipeline_mvd_warp_mix_classifier.py:463-464,681)."""

    def __init__(self, model: Optional[CLIPVision] = None, params=None,
                 seed: int = 0, n_tokens: int = 77, scale: float = 0.2):
        self.model = model or CLIPVision()
        self.n_tokens = n_tokens
        self.scale = scale
        if params is None:
            dummy = jnp.zeros((1, 224, 224, 3))
            params = self.model.init(jax.random.PRNGKey(seed), dummy)
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def __call__(self, image: np.ndarray) -> jnp.ndarray:
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        x = jax.image.resize(jnp.asarray(img), (224, 224, 3), "bilinear")
        x = (x - _MEAN) / _STD
        proj, _ = self._apply(self.params, x[None])
        return self.scale * jnp.tile(proj[:, None, :], (1, self.n_tokens, 1))


def convert_torch_clip_vision(state: Dict,
                              depth: Optional[int] = None) -> Dict:
    """huggingface CLIPVisionModel(+projection) state dict → flax params.

    ``depth`` defaults to the layer count present in the state dict (the
    vision tower, unlike the SD2.x text tower, is consumed in full)."""
    pre = "vision_model."
    if depth is None:
        depth = 1 + max(
            int(k.split(".")[3]) for k in state
            if k.startswith(pre + "encoder.layers."))
    p = {
        "patch_embed": {
            "kernel": np.asarray(
                state[pre + "embeddings.patch_embedding.weight"]
            ).transpose(2, 3, 1, 0),
        },
        "class_embedding": np.asarray(
            state[pre + "embeddings.class_embedding"]
        ).reshape(-1),
        "pos_embed": np.asarray(
            state[pre + "embeddings.position_embedding.weight"]
        ),
        "pre_ln": {
            "scale": np.asarray(state[pre + "pre_layrnorm.weight"]),
            "bias": np.asarray(state[pre + "pre_layrnorm.bias"]),
        },
        "post_ln": {
            "scale": np.asarray(state[pre + "post_layernorm.weight"]),
            "bias": np.asarray(state[pre + "post_layernorm.bias"]),
        },
        "visual_projection": {
            "kernel": np.asarray(state["visual_projection.weight"]).T,
        },
    }
    for i in range(depth):
        b = pre + f"encoder.layers.{i}."
        q = np.asarray(state[b + "self_attn.q_proj.weight"])
        k = np.asarray(state[b + "self_attn.k_proj.weight"])
        v = np.asarray(state[b + "self_attn.v_proj.weight"])
        qb = np.asarray(state[b + "self_attn.q_proj.bias"])
        kb = np.asarray(state[b + "self_attn.k_proj.bias"])
        vb = np.asarray(state[b + "self_attn.v_proj.bias"])
        p[f"blocks_{i}"] = {
            "norm1": {"scale": np.asarray(state[b + "layer_norm1.weight"]),
                      "bias": np.asarray(state[b + "layer_norm1.bias"])},
            "norm2": {"scale": np.asarray(state[b + "layer_norm2.weight"]),
                      "bias": np.asarray(state[b + "layer_norm2.bias"])},
            "attn": {
                "qkv": {"kernel": np.concatenate([q, k, v], 0).T,
                        "bias": np.concatenate([qb, kb, vb], 0)},
                "proj": {
                    "kernel": np.asarray(
                        state[b + "self_attn.out_proj.weight"]).T,
                    "bias": np.asarray(state[b + "self_attn.out_proj.bias"]),
                },
            },
            "mlp": {
                "fc1": {"kernel": np.asarray(state[b + "mlp.fc1.weight"]).T,
                        "bias": np.asarray(state[b + "mlp.fc1.bias"])},
                "fc2": {"kernel": np.asarray(state[b + "mlp.fc2.weight"]).T,
                        "bias": np.asarray(state[b + "mlp.fc2.bias"])},
            },
        }
    return {"params": p}
