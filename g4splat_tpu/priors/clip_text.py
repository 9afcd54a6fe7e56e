"""CLIP text encoder (flax) — See3D's prompt-conditioning tower.

The reference UNet context is ``prompt_embeds + image_embeds``: the CLIP
text encoder's last hidden state over 77 tokens plus 0.2× the projected CLIP
image class embedding broadcast over those tokens
(2d-gaussian-splatting/guidance/See3D_modules/
pipeline_mvd_warp_mix_classifier.py:308-316,463-464,681). In production the
prompt is always the EMPTY string (guidance/see3d_util.py:44), whose token
sequence needs no BPE machinery: [BOS, EOS, pad, pad, …]. Arbitrary prompts
are supported through precomputed token ids (the tokenizer's vocab/merges are
a deployment artifact like the weights themselves).

`convert_torch_clip_text` maps a huggingface CLIPTextModel state dict
(either the SD1.x CLIP ViT-L tower, hidden 768 / quick_gelu / pad 49407, or
the SD2.x OpenCLIP ViT-H tower, hidden 1024 / gelu / pad 0); random init
keeps the conditioning path exercisable offline.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BOS_ID = 49406
EOS_ID = 49407


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _CausalAttention(nn.Module):
    num_heads: int

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        qkv = nn.Dense(3 * C, name="qkv")(x).reshape(
            B, N, 3, self.num_heads, C // self.num_heads)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(
            C // self.num_heads)
        mask = jnp.tril(jnp.ones((N, N), bool))
        att = jnp.where(mask, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(B, N, C)
        return nn.Dense(C, name="proj")(out)


class _TextBlock(nn.Module):
    num_heads: int
    act: str = "gelu"

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = x + _CausalAttention(self.num_heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
        h = nn.Dense(4 * C, name="fc1")(nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        h = quick_gelu(h) if self.act == "quick_gelu" else jax.nn.gelu(
            h, approximate=False)
        return x + nn.Dense(C, name="fc2")(h)


class CLIPText(nn.Module):
    vocab_size: int = 49408
    width: int = 1024             # SD2.x OpenCLIP ViT-H tower
    depth: int = 23               # SD2.1 pipelines read hidden layer 23
    num_heads: int = 16
    n_ctx: int = 77               # prompt length fed to the UNet context
    max_positions: int = 0        # positional table size (0 → n_ctx); set
                                  # to the checkpoint's
                                  # max_position_embeddings when converting
    act: str = "gelu"             # SD1.x CLIP ViT-L uses "quick_gelu"

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        """ids: (B, n_ctx) int32 token ids → last hidden state
        (B, n_ctx, width) after the final LayerNorm — exactly
        ``text_encoder(ids)[0]`` (pipeline…classifier.py:308-312)."""
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.01),
            (self.max_positions or self.n_ctx, self.width))
        x = tok[ids] + pos[None, : ids.shape[1]]
        for i in range(self.depth):
            x = _TextBlock(self.num_heads, self.act, name=f"blocks_{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, name="final_ln")(x)


def empty_prompt_ids(n_ctx: int = 77, pad_id: int = 0) -> np.ndarray:
    """Token ids of the empty prompt: [BOS, EOS, pad…]. SD2.x OpenCLIP
    checkpoints pad with 0 (``!``); SD1.x CLIP pads with EOS (49407)."""
    ids = np.full((1, n_ctx), pad_id, np.int32)
    ids[0, 0] = BOS_ID
    ids[0, 1] = EOS_ID
    return ids


class CLIPTextEmbedder:
    """Callable for Priors.text_embedder: () or (ids) → (1, n_ctx, width)
    prompt embedding. With no argument it returns the (cached) empty-prompt
    embedding — the reference's production prompt (see3d_util.py:44)."""

    def __init__(self, model: Optional[CLIPText] = None, params=None,
                 seed: int = 0, pad_id: int = 0):
        self.model = model or CLIPText()
        if params is None:
            dummy = jnp.zeros((1, self.model.n_ctx), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(seed), dummy)
        self.params = params
        self.pad_id = pad_id
        self._apply = jax.jit(self.model.apply)
        self._empty = None

    def __call__(self, ids: Optional[np.ndarray] = None) -> jnp.ndarray:
        if ids is None:
            if self._empty is None:
                self._empty = self._apply(
                    self.params,
                    jnp.asarray(empty_prompt_ids(self.model.n_ctx,
                                                 self.pad_id)))
            return self._empty
        return self._apply(self.params, jnp.asarray(ids, jnp.int32))


def convert_torch_clip_text(state: Dict, depth: int = 23) -> Dict:
    """huggingface CLIPTextModel state dict → flax params.

    `depth` counts the TRANSFORMER LAYERS KEPT: SD2.x reads the
    penultimate hidden state (23 of 24 layers, with the final_ln applied on
    top, per diffusers' `text_encoder` config); pass the checkpoint's full
    layer count to keep every layer.
    """
    pre = "text_model."
    p = {
        "token_embedding": np.asarray(
            state[pre + "embeddings.token_embedding.weight"]),
        "pos_embed": np.asarray(
            state[pre + "embeddings.position_embedding.weight"]),
        "final_ln": {
            "scale": np.asarray(state[pre + "final_layer_norm.weight"]),
            "bias": np.asarray(state[pre + "final_layer_norm.bias"]),
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
            "fc1": {"kernel": np.asarray(state[b + "mlp.fc1.weight"]).T,
                    "bias": np.asarray(state[b + "mlp.fc1.bias"])},
            "fc2": {"kernel": np.asarray(state[b + "mlp.fc2.weight"]).T,
                    "bias": np.asarray(state[b + "mlp.fc2.bias"])},
        }
    return {"params": p}
