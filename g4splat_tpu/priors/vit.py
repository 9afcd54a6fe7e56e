"""Shared Vision-Transformer building blocks (flax.linen).

One block library serves every prior network the pipeline needs:
- DINOv2 ViT-L (DepthAnythingV2 backbone) — LayerScale, patch 14
- CroCo/DUSt3R/MASt3R encoder–decoder ViTs — 2D RoPE attention, cross blocks
  (replacing the reference's curope CUDA kernel with plain jnp rotations;
  mast3r/dust3r/croco/models/blocks.py + curope/)
- SAM ViT-H image encoder (windowed attention variant added where needed)

Everything is batched, jit-friendly, bf16-capable; attention uses
jax.nn.dot_product_attention (XLA fused/flash path on TPU).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def gelu_exact(x):
    """Erf-based GELU — torch nn.GELU's default. flax nn.gelu defaults to the
    tanh approximation, which costs ~1e-3 output error vs converted torch
    checkpoints; every prior net here uses the exact form."""
    return nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    hidden: int
    out: Optional[int] = None
    act: Callable = gelu_exact

    @nn.compact
    def __call__(self, x):
        out = self.out or x.shape[-1]
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(out, name="fc2")(x)
        return x


def make_2d_rope_freqs(dim: int, base: float = 100.0):
    """Per-axis inverse frequencies for 2D RoPE (croco curope semantics:
    half the head dim rotates with y, half with x)."""
    d4 = dim // 4
    return 1.0 / (base ** (jnp.arange(0, d4, dtype=jnp.float32) / d4))


def apply_rope_2d(x: jnp.ndarray, positions: jnp.ndarray, base: float = 100.0):
    """x: (B, H, N, D) heads-first; positions: (B, N, 2) integer (y, x).

    First half of D rotates by y-angle, second half by x-angle (croco
    models/curope/kernels.cu behavior; fallback pos_embed.py RoPE2D).
    """
    B, Hh, N, D = x.shape
    freqs = make_2d_rope_freqs(D, base)          # (D/4,)
    y = positions[..., 0].astype(jnp.float32)    # (B, N)
    xpos = positions[..., 1].astype(jnp.float32)

    def rot(v, angles):
        # v: (B, H, N, d) with d even; angles: (B, N, d/2)
        cos = jnp.cos(angles)[:, None]           # (B, 1, N, d/2)
        sin = jnp.sin(angles)[:, None]
        v1, v2 = jnp.split(v, 2, axis=-1)
        return jnp.concatenate([v1 * cos - v2 * sin, v2 * cos + v1 * sin], -1)

    ay = y[..., None] * freqs                     # (B, N, D/4)
    ax = xpos[..., None] * freqs
    xy, xx = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([rot(xy, ay), rot(xx, ax)], axis=-1)


class Attention(nn.Module):
    num_heads: int
    qkv_bias: bool = True
    use_rope: bool = False
    rope_base: float = 100.0

    @nn.compact
    def __call__(self, x, positions=None):
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = [
            jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)
        ]  # (B, H, N, hd)
        if self.use_rope:
            assert positions is not None
            q = apply_rope_2d(q, positions, self.rope_base)
            k = apply_rope_2d(k, positions, self.rope_base)
        out = jax.nn.dot_product_attention(
            jnp.moveaxis(q, 1, 2), jnp.moveaxis(k, 1, 2), jnp.moveaxis(v, 1, 2)
        )  # (B, N, H, hd)
        out = out.reshape(B, N, C)
        return nn.Dense(C, name="proj")(out)


class CrossAttention(nn.Module):
    num_heads: int
    qkv_bias: bool = True
    use_rope: bool = False
    rope_base: float = 100.0

    @nn.compact
    def __call__(self, x, context, positions=None, context_positions=None):
        B, N, C = x.shape
        M = context.shape[1]
        hd = C // self.num_heads
        q = nn.Dense(C, use_bias=self.qkv_bias, name="projq")(x)
        k = nn.Dense(C, use_bias=self.qkv_bias, name="projk")(context)
        v = nn.Dense(C, use_bias=self.qkv_bias, name="projv")(context)
        q = q.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, M, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, M, self.num_heads, hd).transpose(0, 2, 1, 3)
        if self.use_rope:
            q = apply_rope_2d(q, positions, self.rope_base)
            k = apply_rope_2d(k, context_positions, self.rope_base)
        out = jax.nn.dot_product_attention(
            jnp.moveaxis(q, 1, 2), jnp.moveaxis(k, 1, 2), jnp.moveaxis(v, 1, 2)
        )
        out = out.reshape(B, N, C)
        return nn.Dense(C, name="proj")(out)


class LayerScale(nn.Module):
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", lambda k, s: jnp.full(s, self.init_value), (x.shape[-1],)
        )
        return x * gamma


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rope: bool = False
    rope_base: float = 100.0
    layerscale: Optional[float] = None

    @nn.compact
    def __call__(self, x, positions=None):
        C = x.shape[-1]
        h = Attention(
            self.num_heads, self.qkv_bias, self.use_rope, self.rope_base,
            name="attn",
        )(nn.LayerNorm(name="norm1")(x), positions)
        if self.layerscale is not None:
            h = LayerScale(self.layerscale, name="ls1")(h)
        x = x + h
        h = Mlp(int(C * self.mlp_ratio), name="mlp")(nn.LayerNorm(name="norm2")(x))
        if self.layerscale is not None:
            h = LayerScale(self.layerscale, name="ls2")(h)
        return x + h


class DecoderBlock(nn.Module):
    """CroCo decoder block: self-attn → cross-attn to the other view → MLP
    (croco/models/blocks.py DecoderBlock)."""
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rope: bool = False
    rope_base: float = 100.0
    norm_mem: bool = True

    @nn.compact
    def __call__(self, x, context, positions=None, context_positions=None):
        C = x.shape[-1]
        x = x + Attention(
            self.num_heads, self.qkv_bias, self.use_rope, self.rope_base,
            name="attn",
        )(nn.LayerNorm(name="norm1")(x), positions)
        ctx = nn.LayerNorm(name="norm_y")(context) if self.norm_mem else context
        x = x + CrossAttention(
            self.num_heads, self.qkv_bias, self.use_rope, self.rope_base,
            name="cross_attn",
        )(nn.LayerNorm(name="norm2")(x), ctx, positions, context_positions)
        x = x + Mlp(int(C * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(name="norm3")(x)
        )
        return x


class PatchEmbed(nn.Module):
    patch_size: int
    embed_dim: int

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) → (B, N, C), plus (gh, gw)."""
        B, H, W, _ = x.shape
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID", name="proj"
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        return x.reshape(B, gh * gw, self.embed_dim), (gh, gw)


def grid_positions(b: int, gh: int, gw: int) -> jnp.ndarray:
    """(B, gh·gw, 2) integer (y, x) token positions for RoPE."""
    ys, xs = jnp.meshgrid(jnp.arange(gh), jnp.arange(gw), indexing="ij")
    pos = jnp.stack([ys, xs], axis=-1).reshape(-1, 2)
    return jnp.broadcast_to(pos[None], (b, gh * gw, 2))


def interpolate_pos_embed(pos: jnp.ndarray, gh: int, gw: int,
                          src_g: Optional[int] = None) -> jnp.ndarray:
    """Bicubic-ish (we use bilinear) grid resize of learned position
    embeddings (N0, C) laid out on a src square grid → (gh·gw, C)."""
    n0, c = pos.shape
    g0 = src_g or int(round(np.sqrt(n0)))
    grid = pos.reshape(g0, g0, c)
    out = jax.image.resize(grid, (gh, gw, c), method="bilinear")
    return out.reshape(gh * gw, c)
