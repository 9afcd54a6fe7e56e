"""See3D multi-view diffusion inpainting (flax).

Re-build of the reference's See3D stack (guidance/See3D_modules/):
- `MultiViewUNet`  — SD-style UNet whose transformer self-attention runs over
  the tokens of ALL frames jointly ("3D attention": (b·f, l, c) →
  (b, f·l, c), mv_unet.py:229-333) and cross-attends to an image-conditioning
  embedding; ResBlocks with timestep embedding, channel-mult pyramid,
  zero-initialized output projections (mv_unet.py:614-1003).
- `DDIMSampler`    — 50-step DDIM with classifier-free guidance 2.0
  (mv_diffusion.py:54-76).
- `warp_mix_inpaint` — the warp-conditioned inpainting loop of
  pipeline_mvd_warp_mix_classifier.py: at every denoising step the latent is
  re-mixed with the noised encoding of the warped render inside the visible
  mask, so generation only fills the holes.

xformers memory-efficient attention becomes jax.nn.dot_product_attention
(XLA flash path). Pretrained MVD weights are a deployment artifact; tiny
configs keep the whole stack exercisable end-to-end in tests.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn

from g4splat_tpu.priors.vit import gelu_exact
import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ building
def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class GEGLU(nn.Module):
    out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(2 * self.out, name="proj")(x)
        a, b = jnp.split(h, 2, axis=-1)
        return a * gelu_exact(b)


class CrossAttention(nn.Module):
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)
        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, M, self.heads, self.dim_head)
        v = v.reshape(B, M, self.heads, self.dim_head)
        out = jax.nn.dot_product_attention(q, k, v).reshape(B, N, inner)
        return nn.Dense(x.shape[-1], name="to_out")(out)


class BasicTransformerBlock3D(nn.Module):
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, context, num_frames: int):
        # Self-attention across all frames jointly (mv_unet.py:266-272).
        bf, l, c = x.shape
        b = bf // num_frames
        h = x.reshape(b, num_frames * l, c)
        h = CrossAttention(self.heads, self.dim_head, name="attn1")(
            nn.LayerNorm(name="norm1")(h)
        )
        x = x + h.reshape(bf, l, c)
        x = x + CrossAttention(self.heads, self.dim_head, name="attn2")(
            nn.LayerNorm(name="norm2")(x), context
        )
        h = nn.LayerNorm(name="norm3")(x)
        h = GEGLU(4 * c, name="ff_geglu")(h)
        x = x + nn.Dense(c, name="ff_out")(h)
        return x


class SpatialTransformer3D(nn.Module):
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, context, num_frames: int):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=min(32, C), epsilon=1e-6, name="norm")(x)
        h = h.reshape(B, H * W, C)
        h = nn.Dense(C, name="proj_in")(h)
        h = BasicTransformerBlock3D(self.heads, self.dim_head, name="block")(
            h, context, num_frames
        )
        h = nn.Dense(C, kernel_init=nn.initializers.zeros, name="proj_out")(h)
        return x + h.reshape(B, H, W, C)


class ResBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, emb):
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), name="in_norm")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="in_conv")(h)
        e = nn.Dense(self.out_ch, name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :]
        h = nn.GroupNorm(num_groups=min(32, self.out_ch), name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros, name="out_conv")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="skip")(x)
        return x + h


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 8          # 4 latent + 4 warp-latent condition
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_levels: Tuple[int, ...] = (0, 1, 2)
    num_heads: int = 8
    context_dim: int = 1024


TINY_UNET = UNetConfig(
    in_channels=8, out_channels=4, model_channels=32,
    channel_mult=(1, 2), num_res_blocks=1, attention_levels=(0, 1),
    num_heads=2, context_dim=16,
)


class MultiViewUNet(nn.Module):
    cfg: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, x, t, context, num_frames: int):
        """x: (B·F, h, w, in_ch) latents; t: (B·F,) timesteps; context:
        (B·F, M, context_dim) conditioning tokens."""
        cfg = self.cfg
        temb = timestep_embedding(t, cfg.model_channels)
        emb = nn.Dense(4 * cfg.model_channels, name="time_embed_0")(temb)
        emb = nn.Dense(4 * cfg.model_channels, name="time_embed_2")(
            nn.silu(emb)
        )

        hs = []
        h = nn.Conv(cfg.model_channels, (3, 3), padding=1, name="conv_in")(x)
        hs.append(h)
        # Down path.
        for level, mult in enumerate(cfg.channel_mult):
            ch = cfg.model_channels * mult
            for r in range(cfg.num_res_blocks):
                h = ResBlock(ch, name=f"down_{level}_res_{r}")(h, emb)
                if level in cfg.attention_levels:
                    h = SpatialTransformer3D(
                        cfg.num_heads, ch // cfg.num_heads,
                        name=f"down_{level}_attn_{r}",
                    )(h, context, num_frames)
                hs.append(h)
            if level < len(cfg.channel_mult) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                            name=f"down_{level}_downsample")(h)
                hs.append(h)

        # Middle.
        ch = cfg.model_channels * cfg.channel_mult[-1]
        h = ResBlock(ch, name="mid_res_0")(h, emb)
        h = SpatialTransformer3D(cfg.num_heads, ch // cfg.num_heads,
                                 name="mid_attn")(h, context, num_frames)
        h = ResBlock(ch, name="mid_res_1")(h, emb)

        # Up path.
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            ch = cfg.model_channels * mult
            for r in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(ch, name=f"up_{level}_res_{r}")(h, emb)
                if level in cfg.attention_levels:
                    h = SpatialTransformer3D(
                        cfg.num_heads, ch // cfg.num_heads,
                        name=f"up_{level}_attn_{r}",
                    )(h, context, num_frames)
            if level > 0:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, 2 * H, 2 * W, C), "nearest")
                h = nn.Conv(C, (3, 3), padding=1,
                            name=f"up_{level}_upsample")(h)

        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), name="out_norm")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros, name="out_conv")(h)


# --------------------------------------------------------------------- DDIM
@dataclass
class DDIMConfig:
    num_train_timesteps: int = 1000
    num_steps: int = 50
    guidance_scale: float = 2.0
    beta_start: float = 0.00085
    beta_end: float = 0.012


class DDIMSampler:
    """Scaled-linear-β DDIM (diffusers DDIMScheduler semantics)."""

    def __init__(self, cfg: DDIMConfig = DDIMConfig()):
        self.cfg = cfg
        betas = np.linspace(
            cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
            cfg.num_train_timesteps,
        ) ** 2
        self.alphas_cumprod = jnp.asarray(
            np.cumprod(1.0 - betas), jnp.float32
        )
        step = cfg.num_train_timesteps // cfg.num_steps
        self.timesteps = np.arange(0, cfg.num_train_timesteps, step)[::-1].copy()

    def add_noise(self, x0, noise, t):
        a = self.alphas_cumprod[t]
        while a.ndim < x0.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * noise

    def step(self, eps, t: int, t_prev: int, x):
        a_t = self.alphas_cumprod[t]
        a_prev = self.alphas_cumprod[t_prev] if t_prev >= 0 else jnp.asarray(1.0)
        x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps


# ----------------------------------------------------------------- pipeline
class See3DPipeline:
    """Warp-conditioned multi-view inpainting
    (pipeline_mvd_warp_mix_classifier.py semantics)."""

    def __init__(self, unet: MultiViewUNet, unet_params,
                 ddim: DDIMConfig = DDIMConfig()):
        self.unet = unet
        self.params = unet_params
        self.sampler = DDIMSampler(ddim)
        self._apply = jax.jit(unet.apply, static_argnames=("num_frames",))

    def inpaint_latents(
        self,
        key: jax.Array,
        warp_latents: jnp.ndarray,   # (F, h, w, 4) encoded warped renders
        masks: jnp.ndarray,          # (F, h, w, 1) 1 = visible (keep)
        context: jnp.ndarray,        # (F, M, context_dim) image conditioning
        null_context: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Returns denoised latents (F, h, w, 4)."""
        F = warp_latents.shape[0]
        cfg = self.sampler.cfg
        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, warp_latents.shape)
        if null_context is None:
            null_context = jnp.zeros_like(context)

        ts = self.sampler.timesteps
        for i, t in enumerate(ts):
            t_prev = ts[i + 1] if i + 1 < len(ts) else -1
            key, kn = jax.random.split(key)
            # Mix: visible regions follow the (noised) warp latents
            # (inpainting re-injection each step).
            noised_warp = self.sampler.add_noise(
                warp_latents, jax.random.normal(kn, x.shape),
                jnp.full((F,), t, jnp.int32),
            )
            x = masks * noised_warp + (1.0 - masks) * x

            t_vec = jnp.full((F,), t, jnp.int32)
            inp = jnp.concatenate([x, warp_latents * masks], axis=-1)
            eps_c = self._apply(self.params, inp, t_vec, context, num_frames=F)
            eps_u = self._apply(self.params, inp, t_vec, null_context,
                                num_frames=F)
            eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)
            x = self.sampler.step(eps, int(t), int(t_prev), x)

        # Final mix: visible pixels exactly from the warp.
        return masks * warp_latents + (1.0 - masks) * x
