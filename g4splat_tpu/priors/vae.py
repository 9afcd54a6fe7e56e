"""Stable-Diffusion-style KL autoencoder (flax) for the See3D latent space.

Architecture-faithful port of the AutoencoderKL the See3D pipeline wraps
through diffusers (guidance/see3d_util.py loads VAE weights alongside the MV
UNet): GroupNorm/SiLU ResNet blocks, 4× down/up factor (3 stride-2 stages for
the SD configuration), a mid-block self-attention, 4-channel latents scaled by
0.18215. Channel widths are configurable so tiny configs stay test-friendly.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

SD_SCALE = 0.18215


class ResnetBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(h)
        h = nn.GroupNorm(num_groups=min(32, self.out_ch), name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=min(32, C), name="norm")(x)
        q = nn.Conv(C, (1, 1), name="q")(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), name="k")(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), name="v")(h).reshape(B, H * W, C)
        att = jax.nn.softmax(q @ jnp.swapaxes(k, 1, 2) / jnp.sqrt(C), axis=-1)
        h = (att @ v).reshape(B, H, W, C)
        return x + nn.Conv(C, (1, 1), name="proj_out")(h)


class Encoder(nn.Module):
    base_ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    z_ch: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.base_ch, (3, 3), padding=1, name="conv_in")(x)
        for i, m in enumerate(self.ch_mult):
            ch = self.base_ch * m
            h = ResnetBlock(ch, name=f"down_{i}_block_0")(h)
            h = ResnetBlock(ch, name=f"down_{i}_block_1")(h)
            if i < len(self.ch_mult) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                            name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), name="norm_out")(h)
        h = nn.silu(h)
        moments = nn.Conv(2 * self.z_ch, (3, 3), padding=1, name="conv_out")(h)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class Decoder(nn.Module):
    base_ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    out_ch: int = 3

    @nn.compact
    def __call__(self, z):
        ch = self.base_ch * self.ch_mult[-1]
        h = nn.Conv(ch, (3, 3), padding=1, name="conv_in")(z)
        h = ResnetBlock(ch, name="mid_block_1")(h)
        h = AttnBlock(name="mid_attn")(h)
        h = ResnetBlock(ch, name="mid_block_2")(h)
        for i, m in reversed(list(enumerate(self.ch_mult))):
            ch = self.base_ch * m
            h = ResnetBlock(ch, name=f"up_{i}_block_0")(h)
            h = ResnetBlock(ch, name=f"up_{i}_block_1")(h)
            if i > 0:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, 2 * H, 2 * W, C), "nearest")
                h = nn.Conv(C, (3, 3), padding=1, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    base_ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    z_ch: int = 4

    def setup(self):
        self.encoder = Encoder(self.base_ch, self.ch_mult, self.z_ch,
                               name="encoder")
        self.decoder = Decoder(self.base_ch, self.ch_mult, name="decoder")
        self.quant_conv = nn.Conv(2 * self.z_ch, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(self.z_ch, (1, 1),
                                       name="post_quant_conv")

    def encode(self, x, rng=None):
        """(B, H, W, 3) in [-1,1] → latent (B, H/f, W/f, z). Deterministic
        (mean) unless an rng is given."""
        mean, logvar = self.encoder(x)
        m = self.quant_conv(jnp.concatenate([mean, logvar], -1))
        mean, logvar = jnp.split(m, 2, axis=-1)
        if rng is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape
            )
        return mean * SD_SCALE

    def decode(self, z):
        z = self.post_quant_conv(z / SD_SCALE)
        return self.decoder(z)

    def __call__(self, x):
        return self.decode(self.encode(x))
