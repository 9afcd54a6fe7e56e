"""Stable-Diffusion KL autoencoder (flax) for the See3D latent space.

Checkpoint-structured port of the diffusers ``AutoencoderKL`` the See3D
pipeline loads alongside the MV UNet (guidance/see3d_util.py:18-40 via
``MVDreamPipeline.from_pretrained``): GroupNorm(32, eps=1e-6)/SiLU ResNet
blocks, 2 resnets per encoder down-block (3 per decoder up-block), stride-2
downsampling with asymmetric (0,1) padding, a single-head mid-block
self-attention, 4-channel latents scaled by 0.18215.  Module names mirror
the torch state-dict keys so ``convert_torch_vae`` is a mechanical
re-layout; channel widths are configurable so tiny configs stay
test-friendly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SD_SCALE = 0.18215


def _gn(ch: int, name: str) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=min(32, ch), epsilon=1e-6, name=name)


class ResnetBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.silu(_gn(x.shape[-1], "norm1")(x))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(h)
        h = nn.silu(_gn(self.out_ch, "norm2")(h))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head mid-block attention (diffusers ``Attention`` with
    Linear q/k/v projections)."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _gn(C, "group_norm")(x).reshape(B, H * W, C)
        q = nn.Dense(C, name="to_q")(h)
        k = nn.Dense(C, name="to_k")(h)
        v = nn.Dense(C, name="to_v")(h)
        att = jax.nn.softmax(q @ jnp.swapaxes(k, 1, 2) / jnp.sqrt(C), axis=-1)
        h = nn.Dense(C, name="to_out_0")(att @ v)
        return x + h.reshape(B, H, W, C)


class MidBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.ch, name="resnets_0")(x)
        x = AttnBlock(name="attentions_0")(x)
        return ResnetBlock(self.ch, name="resnets_1")(x)


class Encoder(nn.Module):
    base_ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    z_ch: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.base_ch, (3, 3), padding=1, name="conv_in")(x)
        for i, m in enumerate(self.ch_mult):
            ch = self.base_ch * m
            name = f"down_blocks_{i}"
            h = ResnetBlock(ch, name=f"{name}_resnets_0")(h)
            h = ResnetBlock(ch, name=f"{name}_resnets_1")(h)
            if i < len(self.ch_mult) - 1:
                # diffusers Downsample2D: stride-2, asymmetric (0,1) pad.
                h = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)),
                            name=f"{name}_downsamplers_0_conv")(h)
        h = MidBlock(h.shape[-1], name="mid_block")(h)
        h = nn.silu(_gn(h.shape[-1], "conv_norm_out")(h))
        return nn.Conv(2 * self.z_ch, (3, 3), padding=1, name="conv_out")(h)


class Decoder(nn.Module):
    base_ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    out_ch: int = 3

    @nn.compact
    def __call__(self, z):
        rev = list(reversed(self.ch_mult))
        ch = self.base_ch * rev[0]
        h = nn.Conv(ch, (3, 3), padding=1, name="conv_in")(z)
        h = MidBlock(ch, name="mid_block")(h)
        for i, m in enumerate(rev):
            ch = self.base_ch * m
            name = f"up_blocks_{i}"
            for j in range(3):
                h = ResnetBlock(ch, name=f"{name}_resnets_{j}")(h)
            if i < len(rev) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, 2 * H, 2 * W, C), "nearest")
                h = nn.Conv(C, (3, 3), padding=1,
                            name=f"{name}_upsamplers_0_conv")(h)
        h = nn.silu(_gn(h.shape[-1], "conv_norm_out")(h))
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
        """(B, H, W, 3) in [-1,1] -> latent (B, H/f, W/f, z). Deterministic
        (mean) unless an rng is given."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
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


# ------------------------------------------------------------ weight loading
_LEGACY_ATTN = {"query": "to_q", "key": "to_k", "value": "to_v",
                "proj_attn": "to_out.0"}


def convert_torch_vae(state_dict,
                      cfg: Optional[dict] = None) -> dict:
    """Convert a diffusers AutoencoderKL state dict to flax params.

    Handles both modern attention keys (to_q/to_k/to_v/to_out.0, Linear)
    and the legacy layout (query/key/value/proj_attn, possibly stored as
    1x1 convs — squeezed to Linear).
    """
    params: dict = {}
    for key in (state_dict.keys() if hasattr(state_dict, "keys")
                else state_dict):
        v = np.asarray(state_dict[key], np.float32)
        k = key
        for old, new in _LEGACY_ATTN.items():
            k = k.replace(f".{old}.", f".{new}.")
        parts = k.split(".")
        leaf = parts[-1]
        mods = parts[:-1]

        # Flatten indexed containers to the flax module names.
        out: list = []
        i = 0
        while i < len(mods):
            p = mods[i]
            if p in ("down_blocks", "up_blocks"):
                blk = f"{p}_{mods[i + 1]}"
                i += 2
                sub = mods[i]
                if sub == "resnets":
                    out.append(f"{blk}_resnets_{mods[i + 1]}")
                    i += 2
                elif sub in ("downsamplers", "upsamplers"):
                    out.append(f"{blk}_{sub}_{mods[i + 1]}_{mods[i + 2]}")
                    i += 3
                else:  # pragma: no cover - unknown sub-block
                    out.append(f"{blk}_{sub}")
                    i += 1
            elif p in ("resnets", "attentions"):
                out.append(f"{p}_{mods[i + 1]}")
                i += 2
            elif p == "to_out":
                out.append(f"to_out_{mods[i + 1]}")
                i += 2
            else:
                out.append(p)
                i += 1

        if leaf == "weight":
            if v.ndim == 4 and out[-1] in ("to_q", "to_k", "to_v",
                                           "to_out_0"):
                v = v[..., 0, 0]  # legacy 1x1-conv attention projection
            if v.ndim == 4:
                leaf, v = "kernel", v.transpose(2, 3, 1, 0)
            elif v.ndim == 2:
                leaf, v = "kernel", v.T
            else:
                leaf = "scale"
        node = params
        for p in out:
            node = node.setdefault(p, {})
        node[leaf] = jnp.asarray(v)
    return {"params": params}
