"""DPT fusion head (flax), as used by DepthAnythingV2.

Structure mirrors Depth-Anything-V2/depth_anything_v2/dpt.py:38-150 +
util/blocks.py: per-tap 1×1 projections → resize pyramid (convT×4, convT×2,
identity, stride-2 conv) → 3×3 no-bias "scratch" convs → 4 FeatureFusionBlocks
(2 ResidualConvUnits each, align-corners upsampling) → 2-stage output conv.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def resize_bilinear_ac(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with torch align_corners=True semantics.
    x: (B, H, W, C) → (B, h, w, C)."""
    B, H, W, C = x.shape
    h, w = size
    ys = jnp.linspace(0.0, H - 1.0, h)
    xs = jnp.linspace(0.0, W - 1.0, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, max(H - 2, 0))
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, max(W - 2, 0))
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, jnp.minimum(x0 + 1, W - 1)]
    c = x[:, jnp.minimum(y0 + 1, H - 1)][:, :, x0]
    d = x[:, jnp.minimum(y0 + 1, H - 1)][:, :, jnp.minimum(x0 + 1, W - 1)]
    return (
        a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
        + c * wy * (1 - wx) + d * wy * wx
    )


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, res=None, size=None):
        if res is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(res)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        if size is None:
            size = (x.shape[1] * 2, x.shape[2] * 2)
        x = resize_bilinear_ac(x, size)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHead(nn.Module):
    """DA2 flavour (defaults): last_dim 32, trailing ReLU (disparity ≥ 0).
    dust3r/MASt3R flavour (croco dpt_block.py regression head): layer dims
    (96, 192, 384, 768), last_dim = features // 2, NO trailing activation —
    the head regresses signed xyz + raw confidence."""
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    patch_size: int = 14
    head_out: int = 1           # 1 = depth/disparity
    last_dim: int = 32
    final_relu: bool = True

    @nn.compact
    def __call__(self, taps, grid: Tuple[int, int]):
        """taps: 4 × (B, N, C) patch tokens (shallow→deep); grid = (gh, gw)."""
        gh, gw = grid
        feats = []
        for i, t in enumerate(taps):
            B, N, C = t.shape
            x = t.reshape(B, gh, gw, C)
            x = nn.Conv(self.out_channels[i], (1, 1), name=f"projects_{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(
                    self.out_channels[0], (4, 4), strides=(4, 4),
                    name="resize_0",
                )(x)
            elif i == 1:
                x = nn.ConvTranspose(
                    self.out_channels[1], (2, 2), strides=(2, 2),
                    name="resize_1",
                )(x)
            elif i == 3:
                x = nn.Conv(
                    self.out_channels[3], (3, 3), strides=(2, 2), padding=1,
                    name="resize_3",
                )(x)
            feats.append(x)

        rn = [
            nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name=f"layer{i+1}_rn")(f)
            for i, f in enumerate(feats)
        ]
        path4 = FeatureFusionBlock(self.features, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3]
        )
        path3 = FeatureFusionBlock(self.features, name="refinenet3")(
            path4, rn[2], size=rn[1].shape[1:3]
        )
        path2 = FeatureFusionBlock(self.features, name="refinenet2")(
            path3, rn[1], size=rn[0].shape[1:3]
        )
        path1 = FeatureFusionBlock(self.features, name="refinenet1")(
            path2, rn[0]
        )

        out = nn.Conv(self.features // 2, (3, 3), padding=1,
                      name="output_conv1")(path1)
        out = resize_bilinear_ac(
            out, (gh * self.patch_size, gw * self.patch_size)
        )
        out = nn.Conv(self.last_dim, (3, 3), padding=1,
                      name="output_conv2_0")(out)
        out = nn.relu(out)
        out = nn.Conv(self.head_out, (1, 1), name="output_conv2_2")(out)
        if self.final_relu:
            out = nn.relu(out)
        return out
