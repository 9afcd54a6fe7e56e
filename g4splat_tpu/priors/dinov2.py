"""DINOv2 ViT encoder (flax), the DepthAnythingV2 backbone.

Re-implements the reference's vendored DINOv2
(Depth-Anything-V2/depth_anything_v2/dinov2.py + dinov2_layers/): patch-14
ViT with cls token, learned position embeddings (bilinear-resized to the
input grid), LayerScale blocks, and `get_intermediate_layers` returning
final-norm'd (patch_tokens, cls_token) pairs (dinov2.py:297-321).

`convert_torch_dinov2` maps a torch state dict onto the flax params.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from g4splat_tpu.priors.vit import Block, PatchEmbed, interpolate_pos_embed

VIT_CONFIGS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16),
    "vitg": dict(embed_dim=1536, depth=40, num_heads=24),
}


class DINOv2(nn.Module):
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 14
    mlp_ratio: float = 4.0
    layerscale: float = 1e-5
    pretrain_img_size: int = 518

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 out_indices: Sequence[int] = (4, 11, 17, 23)):
        """x: (B, H, W, 3), H/W multiples of 14 → list of (patch_tokens
        (B, N, C), cls (B, C)) per requested block index."""
        B = x.shape[0]
        tokens, (gh, gw) = PatchEmbed(self.patch_size, self.embed_dim,
                                      name="patch_embed")(x)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        g0 = self.pretrain_img_size // self.patch_size
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, g0 * g0 + 1, self.embed_dim),
        )
        patch_pos = interpolate_pos_embed(pos[0, 1:], gh, gw, src_g=g0)
        tokens = tokens + patch_pos[None]
        cls_tok = cls + pos[:, :1]
        x = jnp.concatenate([jnp.broadcast_to(cls_tok, (B, 1, self.embed_dim)),
                             tokens], axis=1)

        outs = []
        want = set(out_indices)
        for i in range(self.depth):
            x = Block(
                self.num_heads, self.mlp_ratio, qkv_bias=True,
                layerscale=self.layerscale, name=f"blocks_{i}",
            )(x)
            if i in want:
                outs.append(x)
        norm = nn.LayerNorm(name="norm")
        outs = [norm(o) for o in outs]
        return [(o[:, 1:], o[:, 0]) for o in outs], (gh, gw)


def convert_torch_dinov2(state: dict, depth: int = 24) -> dict:
    """torch DINOv2 state dict (numpy arrays) → flax params tree."""
    p = {}
    p["patch_embed"] = {
        "proj": {
            # torch conv (out,in,kh,kw) → flax (kh,kw,in,out)
            "kernel": np.asarray(state["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": np.asarray(state["patch_embed.proj.bias"]),
        }
    }
    p["cls_token"] = np.asarray(state["cls_token"])
    p["pos_embed"] = np.asarray(state["pos_embed"])
    for i in range(depth):
        pre = f"blocks.{i}."
        blk = {
            "norm1": {"scale": np.asarray(state[pre + "norm1.weight"]),
                      "bias": np.asarray(state[pre + "norm1.bias"])},
            "norm2": {"scale": np.asarray(state[pre + "norm2.weight"]),
                      "bias": np.asarray(state[pre + "norm2.bias"])},
            "attn": {
                "qkv": {"kernel": np.asarray(state[pre + "attn.qkv.weight"]).T,
                        "bias": np.asarray(state[pre + "attn.qkv.bias"])},
                "proj": {"kernel": np.asarray(state[pre + "attn.proj.weight"]).T,
                         "bias": np.asarray(state[pre + "attn.proj.bias"])},
            },
            "mlp": {
                "fc1": {"kernel": np.asarray(state[pre + "mlp.fc1.weight"]).T,
                        "bias": np.asarray(state[pre + "mlp.fc1.bias"])},
                "fc2": {"kernel": np.asarray(state[pre + "mlp.fc2.weight"]).T,
                        "bias": np.asarray(state[pre + "mlp.fc2.bias"])},
            },
            "ls1": {"gamma": np.asarray(state[pre + "ls1.gamma"])},
            "ls2": {"gamma": np.asarray(state[pre + "ls2.gamma"])},
        }
        p[f"blocks_{i}"] = blk
    p["norm"] = {"scale": np.asarray(state["norm.weight"]),
                 "bias": np.asarray(state["norm.bias"])}
    return {"params": p}
