"""DepthAnythingV2 monocular relative-depth model (flax).

Mirrors Depth-Anything-V2/depth_anything_v2/dpt.py:153-230: DINOv2 backbone
taps ([4,11,17,23] for ViT-L) into a DPT head producing per-pixel relative
*disparity* (non-negative, affine-ambiguous — align it to metric depth with
ops/depth_align.py). `infer_image` reproduces the reference preprocessing:
resize so the short side ≥ 518 rounded to a multiple of 14, ImageNet
normalization, bilinear output resize back (dpt.py:187-222).

Weights: no download here; `convert_torch_checkpoint` maps the official torch
checkpoint; random init keeps the model exercisable for tests/benchmarks.

Batched inference over views is the pipeline's data axis — shard it over the
device mesh (parallel/mesh.shard_batch).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from g4splat_tpu.priors.dinov2 import DINOv2, VIT_CONFIGS, convert_torch_dinov2
from g4splat_tpu.priors.dpt import DPTHead, resize_bilinear_ac

INTERMEDIATE_IDX = {
    "vits": (2, 5, 8, 11),
    "vitb": (2, 5, 8, 11),
    "vitl": (4, 11, 17, 23),
    "vitg": (9, 19, 29, 39),
}
DPT_FEATURES = {"vits": 64, "vitb": 128, "vitl": 256, "vitg": 384}
DPT_OUT_CHANNELS = {
    "vits": (48, 96, 192, 384),
    "vitb": (96, 192, 384, 768),
    "vitl": (256, 512, 1024, 1024),
    "vitg": (1536, 1536, 1536, 1536),
}

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class DepthAnythingV2(nn.Module):
    encoder: str = "vitl"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) ImageNet-normalized, H/W multiples of 14 →
        (B, H, W) relative disparity."""
        cfg = VIT_CONFIGS[self.encoder]
        taps, grid = DINOv2(
            embed_dim=cfg["embed_dim"], depth=cfg["depth"],
            num_heads=cfg["num_heads"], name="pretrained",
        )(x, out_indices=INTERMEDIATE_IDX[self.encoder])
        disp = DPTHead(
            features=DPT_FEATURES[self.encoder],
            out_channels=DPT_OUT_CHANNELS[self.encoder],
            name="depth_head",
        )([t for t, _ in taps], grid)
        return disp[..., 0]


class DepthAnything:
    """Stateful wrapper: params + jitted batched inference."""

    def __init__(self, encoder: str = "vitl", params: Optional[Dict] = None,
                 seed: int = 0, input_size: int = 518):
        self.encoder = encoder
        self.model = DepthAnythingV2(encoder=encoder)
        self.input_size = input_size
        if params is None:
            dummy = jnp.zeros((1, 14 * 4, 14 * 4, 3))
            params = self.model.init(jax.random.PRNGKey(seed), dummy)
        self.params = params
        self._apply = jax.jit(self.model.apply)

    @staticmethod
    def _target_size(h: int, w: int, lower_bound: int) -> Tuple[int, int]:
        """Reference Resize: scale so min side = lower_bound, round each side
        to a multiple of 14 (util/transform.py, keep_aspect_ratio,
        ensure_multiple_of=14, resize_method='lower_bound')."""
        scale = max(lower_bound / h, lower_bound / w)
        nh = max(int(round(h * scale / 14) * 14), lower_bound)
        nw = max(int(round(w * scale / 14) * 14), lower_bound)
        return nh, nw

    def infer_image(self, image: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8/float [0,1] → (H, W) disparity."""
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        H, W = img.shape[:2]
        nh, nw = self._target_size(H, W, self.input_size)
        x = jax.image.resize(jnp.asarray(img), (nh, nw, 3), "bilinear")
        x = (x - _MEAN) / _STD
        disp = self._apply(self.params, x[None])
        disp = resize_bilinear_ac(disp[..., None], (H, W))[0, ..., 0]
        return np.asarray(disp)

    def infer_batch(self, images: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) float [0,1], H/W multiples of 14 → (B, H, W)."""
        x = (images - _MEAN) / _STD
        return self._apply(self.params, x)

    def infer_images(self, images: np.ndarray, mesh=None,
                     max_batch: int = 16) -> np.ndarray:
        """(V, H, W, 3) uint8/float [0,1] → (V, H, W) disparity.

        Batched `infer_image`: one resize + ONE ViT forward over the whole
        view stack instead of V dispatches (the per-view loop pays V ViT-L
        launches; indoor scenes share one resolution, so the batch is free).
        With `mesh`, the view axis shards over the mesh's `data` axis
        (SURVEY §2.5: per-view data-parallel inference for the prior
        models) — params replicate, XLA splits the batch over ICI.
        """
        imgs = np.asarray(images, np.float32)
        if imgs.max() > 1.5:
            imgs = imgs / 255.0
        V, H, W = imgs.shape[:3]
        if V > max_batch:
            # Fixed-size slabs (tail padded by repetition) bound activation
            # memory for dense-view sweeps AND keep one compiled shape.
            outs = []
            for i in range(0, V, max_batch):
                sl = imgs[i : i + max_batch]
                if len(sl) < max_batch:
                    sl = np.concatenate(
                        [sl, np.tile(sl[-1:],
                                     (max_batch - len(sl), 1, 1, 1))])
                outs.append(self.infer_images(sl, mesh=mesh,
                                              max_batch=max_batch))
            return np.concatenate(outs)[:V]
        nh, nw = self._target_size(H, W, self.input_size)
        x = jax.image.resize(jnp.asarray(imgs), (V, nh, nw, 3), "bilinear")
        x = (x - _MEAN) / _STD
        pad = 0
        if mesh is not None:
            n_data = mesh.shape["data"]
            pad = (-V) % n_data
            if pad:
                x = jnp.concatenate([x, jnp.tile(x[-1:], (pad, 1, 1, 1))])
            x = jax.device_put(
                x,
                jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec("data")),
            )
        disp = self._apply(self.params, x)
        if pad:
            disp = disp[:V]
        disp = resize_bilinear_ac(disp[..., None], (H, W))[..., 0]
        return np.asarray(disp)


def convert_torch_checkpoint(state: Dict, encoder: str = "vitl") -> Dict:
    """Official DepthAnythingV2 torch checkpoint → flax params."""
    cfg = VIT_CONFIGS[encoder]
    vit_state = {
        k[len("pretrained."):]: v for k, v in state.items()
        if k.startswith("pretrained.")
    }
    params = {"pretrained": convert_torch_dinov2(vit_state, cfg["depth"])["params"]}

    def conv(prefix):
        return {
            "kernel": np.asarray(state[prefix + ".weight"]).transpose(2, 3, 1, 0),
            "bias": np.asarray(state[prefix + ".bias"]),
        }

    def conv_nb(prefix):
        return {
            "kernel": np.asarray(state[prefix + ".weight"]).transpose(2, 3, 1, 0)
        }

    dh = "depth_head."
    head = {}
    for i in range(4):
        head[f"projects_{i}"] = conv(dh + f"projects.{i}")
    # ConvTranspose: torch (in, out, kh, kw) → flax (kh, kw, in, out) PLUS a
    # spatial flip — torch ConvTranspose2d mirrors taps (gradient-derived),
    # flax's default ConvTranspose does not.
    for i, name in ((0, "resize_0"), (1, "resize_1")):
        w = np.asarray(state[dh + f"resize_layers.{i}.weight"])
        head[name] = {
            "kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1].copy(),
            "bias": np.asarray(state[dh + f"resize_layers.{i}.bias"]),
        }
    head["resize_3"] = conv(dh + "resize_layers.3")
    for i in range(4):
        head[f"layer{i+1}_rn"] = conv_nb(dh + f"scratch.layer{i+1}_rn")
    for r in range(1, 5):
        blk = {}
        for u in (1, 2):
            blk[f"resConfUnit{u}"] = {
                "conv1": conv(dh + f"scratch.refinenet{r}.resConfUnit{u}.conv1"),
                "conv2": conv(dh + f"scratch.refinenet{r}.resConfUnit{u}.conv2"),
            }
        blk["out_conv"] = conv(dh + f"scratch.refinenet{r}.out_conv")
        head[f"refinenet{r}"] = blk
    head["output_conv1"] = conv(dh + "scratch.output_conv1")
    head["output_conv2_0"] = conv(dh + "scratch.output_conv2.0")
    head["output_conv2_2"] = conv(dh + "scratch.output_conv2.2")
    params["depth_head"] = head
    return {"params": params}


def depth_and_normal_from_disparity(disp, camera, ref_depth_samples=None,
                                    sample_disp=None, weights=None):
    """Disparity → metric depth (affine fit when reference samples given) →
    world normals, the mono_depth + depth-derived mono_normal pairing the
    pipeline consumes (mono_normal via a dedicated normal model is pluggable).
    """
    from g4splat_tpu.core.geometry import depth_to_normal
    from g4splat_tpu.ops.depth_align import fit_disparity_to_depth

    if ref_depth_samples is not None:
        depth, _, _ = fit_disparity_to_depth(
            disp, ref_depth_samples, sample_disp,
            weights if weights is not None else jnp.ones_like(ref_depth_samples),
        )
    else:
        depth = 1.0 / jnp.maximum(disp, 1e-6)
    normal = depth_to_normal(camera, depth)
    return depth, normal
