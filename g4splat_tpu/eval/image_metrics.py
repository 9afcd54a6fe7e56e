"""Image metrics: PSNR, SSIM, LPIPS.

Replaces the reference's eval/image_eval.py + lpipsPyTorch/ (VGG-variant
LPIPS re-implementation). LPIPS here is a pure-JAX VGG16 feature stack with
the standard calibration heads:

- input scaled to [-1, 1], then shift/scale normalized
  (lpipsPyTorch/modules/utils.py conventions),
- features tapped at conv{1_2, 2_2, 3_3, 4_3, 5_3}, channel-unit-normalized,
- squared differences → non-negative 1×1 linear heads → spatial mean → sum.

Pretrained VGG16 + LPIPS head weights cannot be downloaded in this
environment; `load_torch_lpips_weights` converts a standard torch checkpoint
(torchvision VGG16 `features.*` + LPIPS `lin*.model.1.weight`) when one is
provided on disk. With `random_init`, the metric is architecturally complete
and exercisable (weights are a deployment artifact, not code).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from g4splat_tpu.train.losses import psnr, ssim  # noqa: F401 (re-export)

# VGG16 conv plan: (out_channels, pool_before)
VGG16_PLAN = [
    (64, False), (64, False),            # conv1_1, conv1_2  → tap 0
    (128, True), (128, False),           # conv2_1, conv2_2  → tap 1
    (256, True), (256, False), (256, False),   # conv3_*     → tap 2
    (512, True), (512, False), (512, False),   # conv4_*     → tap 3
    (512, True), (512, False), (512, False),   # conv5_*     → tap 4
]
TAP_LAYERS = (1, 3, 6, 9, 12)
TAP_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips_params(key=None, seed: int = 0) -> Dict:
    """Random (He) init of VGG16 convs + LPIPS heads."""
    key = key if key is not None else jax.random.PRNGKey(seed)
    params = {"conv": [], "lin": []}
    cin = 3
    for i, (cout, _) in enumerate(VGG16_PLAN):
        key, k = jax.random.split(key)
        std = math.sqrt(2.0 / (9 * cin))
        params["conv"].append({
            "w": std * jax.random.normal(k, (3, 3, cin, cout)),
            "b": jnp.zeros(cout),
        })
        cin = cout
    for i, ch in enumerate(TAP_CHANNELS):
        key, k = jax.random.split(key)
        params["lin"].append(jnp.abs(jax.random.normal(k, (ch,))) * 0.1)
    return params


def load_torch_lpips_weights(vgg_state: Dict, lpips_state: Dict) -> Dict:
    """Convert torchvision VGG16 `features.{idx}.weight/bias` + LPIPS
    `lin{i}.model.1.weight` state dicts (numpy arrays) to our param tree."""
    # torchvision indices of conv layers in vgg16.features
    tv_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params = {"conv": [], "lin": []}
    for idx in tv_conv_idx:
        w = np.asarray(vgg_state[f"features.{idx}.weight"])  # (out,in,3,3)
        b = np.asarray(vgg_state[f"features.{idx}.bias"])
        params["conv"].append({
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "b": jnp.asarray(b),
        })
    for i in range(5):
        w = np.asarray(lpips_state[f"lin{i}.model.1.weight"])  # (1,ch,1,1)
        params["lin"].append(jnp.asarray(w.reshape(-1)))
    return params


def _vgg_features(params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (H, W, 3) in [-1, 1] → list of 5 tapped feature maps."""
    x = (x - _SHIFT) / _SCALE
    x = x[None]  # NHWC
    feats = []
    for i, ((cout, pool), conv) in enumerate(zip(VGG16_PLAN, params["conv"])):
        if pool:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        x = jax.lax.conv_general_dilated(
            x, conv["w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + conv["b"]
        x = jax.nn.relu(x)
        if i in TAP_LAYERS:
            feats.append(x[0])
    return feats


def lpips(params, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """img1, img2: (H, W, 3) in [0, 1] → scalar LPIPS distance."""
    a = _vgg_features(params, img1 * 2.0 - 1.0)
    b = _vgg_features(params, img2 * 2.0 - 1.0)
    total = 0.0
    for fa, fb, w in zip(a, b, params["lin"]):
        fa = fa / (jnp.linalg.norm(fa, axis=-1, keepdims=True) + 1e-10)
        fb = fb / (jnp.linalg.norm(fb, axis=-1, keepdims=True) + 1e-10)
        d = (fa - fb) ** 2
        total = total + jnp.mean(jnp.sum(d * jnp.abs(w), axis=-1))
    return total


class LPIPS:
    """Stateful convenience wrapper with jitted evaluation."""

    def __init__(self, params: Optional[Dict] = None, seed: int = 0,
                 calibrated: Optional[bool] = None):
        self.params = params if params is not None else init_lpips_params(seed=seed)
        # Without converted VGG16+LPIPS-head weights the metric is
        # architecturally LPIPS but numerically meaningless — consumers
        # (evaluate()) surface this flag next to the reported number.
        self.calibrated = (params is not None) if calibrated is None \
            else bool(calibrated)
        self._fn = jax.jit(lpips)

    def __call__(self, img1, img2) -> float:
        return float(self._fn(self.params, jnp.asarray(img1), jnp.asarray(img2)))


def evaluate_images(
    renders: np.ndarray,   # (N, H, W, 3) in [0,1]
    gts: np.ndarray,
    lpips_model: Optional[LPIPS] = None,
) -> Dict[str, float]:
    """Per-set means of PSNR/SSIM/LPIPS (reference image_eval.py:16-42)."""
    ps, ss, lp = [], [], []
    for r, g in zip(renders, gts):
        r = jnp.asarray(r)
        g = jnp.asarray(g)
        ps.append(float(psnr(r, g)))
        ss.append(float(ssim(r, g)))
        if lpips_model is not None:
            lp.append(lpips_model(r, g))
    out = {"PSNR": float(np.mean(ps)), "SSIM": float(np.mean(ss))}
    if lp:
        out["LPIPS"] = float(np.mean(lp))
    return out
