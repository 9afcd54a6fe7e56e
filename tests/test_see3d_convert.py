"""See3D MV-UNet torch-checkpoint conversion tests.

Fixtures recorded from the vendored reference mv_unet.py on CPU torch
(scripts/record_see3d_fixture.py):
- see3d_tiny_ref.npz  — tiny-config reference state dict + forward output;
  demands numeric parity of the converted flax forward (pins the 3D
  attention reshape, GEGLU chunk order, timestep embedding, every
  transpose).
- see3d_full_keys.json — the full MVDream-SD2.1 (in_channels=9) checkpoint
  key -> shape map (690 keys); demands full key consumption and shape
  parity with our model's own init.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.priors.see3d import (
    TINY_UNET,
    MultiViewUNet,
    UNetConfig,
    convert_torch_see3d,
)

pytestmark = pytest.mark.slow  # torch-oracle / integration tier

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


class TestNumericParity:
    def test_forward_matches_reference(self):
        fx = np.load(os.path.join(FIXTURES, "see3d_tiny_ref.npz"))
        state = {k[3:]: fx[k] for k in fx.files if k.startswith("sd.")}
        params = convert_torch_see3d(state, TINY_UNET)
        net = MultiViewUNet(TINY_UNET)
        x = jnp.asarray(fx["in.x"]).transpose(0, 2, 3, 1)
        t = jnp.asarray(fx["in.t"])
        ctx = jnp.asarray(fx["in.ctx"])
        out = net.apply(params, x, t, ctx, num_frames=x.shape[0])
        ref = fx["out.eps"].transpose(0, 2, 3, 1)
        assert out.shape == ref.shape
        err = float(np.abs(np.asarray(out) - ref).max())
        scale = float(np.abs(ref).max())
        assert err / max(scale, 1e-3) < 5e-4, f"rel err {err / scale:.2e}"


class _RecordingZeros(dict):
    def __init__(self, shapes):
        super().__init__()
        self.shapes = shapes
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return np.broadcast_to(np.float32(0.0), tuple(self.shapes[k]))

    def keys(self):
        return self.shapes.keys()


class TestFullSizeKeymap:
    def test_full_key_coverage_and_shapes(self):
        with open(os.path.join(FIXTURES, "see3d_full_keys.json")) as f:
            shapes = json.load(f)
        state = _RecordingZeros(shapes)
        cfg = UNetConfig()   # MVDream SD-2.1 defaults, in_channels=9
        params = convert_torch_see3d(state, cfg)

        missed = set(shapes) - state.read
        assert not missed, f"checkpoint keys not consumed: {sorted(missed)[:10]}"
        unknown = state.read - set(shapes)
        assert not unknown, f"converter read non-checkpoint keys: {sorted(unknown)[:10]}"

        net = MultiViewUNet(cfg)
        expected = jax.eval_shape(
            lambda: net.init(
                jax.random.PRNGKey(0),
                jnp.zeros((2, 32, 32, cfg.in_channels)),
                jnp.zeros((2,), jnp.int32),
                jnp.zeros((2, 77, cfg.context_dim)),
                num_frames=2,
                camera=jnp.zeros((2, cfg.camera_dim)),
            ))
        got_shapes = jax.tree.map(np.shape, params)
        exp_shapes = jax.tree.map(lambda x: tuple(x.shape), expected)
        assert got_shapes == exp_shapes


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
