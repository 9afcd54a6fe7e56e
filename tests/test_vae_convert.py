"""SD-VAE torch-checkpoint conversion tests.

Fixtures recorded from a diffusers-schema torch AutoencoderKL replica
(scripts/record_vae_fixture.py):
- vae_tiny_ref.npz   — tiny-config state dict + deterministic encode/decode
  outputs; demands numeric parity of the converted flax encoder+decoder
  (pins the asymmetric downsample padding, attention projections, GroupNorm
  eps, every transpose).
- vae_full_keys.json — the full SD-2.1 VAE key -> shape map; demands full
  key consumption and shape parity with our model's own init.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.priors.vae import SD_SCALE, AutoencoderKL, convert_torch_vae

pytestmark = pytest.mark.slow  # torch-oracle / integration tier

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


class TestNumericParity:
    def test_encode_decode_match_reference(self):
        fx = np.load(os.path.join(FIXTURES, "vae_tiny_ref.npz"))
        state = {k[3:]: fx[k] for k in fx.files if k.startswith("sd.")}
        params = convert_torch_vae(state)
        vae = AutoencoderKL(base_ch=32, ch_mult=(1, 2), z_ch=4)

        x = jnp.asarray(fx["in.x"]).transpose(0, 2, 3, 1)
        z = vae.apply(params, x, method=AutoencoderKL.encode)
        mean_ref = fx["out.mean"].transpose(0, 2, 3, 1)
        err = float(np.abs(np.asarray(z) / SD_SCALE - mean_ref).max())
        scale = float(np.abs(mean_ref).max())
        assert err / max(scale, 1e-3) < 5e-4, f"encode rel err {err/scale:.2e}"

        rec = vae.apply(params, jnp.asarray(mean_ref) * SD_SCALE,
                        method=AutoencoderKL.decode)
        rec_ref = fx["out.rec"].transpose(0, 2, 3, 1)
        err = float(np.abs(np.asarray(rec) - rec_ref).max())
        scale = float(np.abs(rec_ref).max())
        assert err / max(scale, 1e-3) < 5e-4, f"decode rel err {err/scale:.2e}"


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
        with open(os.path.join(FIXTURES, "vae_full_keys.json")) as f:
            shapes = json.load(f)
        state = _RecordingZeros(shapes)
        params = convert_torch_vae(state)

        missed = set(shapes) - state.read
        assert not missed, f"checkpoint keys not consumed: {sorted(missed)[:10]}"

        vae = AutoencoderKL()  # SD defaults: base 128, mult (1,2,4,4), z 4
        expected = jax.eval_shape(
            lambda: vae.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3))))
        got_shapes = jax.tree.map(np.shape, params)
        exp_shapes = jax.tree.map(lambda x: tuple(x.shape), expected)
        assert got_shapes == exp_shapes


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
