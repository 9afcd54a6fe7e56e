"""MASt3R torch-checkpoint conversion tests.

Two fixtures, both recorded from the reference implementation
(mast3r/mast3r/model.py + dust3r + croco) run on CPU:
- mast3r_tiny_ref.npz — a tiny-config reference model's full state dict, a
  fixed input pair, and the reference forward outputs. The test converts the
  state dict with `convert_torch_mast3r` and demands numeric parity of the
  flax forward — this pins RoPE semantics, decoder wiring, DPT structure,
  and every transpose in the converter.
- mast3r_vitl_keys.json — the full ViT-L checkpoint's key → shape map
  (1017 keys). The test demands the converter consumes exactly the expected
  keys and emits a tree whose shapes match our model's init shapes.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.priors.mast3r import (
    AsymmetricMASt3R,
    MASt3RConfig,
    convert_torch_mast3r,
)

pytestmark = pytest.mark.slow  # torch-oracle / integration tier

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

TINY_REF_CFG = MASt3RConfig(
    patch_size=16, enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
    dec_embed_dim=32, dec_depth=12, dec_num_heads=2, local_feat_dim=8,
    dpt_features=16, dpt_layer_dims=(8, 16, 24, 32), two_confs=True,
)


class TestNumericParity:
    @pytest.fixture(scope="class")
    def fixture(self):
        return np.load(os.path.join(FIXTURES, "mast3r_tiny_ref.npz"))

    def test_forward_matches_reference(self, fixture):
        state = {k[3:]: fixture[k] for k in fixture.files if k.startswith("sd.")}
        params = convert_torch_mast3r(state, TINY_REF_CFG)
        net = AsymmetricMASt3R(TINY_REF_CFG)
        img1 = jnp.asarray(fixture["in.img1"]).transpose(0, 2, 3, 1)
        img2 = jnp.asarray(fixture["in.img2"]).transpose(0, 2, 3, 1)
        out1, out2 = net.apply(params, img1, img2)
        for tag, out in (("out1", out1), ("out2", out2)):
            for k in ("pts3d", "conf", "desc", "desc_conf"):
                ref = fixture[f"{tag}.{k}"]
                got = np.asarray(out[k])
                assert got.shape == ref.shape, (tag, k, got.shape, ref.shape)
                scale = max(1e-3, float(np.abs(ref).max()))
                err = float(np.abs(got - ref).max()) / scale
                assert err < 5e-4, f"{tag}.{k} rel err {err:.2e}"


class _RecordingZeros(dict):
    """Maps any recorded torch key to a zero-strided array of its recorded
    shape (no memory) and records which keys were read."""

    def __init__(self, shapes):
        super().__init__()
        self.shapes = shapes
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return np.broadcast_to(np.float32(0.0), tuple(self.shapes[k]))


class TestFullSizeKeymap:
    def test_vitl_key_coverage_and_shapes(self):
        with open(os.path.join(FIXTURES, "mast3r_vitl_keys.json")) as f:
            shapes = json.load(f)
        state = _RecordingZeros(shapes)
        cfg = MASt3RConfig()   # full ViT-L defaults
        params = convert_torch_mast3r(state, cfg)

        ignorable = {k for k in shapes
                     if k == "mask_token" or ".scratch.layer_rn." in k}
        missed = set(shapes) - state.read - ignorable
        assert not missed, f"checkpoint keys not consumed: {sorted(missed)[:10]}"
        unknown = state.read - set(shapes)
        assert not unknown, f"converter read non-checkpoint keys: {sorted(unknown)[:10]}"

        # Shape parity with the flax model's own init, without allocating.
        net = AsymmetricMASt3R(cfg)
        img = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
        expected = jax.eval_shape(
            lambda: net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 3)),
                             jnp.zeros((1, 64, 64, 3))))
        del img
        got_shapes = jax.tree.map(np.shape, params)
        exp_shapes = jax.tree.map(lambda x: tuple(x.shape), expected)
        assert got_shapes == exp_shapes


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
