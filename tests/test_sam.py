import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.pipeline.planes import PlaneExcavator, PlaneExcavatorConfig
from g4splat_tpu.priors.sam import (
    TINY_SAM,
    SAM,
    SAMPredictor,
    mask_iou,
    sam_mask_generator,
    stability_score,
)


class TestSAMModel:
    @pytest.mark.slow
    def test_forward_shapes(self):
        model = SAM(TINY_SAM)
        img = jnp.zeros((1, 64, 64, 3))
        pts = jnp.array([[[0.5, 0.5]]])
        lbl = jnp.ones((1, 1))
        params = model.init(jax.random.PRNGKey(0), img, pts, lbl)
        masks, iou = model.apply(params, img, pts, lbl)
        # encoder grid 8×8, decoder upscales 4× → 32×32 mask logits.
        assert masks.shape == (1, TINY_SAM.num_mask_tokens, 32, 32)
        assert iou.shape == (1, TINY_SAM.num_mask_tokens)

    def test_batched_prompts(self):
        model = SAM(TINY_SAM)
        img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
        params = model.init(
            jax.random.PRNGKey(1), img, jnp.zeros((1, 1, 2)), jnp.ones((1, 1))
        )
        emb = model.apply(params, img, method=model.encode_image)
        embs = jnp.broadcast_to(emb, (4,) + emb.shape[1:])
        pts = jax.random.uniform(jax.random.PRNGKey(2), (4, 1, 2))
        masks, _ = model.apply(
            params, embs, pts, jnp.ones((4, 1)), method=model.decode
        )
        assert masks.shape[0] == 4
        # Different prompts → different masks.
        assert float(jnp.abs(masks[0] - masks[1]).max()) > 1e-6


class TestPromptLogic:
    def test_stability_score(self):
        logits = np.full((1, 8, 8), 5.0)
        assert stability_score(logits)[0] == pytest.approx(1.0)
        ramp = np.linspace(-2, 2, 64).reshape(1, 8, 8)
        s = stability_score(ramp)[0]
        assert 0 < s < 1

    def test_mask_iou(self):
        a = np.zeros((8, 8), bool)
        a[:4] = True
        b = np.zeros((8, 8), bool)
        b[2:6] = True
        assert mask_iou(a, b) == pytest.approx(2 / 6)

    def test_generate_masks_runs(self):
        pred = SAMPredictor(TINY_SAM)
        img = np.random.RandomState(0).rand(48, 48, 3).astype(np.float32)
        masks = pred.generate_masks(img, num_prompts=8, stability_thresh=0.0,
                                    prompt_batch=8)
        for m in masks:
            assert m.shape == (48, 48)
            assert m.dtype == bool

    @pytest.mark.slow
    def test_batch_generator_matches_per_view(self):
        # .batch (stack-encoded, optionally mesh-sharded) must reproduce the
        # per-view generator exactly: same embeddings → same masks.
        import jax as _jax

        from g4splat_tpu.parallel.mesh import make_mesh

        pred = SAMPredictor(TINY_SAM)
        gen = sam_mask_generator(pred, num_prompts=8, stability_thresh=0.0,
                                 prompt_batch=8)
        imgs = np.random.RandomState(3).rand(3, 48, 48, 3).astype(np.float32)
        per_view = [gen(imgs[v]) for v in range(3)]
        batched = gen.batch(imgs)
        assert len(batched) == 3
        for a, b in zip(per_view, batched):
            assert len(a) == len(b)
            for ma, mb in zip(a, b):
                np.testing.assert_array_equal(ma, mb)
        if len(_jax.devices()) >= 2:
            sharded = gen.batch(imgs, mesh=make_mesh(n_data=2))
            for a, b in zip(per_view, sharded):
                for ma, mb in zip(a, b):
                    np.testing.assert_array_equal(ma, mb)

    def test_plane_excavator_integration(self):
        pred = SAMPredictor(TINY_SAM)
        gen = sam_mask_generator(pred, num_prompts=8, stability_thresh=0.0,
                                 prompt_batch=8)
        normals = np.zeros((48, 48, 3), np.float32)
        normals[:24] = [0, 0, 1]
        normals[24:] = [0, 1, 0]
        normals += np.random.RandomState(0).randn(48, 48, 3) * 0.02
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        exc = PlaneExcavator(PlaneExcavatorConfig(), mask_generator=gen)
        out = exc(np.random.RandomState(1).rand(48, 48, 3), normals)
        assert out["seg_mask"].shape == (48, 48)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
