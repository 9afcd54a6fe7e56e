import jax
import jax.numpy as jnp
import numpy as np
import pytest

from g4splat_tpu.priors.see3d import (
    TINY_UNET,
    DDIMConfig,
    DDIMSampler,
    MultiViewUNet,
    See3DPipeline,
    custom_decay_function_weight,
    timestep_embedding,
)
from g4splat_tpu.priors.vae import SD_SCALE, AutoencoderKL


class TestUNet:
    @pytest.mark.slow
    def test_forward_shapes(self):
        unet = MultiViewUNet(TINY_UNET)
        F, h, w = 3, 8, 8
        x = jnp.zeros((F, h, w, TINY_UNET.in_channels))
        t = jnp.zeros(F, jnp.int32)
        ctx = jnp.zeros((F, 4, TINY_UNET.context_dim))
        params = unet.init(jax.random.PRNGKey(0), x, t, ctx, num_frames=F)
        out = unet.apply(params, x, t, ctx, num_frames=F)
        assert out.shape == (F, h, w, 4)
        # zero-init output conv → exactly zero at init
        assert float(jnp.abs(out).max()) == 0.0

    @pytest.mark.slow
    def test_cross_frame_attention_couples_frames(self):
        # Changing frame 1's input must change frame 0's output (3D attention).
        unet = MultiViewUNet(TINY_UNET)
        F, h, w = 2, 8, 8
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (F, h, w, TINY_UNET.in_channels))
        t = jnp.full((F,), 10, jnp.int32)
        ctx = jax.random.normal(key, (F, 4, TINY_UNET.context_dim))
        params = unet.init(jax.random.PRNGKey(0), x, t, ctx, num_frames=F)
        # Perturb internals: re-randomize the zero-init out conv so outputs flow.
        params = jax.tree.map(lambda p: p if p.ndim < 2 else p + 0.01, params)
        y0 = unet.apply(params, x, t, ctx, num_frames=F)
        x2 = x.at[1].add(1.0)
        y1 = unet.apply(params, x2, t, ctx, num_frames=F)
        assert float(jnp.abs(y1[0] - y0[0]).max()) > 1e-6


class TestDDIM:
    def test_add_noise_snr(self):
        s = DDIMSampler(DDIMConfig())
        x0 = jnp.ones((2, 4, 4, 4))
        noise = jnp.zeros_like(x0)
        early = s.add_noise(x0, noise, jnp.array([0, 0]))
        late = s.add_noise(x0, noise, jnp.array([999, 999]))
        assert float(early.mean()) > 0.99
        # rescale_betas_zero_snr: terminal alphabar is exactly zero.
        assert abs(float(late.mean())) < 1e-6

    def test_step_recovers_x0_when_eps_known(self):
        # step_size = 1000//10 = 100; from t=50 the prev step is t=-50 → a=1,
        # so a correct eps-prediction step lands exactly on x0.
        s = DDIMSampler(DDIMConfig(num_steps=10, prediction_type="epsilon",
                                   rescale_zero_snr=False))
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = 50
        xt = s.add_noise(x0, eps, jnp.array([t]))
        x_prev = s.step(eps, t, xt)
        np.testing.assert_allclose(np.asarray(x_prev), np.asarray(x0), atol=1e-4)

    def test_v_prediction_resolves_eps_and_x0(self):
        s = DDIMSampler(DDIMConfig())
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([400])
        xt = s.add_noise(x0, eps, t)
        a = s.alphas_cumprod[400]
        v = jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * x0
        got_eps, got_x0 = s.to_eps_x0(v, t, xt)
        np.testing.assert_allclose(np.asarray(got_x0), np.asarray(x0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_eps), np.asarray(eps), atol=1e-5)

    def test_timesteps_match_reference_trailing_grid(self):
        # pipeline_mvd_warp_mix_classifier.py:552-555:
        #   step_ratio = 999 // num_inference_steps
        #   np.round(np.arange(999, 0, -step_ratio))
        s = DDIMSampler(DDIMConfig(num_steps=50))
        ref = np.round(np.arange(999, 0, -(999 // 50))).astype(np.int64)
        np.testing.assert_array_equal(np.asarray(s.timesteps), ref)
        assert s.timesteps[0] == 999
        assert (np.diff(s.timesteps) < 0).all()
        assert s.step_size == 20  # diffusers: t_prev = t - 1000//50

    def test_decay_weight_shape(self):
        # pipeline_mvd_warp_mix_classifier.py:27-51 — high near t_peak,
        # decaying toward t=0, clipped to [0,1].
        t = jnp.array([0.0, 30.0, 60.0, 130.0, 199.0])
        w = np.asarray(custom_decay_function_weight(t))
        assert (w >= 0).all() and (w <= 1).all()
        assert (np.diff(w) >= -1e-6).all()  # monotone rising toward t_peak
        np.testing.assert_allclose(w[2], 0.8, atol=1e-6)  # v_end at t_end


class TestVAE:
    @pytest.mark.slow
    def test_roundtrip_shapes(self):
        vae = AutoencoderKL(base_ch=16, ch_mult=(1, 2), z_ch=4)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3),
                               minval=-1, maxval=1)
        params = vae.init(jax.random.PRNGKey(1), x)
        z = vae.apply(params, x, method=vae.encode)
        assert z.shape == (1, 8, 8, 4)   # one stride-2 stage for 2 mults
        rec = vae.apply(params, z, method=vae.decode)
        assert rec.shape == x.shape


class TestPipeline:
    def _make(self, F=3, h=8, w=8, steps=4):
        unet = MultiViewUNet(TINY_UNET)
        x = jnp.zeros((F, h, w, TINY_UNET.in_channels))
        t = jnp.zeros(F, jnp.int32)
        ctx = jnp.zeros((F, 4, TINY_UNET.context_dim))
        params = unet.init(jax.random.PRNGKey(0), x, t, ctx, num_frames=F)
        # Perturb so the zero-init projections pass information.
        params = jax.tree.map(lambda p: p if p.ndim < 2 else p + 0.01, params)
        pipe = See3DPipeline(unet, params, DDIMConfig(num_steps=steps))
        warp = jax.random.normal(jax.random.PRNGKey(2), (F, h, w, 4))
        masks = jnp.zeros((F, h, w, 1)).at[:, :4].set(1.0)
        ctx = jax.random.normal(jax.random.PRNGKey(4), (F, 4, TINY_UNET.context_dim))
        return pipe, warp, masks, ctx

    def test_gt_frames_pinned_generated_frames_change(self):
        pipe, warp, masks, ctx = self._make()
        out = pipe.inpaint_latents(jax.random.PRNGKey(3), warp, masks, ctx,
                                   gt_num=1)
        assert out.shape == warp.shape
        # Reference frames come back exactly (:640-644 pinning).
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(warp[0]),
                                   atol=1e-6)
        # Generated frames are actually generated.
        assert float(jnp.abs(out[1:] - warp[1:]).mean()) > 0.05

    def test_reference_frame_couples_into_generation(self):
        # The whole point of the MV UNet: a different reference image must
        # change what gets generated in the other frames (3D attention +
        # warp-mix conditioning), VERDICT item 5.
        pipe, warp, masks, ctx = self._make()
        key = jax.random.PRNGKey(3)
        out_a = pipe.inpaint_latents(key, warp, masks, ctx, gt_num=1)
        warp_b = warp.at[0].add(1.0)
        out_b = pipe.inpaint_latents(key, warp_b, masks, ctx, gt_num=1)
        # Same key → identical noise draws; only frame 0's content differs.
        assert float(jnp.abs(out_b[1:] - out_a[1:]).max()) > 1e-5

    @pytest.mark.slow
    def test_guidance_rescale_changes_output(self):
        # rescale_noise_cfg (pipeline_mvd_warp_mix_classifier.py:53-63):
        # with guidance_rescale > 0 the CFG prediction is pulled toward the
        # cond branch's per-frame std; production default 0.0 must be the
        # plain CFG combine.
        unet = MultiViewUNet(TINY_UNET)
        F, h, w = 3, 8, 8
        x = jnp.zeros((F, h, w, TINY_UNET.in_channels))
        t = jnp.zeros(F, jnp.int32)
        ctx0 = jnp.zeros((F, 4, TINY_UNET.context_dim))
        params = unet.init(jax.random.PRNGKey(0), x, t, ctx0, num_frames=F)
        params = jax.tree.map(lambda p: p if p.ndim < 2 else p + 0.01, params)
        warp = jax.random.normal(jax.random.PRNGKey(2), (F, h, w, 4))
        masks = jnp.zeros((F, h, w, 1)).at[:, :4].set(1.0)
        ctx = jax.random.normal(jax.random.PRNGKey(4),
                                (F, 4, TINY_UNET.context_dim))
        key = jax.random.PRNGKey(3)
        outs = {}
        for gr in (0.0, 0.7):
            pipe = See3DPipeline(
                unet, params, DDIMConfig(num_steps=4, guidance_rescale=gr))
            outs[gr] = pipe.inpaint_latents(key, warp, masks, ctx, gt_num=1)
        assert float(jnp.abs(outs[0.7] - outs[0.0]).max()) > 1e-6
        # Reference frames stay pinned under rescale too.
        np.testing.assert_allclose(np.asarray(outs[0.7][0]),
                                   np.asarray(warp[0]), atol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
class TestShardedDenoise:
    """Mesh-sharded DDIM denoise (the cond/uncond CFG pair + frame groups
    fan out over `data`; joint 3D attention all_gathers normalized tokens —
    BasicTransformerBlock3D axis_name path) must match the single-device
    pipeline numerically."""

    @pytest.mark.slow
    @pytest.mark.parametrize("n_dev", [2, 4])
    def test_matches_unsharded(self, n_dev):
        from g4splat_tpu.parallel.mesh import make_mesh
        from g4splat_tpu.priors.see3d import TINY_UNET

        F, h, w, steps = 4, 8, 8, 3
        unet = MultiViewUNet(TINY_UNET)
        x0 = jnp.zeros((F, h, w, TINY_UNET.in_channels))
        t0 = jnp.zeros(F, jnp.int32)
        c0 = jnp.zeros((F, 4, TINY_UNET.context_dim))
        params = unet.init(jax.random.PRNGKey(0), x0, t0, c0, num_frames=F)
        params = jax.tree.map(lambda p: p if p.ndim < 2 else p + 0.01, params)
        warp = jax.random.normal(jax.random.PRNGKey(2), (F, h, w, 4))
        masks = jnp.zeros((F, h, w, 1)).at[:, :4].set(1.0)
        ctx = jax.random.normal(jax.random.PRNGKey(4),
                                (F, 4, TINY_UNET.context_dim))
        key = jax.random.PRNGKey(3)

        ref = See3DPipeline(unet, params, DDIMConfig(num_steps=steps))
        out_ref = ref.inpaint_latents(key, warp, masks, ctx, gt_num=1)

        mesh = make_mesh(n_data=n_dev, devices=jax.devices()[:n_dev])
        shd = See3DPipeline(unet, params, DDIMConfig(num_steps=steps),
                            mesh=mesh)
        out_shd = shd.inpaint_latents(key, warp, masks, ctx, gt_num=1)
        np.testing.assert_allclose(np.asarray(out_shd), np.asarray(out_ref),
                                   atol=2e-5)
