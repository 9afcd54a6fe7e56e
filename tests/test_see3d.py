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
    timestep_embedding,
)
from g4splat_tpu.priors.vae import SD_SCALE, AutoencoderKL


class TestUNet:
    def test_forward_shapes(self):
        unet = MultiViewUNet(TINY_UNET)
        F, h, w = 3, 8, 8
        x = jnp.zeros((F, h, w, 8))
        t = jnp.zeros(F, jnp.int32)
        ctx = jnp.zeros((F, 4, TINY_UNET.context_dim))
        params = unet.init(jax.random.PRNGKey(0), x, t, ctx, num_frames=F)
        out = unet.apply(params, x, t, ctx, num_frames=F)
        assert out.shape == (F, h, w, 4)
        # zero-init output conv → exactly zero at init
        assert float(jnp.abs(out).max()) == 0.0

    def test_cross_frame_attention_couples_frames(self):
        # Changing frame 1's input must change frame 0's output (3D attention).
        unet = MultiViewUNet(TINY_UNET)
        F, h, w = 2, 8, 8
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (F, h, w, 8))
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
        assert float(late.mean()) < 0.2

    def test_step_recovers_x0_when_eps_known(self):
        s = DDIMSampler(DDIMConfig(num_steps=10))
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = 500
        xt = s.add_noise(x0, eps, jnp.array([t]))
        x_prev = s.step(eps, t, -1, xt)  # jump straight to t=-1 (a=1)
        np.testing.assert_allclose(np.asarray(x_prev), np.asarray(x0), atol=1e-4)

    def test_timesteps_descending(self):
        s = DDIMSampler(DDIMConfig(num_steps=50))
        assert len(s.timesteps) == 50
        assert (np.diff(s.timesteps) < 0).all()


class TestVAE:
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
    def test_inpaint_preserves_visible_region(self):
        unet = MultiViewUNet(TINY_UNET)
        F, h, w = 2, 8, 8
        x = jnp.zeros((F, h, w, 8))
        t = jnp.zeros(F, jnp.int32)
        ctx = jnp.zeros((F, 4, TINY_UNET.context_dim))
        params = unet.init(jax.random.PRNGKey(0), x, t, ctx, num_frames=F)
        pipe = See3DPipeline(unet, params, DDIMConfig(num_steps=5))
        warp = jax.random.normal(jax.random.PRNGKey(2), (F, h, w, 4))
        masks = jnp.zeros((F, h, w, 1)).at[:, :4].set(1.0)
        out = pipe.inpaint_latents(jax.random.PRNGKey(3), warp, masks, ctx)
        assert out.shape == warp.shape
        # Visible region exactly preserved at the end.
        np.testing.assert_allclose(
            np.asarray(out[:, :4]), np.asarray(warp[:, :4]), atol=1e-6
        )
        # Hidden region differs (generated).
        assert float(jnp.abs(out[:, 4:] - warp[:, 4:]).mean()) > 0.1


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
