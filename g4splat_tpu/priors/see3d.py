"""See3D multi-view diffusion inpainting (flax).

TPU-native rebuild of the reference's See3D stack
(2d-gaussian-splatting/guidance/See3D_modules/):

- ``MultiViewUNet`` — checkpoint-structured port of ``MultiViewUNetModel``
  (mv_unet.py:614-1003): SD-style UNet whose transformer self-attention runs
  over the tokens of ALL frames jointly ("3D attention",
  mv_unet.py:266-272), cross-attends to CLIP conditioning, ResBlocks with
  timestep embedding, channel-mult pyramid, zero-initialized output
  projections.  Module names mirror the torch state-dict keys so
  ``convert_torch_see3d`` is a mechanical re-layout.
- ``DDIMSampler`` — diffusers ``DDIMScheduler`` semantics as invoked by the
  reference: scaled-linear betas, ``rescale_betas_zero_snr=True`` and
  "trailing" timestep spacing (mv_diffusion.py:44,
  pipeline_mvd_warp_mix_classifier.py:552-555), v-prediction (the only
  numerically sound prediction type under zero terminal SNR).
- ``See3DPipeline`` — the warp-mix inpainting loop of
  pipeline_mvd_warp_mix_classifier.py:511-700: reference ("gt") frames are
  pinned to their clean latents every step, the remaining frames are
  re-mixed with a decay-weighted noised warp encoding, the UNet input is
  [latent(4) | warp-mix(4) | mask(1)] and classifier-free guidance zeroes
  the warp/mask conditioning channels (NOT the context) on the uncond
  branch.

xformers memory-efficient attention becomes jax.nn.dot_product_attention
(XLA flash path).  Pretrained MVD weights are a deployment artifact; tiny
configs keep the whole stack exercisable end-to-end in tests, and
tests/test_see3d_convert.py pins numeric parity of the converter against a
fixture recorded from the vendored reference mv_unet.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ building
def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, cos|sin order (mv_unet.py:42-60)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _gn(groups: int, name: str, eps: float = 1e-5) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=groups, epsilon=eps, name=name)


class CrossAttention(nn.Module):
    """MemoryEfficientCrossAttention (mv_unet.py:139-227), ip_dim=0."""

    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)
        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, M, self.heads, self.dim_head)
        v = v.reshape(B, M, self.heads, self.dim_head)
        from g4splat_tpu.ops.attention import memory_efficient_attention

        out = memory_efficient_attention(q, k, v).reshape(B, N, inner)
        return nn.Dense(x.shape[-1], name="to_out_0")(out)


class BasicTransformerBlock3D(nn.Module):
    """Self-attn over all frames jointly, then per-frame cross-attn + GEGLU
    feed-forward (mv_unet.py:229-272).

    ``axis_name`` shards the frame batch over a mesh axis (See3D denoise
    fan-out): every per-frame op stays local, and the joint attention
    all_gathers the NORMALIZED tokens once so each local query frame
    attends to its own branch's full F*l key/value sequence — numerically
    identical to the single-device reshape (LayerNorm is per-token, so
    normalize-then-gather == gather-then-normalize).
    """

    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, context, num_frames: int, axis_name=None):
        bf, l, c = x.shape
        if axis_name is None:
            b = bf // num_frames
            h = x.reshape(b, num_frames * l, c)
            h = CrossAttention(self.heads, self.dim_head, name="attn1")(
                nn.LayerNorm(name="norm1")(h)
            )
            x = x + h.reshape(bf, l, c)
        else:
            x_n = nn.LayerNorm(name="norm1")(x)
            full = jax.lax.all_gather(x_n, axis_name, axis=0, tiled=True)
            total = full.shape[0]
            b = total // num_frames
            d = jax.lax.axis_index(axis_name)
            g = d * bf + jnp.arange(bf)
            branch = g // num_frames                       # (bf,) local
            kv = full.reshape(b, num_frames * l, c)[branch]
            h = CrossAttention(self.heads, self.dim_head, name="attn1")(
                x_n, kv
            )
            x = x + h
        x = x + CrossAttention(self.heads, self.dim_head, name="attn2")(
            nn.LayerNorm(name="norm2")(x), context
        )
        h = nn.LayerNorm(name="norm3")(x)
        h = nn.Dense(8 * c, name="ff_net_0_proj")(h)
        a, gate = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.gelu(gate, approximate=False)
        x = x + nn.Dense(c, name="ff_net_2")(h)
        return x


class SpatialTransformer3D(nn.Module):
    """mv_unet.py:275-332 — GN + linear proj_in, `depth` transformer blocks,
    zero-init linear proj_out, residual."""

    heads: int
    dim_head: int
    depth: int = 1

    @nn.compact
    def __call__(self, x, context, num_frames: int, axis_name=None):
        B, H, W, C = x.shape
        h = _gn(32, "norm", eps=1e-6)(x).reshape(B, H * W, C)
        h = nn.Dense(self.heads * self.dim_head, name="proj_in")(h)
        for d in range(self.depth):
            h = BasicTransformerBlock3D(
                self.heads, self.dim_head, name=f"transformer_blocks_{d}"
            )(h, context, num_frames, axis_name=axis_name)
        h = nn.Dense(C, kernel_init=nn.initializers.zeros, name="proj_out")(h)
        return x + h.reshape(B, H, W, C)


class ResBlock(nn.Module):
    """mv_unet.py:514-612 (up/down=False, the checkpoint configuration)."""

    out_ch: int
    use_scale_shift_norm: bool = False

    @nn.compact
    def __call__(self, x, emb):
        h = nn.silu(_gn(32, "in_layers_0")(x))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="in_layers_2")(h)
        e_dim = 2 * self.out_ch if self.use_scale_shift_norm else self.out_ch
        e = nn.Dense(e_dim, name="emb_layers_1")(nn.silu(emb))
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e[:, None, None, :], 2, axis=-1)
            h = _gn(32, "out_layers_0")(h) * (1 + scale) + shift
        else:
            h = h + e[:, None, None, :]
            h = _gn(32, "out_layers_0")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros, name="out_layers_3")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="skip_connection")(x)
        return x + h


class Downsample(nn.Module):
    """mv_unet.py:480-512 (use_conv=True): stride-2 conv named ``op``."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_ch, (3, 3), strides=(2, 2), padding=1,
                       name="op")(x)


class Upsample(nn.Module):
    """mv_unet.py:447-477: nearest x2 + conv named ``conv``."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), "nearest")
        return nn.Conv(self.out_ch, (3, 3), padding=1, name="conv")(x)


@dataclass(frozen=True)
class UNetConfig:
    """Mirrors the MultiViewUNetModel constructor (mv_unet.py:644-700).

    ``attention_resolutions`` holds downsample factors (ds values), exactly
    like the torch ``attention_resolutions`` argument.  The See3D "sparse"
    checkpoint is the MVDream SD-2.1 configuration with 9 input channels
    (4 latent + 4 warp-mix + 1 mask,
    pipeline_mvd_warp_mix_classifier.py:660-664).
    """

    in_channels: int = 9
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    num_heads: int = -1
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    camera_dim: Optional[int] = 16
    use_scale_shift_norm: bool = False

    def heads_for(self, ch: int) -> Tuple[int, int]:
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels


TINY_UNET = UNetConfig(
    in_channels=9, out_channels=4, model_channels=32,
    channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(1, 2),
    num_heads=-1, num_head_channels=16, context_dim=16, camera_dim=None,
)


class MultiViewUNet(nn.Module):
    """Checkpoint-structured MultiViewUNetModel (mv_unet.py:614-1003).

    Inputs are NHWC; ``x``: (B*F, h, w, in_ch), ``t``: (B*F,), ``context``:
    (B*F, M, context_dim), optional ``camera``: (B*F, camera_dim).
    """

    cfg: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, x, t, context, num_frames: int, camera=None,
                 axis_name=None):
        cfg = self.cfg
        temb = timestep_embedding(t, cfg.model_channels)
        emb = nn.Dense(4 * cfg.model_channels, name="time_embed_0")(temb)
        emb = nn.Dense(4 * cfg.model_channels, name="time_embed_2")(
            nn.silu(emb))
        if camera is not None:
            ce = nn.Dense(4 * cfg.model_channels, name="camera_embed_0")(
                camera)
            emb = emb + nn.Dense(4 * cfg.model_channels,
                                 name="camera_embed_2")(nn.silu(ce))

        ssn = cfg.use_scale_shift_norm
        hs = []
        h = nn.Conv(cfg.model_channels, (3, 3), padding=1,
                    name="input_blocks_0_0")(x)
        hs.append(h)
        ds, idx = 1, 1
        for level, mult in enumerate(cfg.channel_mult):
            ch = cfg.model_channels * mult
            for _ in range(cfg.num_res_blocks):
                h = ResBlock(ch, ssn, name=f"input_blocks_{idx}_0")(h, emb)
                if ds in cfg.attention_resolutions:
                    heads, dim_head = cfg.heads_for(ch)
                    h = SpatialTransformer3D(
                        heads, dim_head, cfg.transformer_depth,
                        name=f"input_blocks_{idx}_1",
                    )(h, context, num_frames, axis_name=axis_name)
                hs.append(h)
                idx += 1
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, name=f"input_blocks_{idx}_0")(h)
                hs.append(h)
                ds *= 2
                idx += 1

        ch = cfg.model_channels * cfg.channel_mult[-1]
        heads, dim_head = cfg.heads_for(ch)
        h = ResBlock(ch, ssn, name="middle_block_0")(h, emb)
        h = SpatialTransformer3D(heads, dim_head, cfg.transformer_depth,
                                 name="middle_block_1")(
            h, context, num_frames, axis_name=axis_name)
        h = ResBlock(ch, ssn, name="middle_block_2")(h, emb)

        idx = 0
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            ch = cfg.model_channels * mult
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(ch, ssn, name=f"output_blocks_{idx}_0")(h, emb)
                j = 1
                if ds in cfg.attention_resolutions:
                    heads, dim_head = cfg.heads_for(ch)
                    h = SpatialTransformer3D(
                        heads, dim_head, cfg.transformer_depth,
                        name=f"output_blocks_{idx}_{j}",
                    )(h, context, num_frames, axis_name=axis_name)
                    j += 1
                if level and i == cfg.num_res_blocks:
                    h = Upsample(ch, name=f"output_blocks_{idx}_{j}")(h)
                    ds //= 2
                idx += 1

        h = nn.silu(_gn(32, "out_0")(h))
        return nn.Conv(cfg.out_channels, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros, name="out_2")(h)


# ------------------------------------------------------------ weight loading
_KEY_REWRITES = (
    ("in_layers.0", "in_layers_0"), ("in_layers.2", "in_layers_2"),
    ("emb_layers.1", "emb_layers_1"), ("out_layers.0", "out_layers_0"),
    ("out_layers.3", "out_layers_3"),
    ("ff.net.0.proj", "ff_net_0_proj"), ("ff.net.2", "ff_net_2"),
    ("to_out.0", "to_out_0"),
    ("time_embed.0", "time_embed_0"), ("time_embed.2", "time_embed_2"),
    ("camera_embed.0", "camera_embed_0"),
    ("camera_embed.2", "camera_embed_2"),
)


def _torch_key_to_path(key: str) -> Optional[Tuple[str, ...]]:
    """Map a torch state-dict key to a flax param path (module names as the
    flax model declares them, leaf renamed to kernel/bias/scale later)."""
    for old, new in _KEY_REWRITES:
        key = key.replace(old + ".", new + ".")
    parts = key.split(".")
    # Collapse container indices: input_blocks.3.0.op -> input_blocks_3_0, op
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("input_blocks", "output_blocks"):
            out.append(f"{p}_{parts[i + 1]}_{parts[i + 2]}")
            i += 3
        elif p == "middle_block":
            out.append(f"middle_block_{parts[i + 1]}")
            i += 2
        elif p == "out" and parts[i + 1] in ("0", "2"):
            out.append(f"out_{parts[i + 1]}")
            i += 2
        elif p == "transformer_blocks":
            out.append(f"transformer_blocks_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out)


def _assign(tree: dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_param(path: Tuple[str, ...], value: np.ndarray):
    """Generic torch->flax leaf transform keyed on tensor rank:
    conv (O,I,kh,kw)->(kh,kw,I,O); linear (O,I)->(I,O); norm weight->scale."""
    leaf = path[-1]
    v = np.asarray(value, np.float32)
    if leaf == "bias":
        return path, v
    if leaf != "weight":
        return None
    if v.ndim == 4:
        return path[:-1] + ("kernel",), v.transpose(2, 3, 1, 0)
    if v.ndim == 2:
        return path[:-1] + ("kernel",), v.T
    return path[:-1] + ("scale",), v


def convert_torch_see3d(state_dict, cfg: UNetConfig = UNetConfig()):
    """Convert a MultiViewUNetModel torch state dict (the MVD ``unet``
    checkpoint, mv_diffusion.py:29-33) to flax params for MultiViewUNet.

    Skips camera_embed keys when cfg.camera_dim is None and the label/ip
    branches the See3D checkpoints never populate.
    """
    params: dict = {}
    for k in state_dict.keys() if hasattr(state_dict, "keys") else state_dict:
        if cfg.camera_dim is None and k.startswith("camera_embed."):
            continue
        path = _torch_key_to_path(k)
        converted = convert_param(path, state_dict[k])
        if converted is not None:
            _assign(params, converted[0], jnp.asarray(converted[1]))
    return {"params": params}


# --------------------------------------------------------------------- DDIM
def custom_decay_function_weight(t: jnp.ndarray) -> jnp.ndarray:
    """Warp-mix decay weight (pipeline_mvd_warp_mix_classifier.py:27-51)."""
    t = t.astype(jnp.float32)
    t_peak, t_end, v_end = 200.0, 60.0, 0.8
    slow = 1.0 - (1.0 - v_end) * (t_peak - t) / (t_peak - t_end)
    fast = v_end * jnp.exp(-0.075 * (t_end - t))
    return jnp.clip(jnp.where(t >= t_end, slow, fast), 0.0, 1.0)


@dataclass
class DDIMConfig:
    num_train_timesteps: int = 1000
    num_steps: int = 50
    guidance_scale: float = 2.0
    beta_start: float = 0.00085
    beta_end: float = 0.012
    rescale_zero_snr: bool = True
    # 'v' (SD-2.1-v, required under zero terminal SNR) or 'epsilon'.
    prediction_type: str = "v"
    # 'trailing' (the reference override) or 'leading' (diffusers default).
    timestep_spacing: str = "trailing"
    # CFG rescale toward the cond branch's per-frame std (fixes
    # overexposure; arXiv 2305.08891 §3.4). The reference implements it at
    # pipeline_mvd_warp_mix_classifier.py:53-63 and applies it to the
    # combined prediction when > 0 (:695-697); production runs 0.0
    # (mv_diffusion.py:67).
    guidance_rescale: float = 0.0


class DDIMSampler:
    """Scaled-linear-beta DDIM with the reference's scheduler overrides:
    ``DDIMScheduler.from_config(..., timestep_scaling="trailing",
    rescale_betas_zero_snr=True)`` (mv_diffusion.py:44) and the trailing
    timestep grid built in pipeline_mvd_warp_mix_classifier.py:552-555."""

    def __init__(self, cfg: DDIMConfig = DDIMConfig()):
        self.cfg = cfg
        betas = np.linspace(
            cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
            cfg.num_train_timesteps,
        ) ** 2
        ac = np.cumprod(1.0 - betas)
        if cfg.rescale_zero_snr:
            # diffusers rescale_zero_terminal_snr: shift sqrt(ac) so the
            # terminal value is exactly 0, keeping the first value fixed.
            s = np.sqrt(ac)
            s = (s - s[-1]) * (s[0] / (s[0] - s[-1]))
            ac = s ** 2
        self.alphas_cumprod = jnp.asarray(ac, jnp.float32)
        n = cfg.num_train_timesteps
        if cfg.timestep_spacing == "trailing":
            step = (n - 1) // cfg.num_steps
            self.timesteps = np.round(
                np.arange(n - 1, 0, -step)).astype(np.int64)
        else:
            step = n // cfg.num_steps
            self.timesteps = np.arange(0, n, step)[::-1].copy()
        # diffusers DDIMScheduler.step: prev_timestep = t - n // num_steps.
        self.step_size = n // cfg.num_steps

    def _acp(self, t):
        t = jnp.asarray(t)
        return jnp.where(t >= 0, self.alphas_cumprod[jnp.maximum(t, 0)], 1.0)

    def add_noise(self, x0, noise, t):
        a = self._acp(t)
        while a.ndim < x0.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * noise

    def to_eps_x0(self, model_out, t, x):
        """Resolve the model output into (eps, x0) per prediction type."""
        a_t = self._acp(t)
        while a_t.ndim < x.ndim:
            a_t = a_t[..., None]
        if self.cfg.prediction_type == "v":
            x0 = jnp.sqrt(a_t) * x - jnp.sqrt(1 - a_t) * model_out
            eps = jnp.sqrt(a_t) * model_out + jnp.sqrt(1 - a_t) * x
        else:
            x0 = (x - jnp.sqrt(1 - a_t) * model_out) / jnp.sqrt(
                jnp.maximum(a_t, 1e-12))
            eps = model_out
        return eps, x0

    def step(self, model_out, t, x):
        """One deterministic DDIM step (eta=0) from t to t - step_size."""
        eps, x0 = self.to_eps_x0(model_out, t, x)
        a_prev = self._acp(jnp.asarray(t) - self.step_size)
        while a_prev.ndim < x.ndim:
            a_prev = a_prev[..., None]
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps


# ----------------------------------------------------------------- pipeline
class See3DPipeline:
    """Warp-conditioned multi-view inpainting, faithful to
    pipeline_mvd_warp_mix_classifier.py:511-700:

    * frames ``[:gt_num]`` are reference images whose latents are pinned to
      their clean encodings at the start of every step (:640-644);
    * the warp-mix channel is ``w(t/5)·add_noise(img_latents, t/5) +
      (1-w)·latents`` for generated frames (:646-654);
    * UNet input = [latents | warp_mix | mask] (9ch, :660-664);
    * CFG: uncond zeroes the warp-mix and mask channels of generated frames
      while keeping the SAME context (:666-672), combined as
      ``(1+s)·cond - s·uncond`` (:692-694);
    * all cond/uncond frames go through ONE UNet dispatch with
      ``num_frames=F`` so the 3D attention couples each branch's frames.
    """

    def __init__(self, unet: MultiViewUNet, unet_params,
                 ddim: DDIMConfig = DDIMConfig(), mesh=None):
        self.unet = unet
        self.params = unet_params
        self.sampler = DDIMSampler(ddim)
        self.mesh = mesh          # data-axis mesh → sharded denoise
        self._scan = None
        self._scan_key = None

    def _build(self, F: int, shape, ctx_shape):
        sampler, cfg = self.sampler, self.sampler.cfg
        ts = jnp.asarray(sampler.timesteps)
        unet_apply = self.unet.apply

        # Sharded denoise (VERDICT r4 #7): the 2F-frame cond/uncond batch
        # fans out over the mesh's `data` axis — convs/resblocks are
        # frame-local, the joint 3D attention all_gathers normalized tokens
        # per layer (BasicTransformerBlock3D axis_name path), and the DDIM
        # state stays replicated (elementwise math). n=2 is the pure-CFG
        # split (cond|uncond need no cross-frame comm beyond the gather);
        # larger n splits frame groups too.
        n_data = (self.mesh.shape.get("data", 1)
                  if self.mesh is not None else 1)
        if n_data > 1 and (2 * F) % n_data == 0:
            from functools import partial as _partial

            from jax.sharding import PartitionSpec as PS

            @_partial(
                jax.shard_map, mesh=self.mesh,
                in_specs=(PS(), PS("data"), PS("data"), PS("data")),
                out_specs=PS("data"), check_vma=False,
            )
            def unet_go(params, inp, tv, ctx):
                return unet_apply(params, inp, tv, ctx, num_frames=F,
                                  axis_name="data")
        else:
            def unet_go(params, inp, tv, ctx):
                return unet_apply(params, inp, tv, ctx, num_frames=F)

        def run(params, key, img_latents, masks, context, gt_sel):
            ctx2 = jnp.concatenate([context, context], axis=0)

            def body(carry, t):
                x, key = carry
                key, kw = jax.random.split(key)
                # Pin reference frames to their clean latents (:640-644).
                x = gt_sel * img_latents + (1 - gt_sel) * x
                tv = jnp.full((F,), (t // 5).astype(jnp.int32), jnp.int32)
                noisy_warp = sampler.add_noise(
                    img_latents, jax.random.normal(kw, x.shape), tv)
                w = custom_decay_function_weight(tv)[:, None, None, None]
                mix = w * noisy_warp + (1 - w) * x
                mix = gt_sel * img_latents + (1 - gt_sel) * mix

                cond = jnp.concatenate([x, mix, masks], axis=-1)
                unc = jnp.concatenate(
                    [x, gt_sel * img_latents, gt_sel * masks], axis=-1)
                inp = jnp.concatenate([cond, unc], axis=0)
                t_vec = jnp.full((2 * F,), t, jnp.int32)
                out = unet_go(params, inp, t_vec, ctx2)
                s = cfg.guidance_scale
                model_out = (1 + s) * out[:F] - s * out[F:]
                if cfg.guidance_rescale > 0.0:
                    # rescale_noise_cfg (:53-63): pull the CFG output's
                    # per-frame std back toward the cond branch's.
                    cond = out[:F]
                    std_c = jnp.std(cond, axis=(1, 2, 3), keepdims=True)
                    std_g = jnp.std(model_out, axis=(1, 2, 3), keepdims=True)
                    rescaled = model_out * (std_c / jnp.maximum(std_g, 1e-12))
                    gr = cfg.guidance_rescale
                    model_out = gr * rescaled + (1 - gr) * model_out
                x = sampler.step(model_out, t, x)
                return (x, key), None

            key, k0 = jax.random.split(key)
            x = jax.random.normal(k0, shape)
            x = gt_sel * img_latents + (1 - gt_sel) * x
            (x, _), _ = jax.lax.scan(body, (x, key), ts)
            return x

        return jax.jit(run)

    def inpaint_latents(
        self,
        key: jax.Array,
        img_latents: jnp.ndarray,   # (F, h, w, 4) encoded refs + warps
        masks: jnp.ndarray,         # (F, h, w, 1) latent-res, 1 = visible
        context: jnp.ndarray,       # (F, M, context_dim) text+image cond
        gt_num: int = 0,            # leading frames are reference images
    ) -> jnp.ndarray:
        """Returns denoised latents (F, h, w, 4); frames [:gt_num] come back
        as their (re-pinned) clean encodings."""
        F = img_latents.shape[0]
        sig = (F, img_latents.shape, context.shape, int(gt_num))
        if self._scan_key != sig:
            self._scan = self._build(F, img_latents.shape, context.shape)
            self._scan_key = sig
        gt_sel = (jnp.arange(F) < gt_num).astype(jnp.float32)
        gt_sel = gt_sel[:, None, None, None]
        x = self._scan(self.params, key, img_latents, masks, context, gt_sel)
        return gt_sel * img_latents + (1 - gt_sel) * x
