"""Segment Anything (SAM) in flax — plane-mask proposal generator.

Faithful port of the external `segment_anything` package the reference
drives through planes/mask_generator.py (reference:
2d-gaussian-splatting/planes/mask_generator.py:10-43,193):

- `ImageEncoder` — ViT with windowed attention, decomposed relative
  positional embeddings (rel_pos_h/rel_pos_w added to attention logits),
  absolute pos_embed, and a conv neck with channel LayerNorm.
- `PromptEncoder` — random-Fourier point encoding + learned per-label point
  embeddings (neg/pos/box-tl/box-br + not-a-point), plus the no-mask dense
  embedding added to the image features.
- `MaskDecoder` — TwoWayTransformer (PE-re-added queries/keys each layer,
  cross-attention at downsample rate 2), 4× upscaling deconvs, per-mask-token
  3-layer ReLU hypernetwork MLPs, 3-layer ReLU IoU head.

Architecture constants match `sam_vit_h`: ViT-H dim 1280 / depth 32 /
heads 16, window 14, global attention every 8th block, prompt/decoder
dim 256. `convert_torch_sam` maps the official torch checkpoint.

Prompting logic mirrors the reference's SuperPrimitive-style
over-segmentation (mask_generator.py:30-43,193): N random point prompts →
3 candidate masks each → keep the SMALLEST stable mask per prompt →
stability ≥ 0.85 + mask-NMS 0.8. `sam_mask_generator` adapts it to the
`PlaneExcavator(mask_generator=…)` hook.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import flax.linen as nn

from g4splat_tpu.priors.vit import gelu_exact
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    encoder_dim: int = 1280         # ViT-H
    encoder_depth: int = 32
    encoder_heads: int = 16
    window_size: int = 14
    global_attn_every: int = 8
    embed_dim: int = 256            # neck / prompt / decoder dim
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    attn_downsample: int = 2        # cross-attention channel downsample
    num_mask_tokens: int = 4        # 1 primary + 3 multimask


TINY_SAM = SAMConfig(
    img_size=64, patch_size=8, encoder_dim=32, encoder_depth=2,
    encoder_heads=2, window_size=4, global_attn_every=2, embed_dim=32,
    decoder_depth=2, decoder_heads=2, decoder_mlp_dim=64, attn_downsample=2,
)


def _rel_pos_bias(q_hw: Tuple[int, int], rel_h, rel_w, q, heads):
    """Decomposed relative position bias (segment_anything
    image_encoder.py::add_decomposed_rel_pos, q_size == k_size here).

    q: (B*, N, C) with N = h*w; rel_h: (2h-1, hd); rel_w: (2w-1, hd).
    Returns bias (B*, heads, N, N)."""
    h, w = q_hw
    hd = rel_h.shape[-1]
    idx_h = jnp.arange(h)[:, None] - jnp.arange(h)[None, :] + (h - 1)
    idx_w = jnp.arange(w)[:, None] - jnp.arange(w)[None, :] + (w - 1)
    Rh = rel_h[idx_h]                       # (h, h, hd)
    Rw = rel_w[idx_w]                       # (w, w, hd)
    B = q.shape[0]
    rq = q.reshape(B, h, w, heads, hd)
    bias_h = jnp.einsum("bhwnc,hkc->bnhwk", rq, Rh)   # (B, heads, h, w, h)
    bias_w = jnp.einsum("bhwnc,wkc->bnhwk", rq, Rw)   # (B, heads, h, w, w)
    bias = bias_h[..., :, None] + bias_w[..., None, :]
    return bias.reshape(B, heads, h * w, h * w)


class EncoderAttention(nn.Module):
    heads: int
    grid: Tuple[int, int]           # (h, w) of the token grid attended over

    @nn.compact
    def __call__(self, x):
        """x: (B*, N, C), N = h*w."""
        B, N, C = x.shape
        hd = C // self.heads
        h, w = self.grid
        qkv = nn.Dense(3 * C, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, self.heads, hd)
        rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * h - 1, hd))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * w - 1, hd))
        bias = _rel_pos_bias((h, w), rel_h, rel_w,
                             q.reshape(B, N, C), self.heads)
        k = k.reshape(B, N, self.heads, hd)
        v = v.reshape(B, N, self.heads, hd)
        logits = jnp.einsum("bqnc,bknc->bnqk", q, k) / np.sqrt(hd) + bias
        att = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bnqk,bknc->bqnc", att, v).reshape(B, N, C)
        return nn.Dense(C, name="proj")(out)


class WindowBlock(nn.Module):
    heads: int
    window: int          # 0 = global attention

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) token grid."""
        B, H, W, C = x.shape
        h = nn.LayerNorm(name="norm1")(x)
        if self.window > 0:
            w = self.window
            ph = (-H) % w
            pw = (-W) % w
            h = jnp.pad(h, ((0, 0), (0, ph), (0, pw), (0, 0)))
            Hp, Wp = H + ph, W + pw
            h = h.reshape(B, Hp // w, w, Wp // w, w, C)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)
            grid = (w, w)
        else:
            h = h.reshape(B, H * W, C)
            grid = (H, W)

        att = EncoderAttention(self.heads, grid, name="attn")(h)

        if self.window > 0:
            w = self.window
            Hp, Wp = H + (-H) % w, W + (-W) % w
            att = att.reshape(B, Hp // w, Wp // w, w, w, C)
            att = att.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
            att = att[:, :H, :W]
        else:
            att = att.reshape(B, H, W, C)
        x = x + att
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(4 * C, name="mlp_fc1")(h)
        h = gelu_exact(h)
        h = nn.Dense(C, name="mlp_fc2")(h)
        return x + h


class ImageEncoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        p = cfg.patch_size
        h = nn.Conv(cfg.encoder_dim, (p, p), strides=(p, p), name="patch_embed")(x)
        gh, gw = h.shape[1], h.shape[2]
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, cfg.img_size // p, cfg.img_size // p, cfg.encoder_dim),
        )
        if (gh, gw) != pos.shape[1:3]:
            pos = jax.image.resize(pos, (1, gh, gw, cfg.encoder_dim), "bilinear")
        h = h + pos
        for i in range(cfg.encoder_depth):
            global_attn = (i + 1) % cfg.global_attn_every == 0
            h = WindowBlock(
                cfg.encoder_heads, 0 if global_attn else cfg.window_size,
                name=f"block_{i}",
            )(h)
        # Neck: 1×1 + 3×3 convs with (channel-)LayerNorm to embed_dim.
        # torch LayerNorm2d carries no elementwise default eps 1e-6.
        h = nn.Conv(cfg.embed_dim, (1, 1), use_bias=False, name="neck_conv1")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="neck_ln1")(h)
        h = nn.Conv(cfg.embed_dim, (3, 3), padding=1, use_bias=False,
                    name="neck_conv2")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="neck_ln2")(h)
        return h


class PromptEncoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, points: jnp.ndarray, labels: jnp.ndarray,
                 grid: Tuple[int, int]):
        """points: (B, P, 2) xy normalized to [0, 1] (already +0.5-pixel
        centered by the caller); labels: (B, P) 1=fg, 0=bg, -1=pad.
        Returns (sparse (B, P+1, D), dense PE grid (gh, gw, D),
        no_mask dense embedding (D,)).

        Matches segment_anything prompt_encoder.py::PromptEncoder._embed_points
        incl. the pad point appended when no box prompt is given."""
        cfg = self.cfg
        D = cfg.embed_dim
        gauss = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, D // 2)
        )

        def pe(coords):
            proj = (2.0 * coords - 1.0) @ gauss * (2 * np.pi)
            return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

        # point_embeddings[0]=neg, [1]=pos ([2],[3] are box corners, kept for
        # checkpoint parity but unused by the point-prompt path).
        pt_embeds = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, D)
        )
        not_a_point = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (D,)
        )
        no_mask = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (D,)
        )

        B = points.shape[0]
        # Pad with a (0,0) not-a-point entry (no box prompt).
        points = jnp.concatenate(
            [points, jnp.zeros((B, 1, 2), points.dtype)], axis=1
        )
        labels = jnp.concatenate(
            [labels, jnp.full((B, 1), -1.0, labels.dtype)], axis=1
        )
        sparse = pe(points)
        lab = labels[..., None]
        sparse = jnp.where(lab == -1, not_a_point, sparse)
        sparse = jnp.where(lab == 0, sparse + pt_embeds[0], sparse)
        sparse = jnp.where(lab == 1, sparse + pt_embeds[1], sparse)

        gh, gw = grid
        ys = (jnp.arange(gh) + 0.5) / gh
        xs = (jnp.arange(gw) + 0.5) / gw
        gxy = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)
        return sparse, pe(gxy), no_mask


class DownsampledAttention(nn.Module):
    """Attention with separate q/k/v/out projections and optional channel
    downsampling (segment_anything transformer.py::Attention)."""
    heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        C = q.shape[-1]
        ci = C // self.downsample
        hd = ci // self.heads
        B, N, _ = q.shape
        M = k.shape[1]
        qq = nn.Dense(ci, name="q_proj")(q).reshape(B, N, self.heads, hd)
        kk = nn.Dense(ci, name="k_proj")(k).reshape(B, M, self.heads, hd)
        vv = nn.Dense(ci, name="v_proj")(v).reshape(B, M, self.heads, hd)
        o = jax.nn.dot_product_attention(qq, kk, vv).reshape(B, N, ci)
        return nn.Dense(C, name="out_proj")(o)


class TwoWayBlock(nn.Module):
    """segment_anything transformer.py::TwoWayAttentionBlock."""
    cfg: SAMConfig
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        if self.skip_first_layer_pe:
            queries = DownsampledAttention(cfg.decoder_heads, 1,
                                           name="self_attn")(
                queries, queries, queries
            )
        else:
            q = queries + query_pe
            queries = queries + DownsampledAttention(
                cfg.decoder_heads, 1, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampledAttention(
            cfg.decoder_heads, cfg.attn_downsample,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)

        h = nn.Dense(cfg.decoder_mlp_dim, name="mlp_lin1")(queries)
        queries = queries + nn.Dense(
            queries.shape[-1], name="mlp_lin2")(gelu_exact(h))
        queries = nn.LayerNorm(name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampledAttention(
            cfg.decoder_heads, cfg.attn_downsample,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, img_embed, img_pe, sparse_prompt, dense_embed):
        """img_embed: (B, gh, gw, D); sparse_prompt: (B, P, D); dense_embed:
        (D,) no-mask embedding broadcast over the image grid.
        Returns (masks (B, num_mask_tokens, 4·gh, 4·gw), iou (B, M))."""
        cfg = self.cfg
        D = cfg.embed_dim
        B, gh, gw, _ = img_embed.shape
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, D))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (cfg.num_mask_tokens, D)
        )
        tok = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(tok[None], (B,) + tok.shape), sparse_prompt], 1
        )
        img = (img_embed + dense_embed).reshape(B, gh * gw, D)
        pe = jnp.broadcast_to(img_pe.reshape(1, gh * gw, D), img.shape)

        queries, keys = tokens, img
        for i in range(cfg.decoder_depth):
            queries, keys = TwoWayBlock(
                cfg, skip_first_layer_pe=(i == 0), name=f"block_{i}"
            )(queries, keys, tokens, pe)
        q = queries + tokens
        k = keys + pe
        queries = queries + DownsampledAttention(
            cfg.decoder_heads, cfg.attn_downsample,
            name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="norm_final_attn")(queries)

        iou_tok = queries[:, 0]
        mask_toks = queries[:, 1 : 1 + cfg.num_mask_tokens]

        # Upscale image features 4× and predict masks via hypernetworks.
        src = keys.reshape(B, gh, gw, D)
        src = nn.ConvTranspose(D // 4, (2, 2), strides=(2, 2), name="up1")(src)
        src = gelu_exact(nn.LayerNorm(epsilon=1e-6, name="up_ln")(src))
        src = nn.ConvTranspose(D // 8, (2, 2), strides=(2, 2), name="up2")(src)
        src = gelu_exact(src)

        hyper = []
        for m in range(cfg.num_mask_tokens):
            h = mask_toks[:, m]
            h = nn.relu(nn.Dense(D, name=f"hyper_{m}_fc1")(h))
            h = nn.relu(nn.Dense(D, name=f"hyper_{m}_fc2")(h))
            h = nn.Dense(D // 8, name=f"hyper_{m}_fc3")(h)
            hyper.append(h)
        hyper = jnp.stack(hyper, axis=1)            # (B, M, D/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, src)

        iou = nn.relu(nn.Dense(D, name="iou_fc1")(iou_tok))
        iou = nn.relu(nn.Dense(D, name="iou_fc2")(iou))
        iou = nn.Dense(cfg.num_mask_tokens, name="iou_fc3")(iou)
        return masks, iou


class SAM(nn.Module):
    cfg: SAMConfig = SAMConfig()

    def setup(self):
        self.image_encoder = ImageEncoder(self.cfg, name="image_encoder")
        self.prompt_encoder = PromptEncoder(self.cfg, name="prompt_encoder")
        self.mask_decoder = MaskDecoder(self.cfg, name="mask_decoder")

    def encode_image(self, img):
        return self.image_encoder(img)

    def decode(self, img_embed, points, labels):
        gh, gw = img_embed.shape[1:3]
        sparse, dense_pe, no_mask = self.prompt_encoder(
            points, labels, (gh, gw)
        )
        return self.mask_decoder(img_embed, dense_pe, sparse, no_mask)

    def __call__(self, img, points, labels):
        emb = self.encode_image(img)
        return self.decode(emb, points, labels)


# ----------------------------------------------------------- weight loading
def _lin(state, prefix):
    return {"kernel": np.asarray(state[prefix + ".weight"]).T,
            "bias": np.asarray(state[prefix + ".bias"])}


def _ln(state, prefix):
    return {"scale": np.asarray(state[prefix + ".weight"]),
            "bias": np.asarray(state[prefix + ".bias"])}


def _conv(state, prefix, bias=True):
    out = {"kernel": np.asarray(state[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = np.asarray(state[prefix + ".bias"])
    return out


def _deconv(state, prefix):
    # torch ConvTranspose2d (in, out, kh, kw) → flax (kh, kw, in, out) with a
    # spatial flip (flax's ConvTranspose is a direct lhs-dilated conv, torch's
    # is the gradient-derived transpose).
    w = np.asarray(state[prefix + ".weight"])
    return {"kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1].copy(),
            "bias": np.asarray(state[prefix + ".bias"])}


def _attn_ds(state, prefix):
    return {n: _lin(state, f"{prefix}.{n}") for n in
            ("q_proj", "k_proj", "v_proj", "out_proj")}


def _twoway_block(state, pre):
    blk = {
        "self_attn": _attn_ds(state, pre + "self_attn"),
        "cross_attn_token_to_image": _attn_ds(
            state, pre + "cross_attn_token_to_image"),
        "cross_attn_image_to_token": _attn_ds(
            state, pre + "cross_attn_image_to_token"),
        "mlp_lin1": _lin(state, pre + "mlp.lin1"),
        "mlp_lin2": _lin(state, pre + "mlp.lin2"),
    }
    for n in ("norm1", "norm2", "norm3", "norm4"):
        blk[n] = _ln(state, pre + n)
    return blk


def convert_torch_sam(state: Dict, cfg: SAMConfig = SAMConfig()) -> Dict:
    """Official `sam_vit_h` torch checkpoint (numpy-valued state dict) → flax
    params for this module. The unused mask-prompt downscaling convs
    (`prompt_encoder.mask_downscaling.*`) are read and dropped — our pipeline
    only ever issues point prompts (reference mask_generator.py:30-43)."""
    enc = {
        "patch_embed": _conv(state, "image_encoder.patch_embed.proj"),
        "pos_embed": np.asarray(state["image_encoder.pos_embed"]),
        "neck_conv1": _conv(state, "image_encoder.neck.0", bias=False),
        "neck_ln1": _ln(state, "image_encoder.neck.1"),
        "neck_conv2": _conv(state, "image_encoder.neck.2", bias=False),
        "neck_ln2": _ln(state, "image_encoder.neck.3"),
    }
    for i in range(cfg.encoder_depth):
        pre = f"image_encoder.blocks.{i}."
        enc[f"block_{i}"] = {
            "norm1": _ln(state, pre + "norm1"),
            "norm2": _ln(state, pre + "norm2"),
            "attn": {
                "qkv": _lin(state, pre + "attn.qkv"),
                "proj": _lin(state, pre + "attn.proj"),
                "rel_pos_h": np.asarray(state[pre + "attn.rel_pos_h"]),
                "rel_pos_w": np.asarray(state[pre + "attn.rel_pos_w"]),
            },
            "mlp_fc1": _lin(state, pre + "mlp.lin1"),
            "mlp_fc2": _lin(state, pre + "mlp.lin2"),
        }

    prompt = {
        "pe_gaussian": np.asarray(
            state["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
        ),
        "point_embeddings": np.stack([
            np.asarray(state[f"prompt_encoder.point_embeddings.{i}.weight"])[0]
            for i in range(4)
        ]),
        "not_a_point_embed": np.asarray(
            state["prompt_encoder.not_a_point_embed.weight"])[0],
        "no_mask_embed": np.asarray(
            state["prompt_encoder.no_mask_embed.weight"])[0],
    }
    # Read-and-drop the mask-downscaling tower (keys consumed for coverage).
    for k in list(state):
        if k.startswith("prompt_encoder.mask_downscaling."):
            _ = state[k]

    dec = {
        "iou_token": np.asarray(state["mask_decoder.iou_token.weight"]),
        "mask_tokens": np.asarray(state["mask_decoder.mask_tokens.weight"]),
        "final_attn_token_to_image": _attn_ds(
            state, "mask_decoder.transformer.final_attn_token_to_image"),
        "norm_final_attn": _ln(
            state, "mask_decoder.transformer.norm_final_attn"),
        "up1": _deconv(state, "mask_decoder.output_upscaling.0"),
        "up_ln": _ln(state, "mask_decoder.output_upscaling.1"),
        "up2": _deconv(state, "mask_decoder.output_upscaling.3"),
    }
    for i in range(cfg.decoder_depth):
        dec[f"block_{i}"] = _twoway_block(
            state, f"mask_decoder.transformer.layers.{i}.")
    for m in range(cfg.num_mask_tokens):
        pre = f"mask_decoder.output_hypernetworks_mlps.{m}.layers"
        for j in range(3):
            dec[f"hyper_{m}_fc{j + 1}"] = _lin(state, f"{pre}.{j}")
    for j in range(3):
        dec[f"iou_fc{j + 1}"] = _lin(
            state, f"mask_decoder.iou_prediction_head.layers.{j}")

    return {"params": {
        "image_encoder": enc,
        "prompt_encoder": prompt,
        "mask_decoder": dec,
    }}


# ------------------------------------------------------------- prompt driver
def stability_score(logits: np.ndarray, offset: float = 1.0) -> np.ndarray:
    """IoU between thresholds ±offset (segment_anything stability score)."""
    hi = (logits > offset).sum(axis=(-2, -1))
    lo = (logits > -offset).sum(axis=(-2, -1))
    return hi / np.maximum(lo, 1)


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / max(union, 1)


class SAMPredictor:
    def __init__(self, cfg: SAMConfig = SAMConfig(), params=None, seed: int = 0):
        self.cfg = cfg
        self.model = SAM(cfg)
        if params is None:
            d = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
            pts = jnp.zeros((1, 1, 2))
            lbl = jnp.ones((1, 1))
            params = self.model.init(jax.random.PRNGKey(seed), d, pts, lbl)
        self.params = params
        self._encode = jax.jit(
            lambda p, img: self.model.apply(p, img, method=self.model.encode_image)
        )
        self._decode = jax.jit(
            lambda p, emb, pts, lbl: self.model.apply(
                p, emb, pts, lbl, method=self.model.decode
            )
        )

    def encode_images(self, images: np.ndarray, mesh=None,
                      max_batch: int = 2) -> jnp.ndarray:
        """Batch-encode a (V, H, W, 3) view stack → (V, …) embeddings.

        One ViT dispatch per slab instead of V (the encoder is SAM's heavy
        half); with `mesh`, the view axis shards over the mesh's `data`
        axis like DepthAnything.infer_images. ``max_batch`` is PER DEVICE:
        each ViT-H global-attention layer at 1024px materialises
        16*4096^2 logits + the same-shape rel-pos bias per view (~2.2 GB
        f32) — slabs of 2 keep the encoder under ~6 GB so it coexists with
        the other stage priors on a 16 GB chip (measured OOM at 5 views)."""
        V = len(images)
        S = self.cfg.img_size
        x = jax.image.resize(
            jnp.asarray(np.asarray(images, np.float32)), (V, S, S, 3),
            "bilinear")
        outs = []
        for i in range(0, V, max_batch):
            sl = x[i : i + max_batch]
            pad = 0
            if mesh is not None:
                n_data = mesh.shape["data"]
                pad = (-sl.shape[0]) % n_data
                if pad:
                    sl = jnp.concatenate(
                        [sl, jnp.tile(sl[-1:], (pad, 1, 1, 1))])
                sl = jax.device_put(
                    sl,
                    jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec("data")),
                )
            emb = self._encode(self.params, sl)
            outs.append(emb[: emb.shape[0] - pad] if pad else emb)
        return jnp.concatenate(outs)

    def generate_masks(
        self,
        image: np.ndarray,                 # (H, W, 3) in [0, 1]
        num_prompts: int = 256,
        stability_thresh: float = 0.85,
        nms_iou: float = 0.8,
        select_smallest: bool = True,
        seed: int = 0,
        prompt_batch: int = 64,
        emb: Optional[jnp.ndarray] = None,  # precomputed (1, …) embedding
    ) -> List[np.ndarray]:
        """Reference prompting (mask_generator.py:30-43,193): random point
        prompts, smallest stable mask per prompt, stability + NMS filters."""
        H, W = image.shape[:2]
        S = self.cfg.img_size
        if emb is None:
            img = jax.image.resize(jnp.asarray(image), (S, S, 3), "bilinear")
            emb = self._encode(self.params, img[None])

        rng = np.random.default_rng(seed)
        pts = rng.random((num_prompts, 2)).astype(np.float32)  # normalized xy
        candidates = []
        for s in range(0, num_prompts, prompt_batch):
            batch = jnp.asarray(pts[s : s + prompt_batch])[:, None, :]
            n = batch.shape[0]
            embs = jnp.broadcast_to(emb, (n,) + emb.shape[1:])
            logits, iou = self._decode(
                self.params, embs, batch, jnp.ones((n, 1))
            )
            logits = np.asarray(logits)           # (n, M, h, w)
            stab = stability_score(logits)        # (n, M)
            for bi in range(n):
                order = range(logits.shape[1])
                areas = [(logits[bi, m] > 0).sum() for m in order]
                if select_smallest:
                    valid = [m for m in order
                             if stab[bi, m] >= stability_thresh and areas[m] > 0]
                    if not valid:
                        continue
                    m = min(valid, key=lambda m: areas[m])
                else:
                    m = int(np.argmax(np.asarray(iou)[bi]))
                    if stab[bi, m] < stability_thresh or areas[m] == 0:
                        continue
                candidates.append(logits[bi, m] > 0)

        # NMS by mask IoU, largest-first (greedy).
        candidates.sort(key=lambda m: -m.sum())
        kept: List[np.ndarray] = []
        for c in candidates:
            if all(mask_iou(c, k) < nms_iou for k in kept):
                kept.append(c)
        # Resize back to the input resolution.
        out = []
        for m in kept:
            mm = jax.image.resize(
                jnp.asarray(m, jnp.float32), (H, W), "nearest"
            )
            out.append(np.asarray(mm) > 0.5)
        return out


def sam_mask_generator(predictor: SAMPredictor, **kw) -> Callable:
    """Adapter for PlaneExcavator(mask_generator=…).

    The returned callable also carries a ``.batch(images, mesh=None)``
    method: encoder runs once over the whole view stack (mesh-sharded when
    given), prompting/NMS per view — the orchestrator uses it when present.
    """
    def gen(image: np.ndarray) -> List[np.ndarray]:
        return predictor.generate_masks(image, **kw)

    def gen_batch(images: np.ndarray, mesh=None) -> List[List[np.ndarray]]:
        embs = predictor.encode_images(images, mesh=mesh)
        return [
            predictor.generate_masks(images[v], emb=embs[v : v + 1], **kw)
            for v in range(len(images))
        ]

    gen.batch = gen_batch
    return gen
