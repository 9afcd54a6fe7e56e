"""Segment Anything (SAM) in flax — plane-mask proposal generator.

Port of the external `segment_anything` package the reference drives through
planes/mask_generator.py: a ViT image encoder with windowed attention +
conv neck, a point-prompt encoder (random-Fourier positional encoding +
learned point-type embeddings), and the two-way-transformer mask decoder
(mask tokens ↔ image-embedding cross attention, hypernetwork MLPs over
upscaled features, IoU prediction head).

Prompting logic mirrors the reference's SuperPrimitive-style
over-segmentation (mask_generator.py:10-43,193): N random point prompts →
3 candidate masks each → keep the SMALLEST stable mask per prompt →
stability ≥ 0.85 + mask-NMS 0.8. `sam_mask_generator` adapts it to the
`PlaneExcavator(mask_generator=…)` hook.

Weights (ViT-H checkpoint) are a deployment artifact; tiny configs keep the
whole path exercisable.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Optional, Tuple

import flax.linen as nn
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
    num_mask_tokens: int = 4        # 1 primary + 3 multimask


TINY_SAM = SAMConfig(
    img_size=64, patch_size=8, encoder_dim=32, encoder_depth=2,
    encoder_heads=2, window_size=4, global_attn_every=2, embed_dim=32,
    decoder_depth=1, decoder_heads=2,
)


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
        else:
            h = h.reshape(B, H * W, C)

        qkv = nn.Dense(3 * C, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = C // self.heads
        n = h.shape[1]
        q = q.reshape(-1, n, self.heads, hd)
        k = k.reshape(-1, n, self.heads, hd)
        v = v.reshape(-1, n, self.heads, hd)
        att = jax.nn.dot_product_attention(q, k, v).reshape(-1, n, C)
        att = nn.Dense(C, name="proj")(att)

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
        h = nn.gelu(h)
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
        h = h + jax.image.resize(
            pos, (1, gh, gw, cfg.encoder_dim), "bilinear"
        )
        for i in range(cfg.encoder_depth):
            global_attn = (i + 1) % cfg.global_attn_every == 0
            h = WindowBlock(
                cfg.encoder_heads, 0 if global_attn else cfg.window_size,
                name=f"block_{i}",
            )(h)
        # Neck: 1×1 + 3×3 convs with (channel-)LayerNorm to embed_dim.
        h = nn.Conv(cfg.embed_dim, (1, 1), use_bias=False, name="neck_conv1")(h)
        h = nn.LayerNorm(name="neck_ln1")(h)
        h = nn.Conv(cfg.embed_dim, (3, 3), padding=1, use_bias=False,
                    name="neck_conv2")(h)
        h = nn.LayerNorm(name="neck_ln2")(h)
        return h


class PromptEncoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, points: jnp.ndarray, labels: jnp.ndarray,
                 grid: Tuple[int, int]):
        """points: (B, P, 2) normalized to [0, 1]; labels: (B, P) 1=fg, 0=bg.
        Returns (sparse (B, P, D), dense positional grid (gh, gw, D))."""
        cfg = self.cfg
        D = cfg.embed_dim
        gauss = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, D // 2)
        )

        def pe(coords):
            proj = (2.0 * coords - 1.0) @ gauss * (2 * np.pi)
            return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

        fg = self.param("fg_embed", nn.initializers.normal(1.0), (D,))
        bg = self.param("bg_embed", nn.initializers.normal(1.0), (D,))
        sparse = pe(points) + jnp.where(labels[..., None] > 0, fg, bg)

        gh, gw = grid
        ys = (jnp.arange(gh) + 0.5) / gh
        xs = (jnp.arange(gw) + 0.5) / gw
        gxy = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)
        return sparse, pe(gxy)


class TwoWayBlock(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, tokens, img, img_pe):
        C = tokens.shape[-1]

        def attn(q, k, v, name):
            hd = C // self.heads
            B, N, _ = q.shape
            M = k.shape[1]
            qq = nn.Dense(C, name=f"{name}_q")(q).reshape(B, N, self.heads, hd)
            kk = nn.Dense(C, name=f"{name}_k")(k).reshape(B, M, self.heads, hd)
            vv = nn.Dense(C, name=f"{name}_v")(v).reshape(B, M, self.heads, hd)
            o = jax.nn.dot_product_attention(qq, kk, vv).reshape(B, N, C)
            return nn.Dense(C, name=f"{name}_out")(o)

        tokens = nn.LayerNorm(name="ln1")(
            tokens + attn(tokens, tokens, tokens, "self")
        )
        tokens = nn.LayerNorm(name="ln2")(
            tokens + attn(tokens, img + img_pe, img, "t2i")
        )
        h = nn.Dense(4 * C, name="mlp_fc1")(tokens)
        tokens = nn.LayerNorm(name="ln3")(
            tokens + nn.Dense(C, name="mlp_fc2")(nn.gelu(h))
        )
        img = nn.LayerNorm(name="ln4")(
            img + attn(img + img_pe, tokens, tokens, "i2t")
        )
        return tokens, img


class MaskDecoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, img_embed, img_pe, sparse_prompt):
        """img_embed: (B, gh, gw, D); sparse_prompt: (B, P, D).
        Returns (masks (B, num_mask_tokens, 4·gh, 4·gw), iou (B, num_mask_tokens))."""
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
        img = img_embed.reshape(B, gh * gw, D)
        pe = jnp.broadcast_to(img_pe.reshape(1, gh * gw, D), img.shape)
        for i in range(cfg.decoder_depth):
            tokens, img = TwoWayBlock(cfg.decoder_heads, name=f"block_{i}")(
                tokens, img, pe
            )
        # Final token-to-image attention.
        tokens2, _ = TwoWayBlock(cfg.decoder_heads, name="final")(tokens, img, pe)
        iou_tok = tokens2[:, 0]
        mask_toks = tokens2[:, 1 : 1 + cfg.num_mask_tokens]

        # Upscale image features 4× and predict masks via hypernetworks.
        src = img.reshape(B, gh, gw, D)
        src = nn.ConvTranspose(D // 4, (2, 2), strides=(2, 2), name="up1")(src)
        src = nn.gelu(nn.LayerNorm(name="up_ln")(src))
        src = nn.ConvTranspose(D // 8, (2, 2), strides=(2, 2), name="up2")(src)
        src = nn.gelu(src)

        hyper = []
        for m in range(cfg.num_mask_tokens):
            h = mask_toks[:, m]
            h = nn.gelu(nn.Dense(D, name=f"hyper_{m}_fc1")(h))
            h = nn.Dense(D // 8, name=f"hyper_{m}_fc2")(h)
            hyper.append(h)
        hyper = jnp.stack(hyper, axis=1)            # (B, M, D/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, src)

        iou = nn.gelu(nn.Dense(D, name="iou_fc1")(iou_tok))
        iou = nn.Dense(cfg.num_mask_tokens, name="iou_fc2")(iou)
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
        sparse, dense_pe = self.prompt_encoder(points, labels, (gh, gw))
        return self.mask_decoder(img_embed, dense_pe, sparse)

    def __call__(self, img, points, labels):
        emb = self.encode_image(img)
        return self.decode(emb, points, labels)


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

    def generate_masks(
        self,
        image: np.ndarray,                 # (H, W, 3) in [0, 1]
        num_prompts: int = 256,
        stability_thresh: float = 0.85,
        nms_iou: float = 0.8,
        select_smallest: bool = True,
        seed: int = 0,
        prompt_batch: int = 64,
    ) -> List[np.ndarray]:
        """Reference prompting (mask_generator.py:30-43,193): random point
        prompts, smallest stable mask per prompt, stability + NMS filters."""
        H, W = image.shape[:2]
        S = self.cfg.img_size
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
    """Adapter for PlaneExcavator(mask_generator=…)."""
    def gen(image: np.ndarray) -> List[np.ndarray]:
        return predictor.generate_masks(image, **kw)
    return gen
