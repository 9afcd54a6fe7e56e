"""MASt3R two-view geometry network (flax).

Port of AsymmetricMASt3R (mast3r/mast3r/model.py + catmlp_dpt_head.py on top
of dust3r's AsymmetricCroCo3DStereo, dust3r/model.py:46-230, croco ViT
blocks): a CroCo ViT-L/16 RoPE encoder shared by both images, two ViT-B
cross-attention decoders (one per image, weights independent), and per-image
heads producing
- dense 3D points in image-1's frame  (norm-direction × expm1 magnitude,
  dust3r/heads/postprocess.py:22-46),
- confidence (1 + exp, :49-57),
- L2-normalized local feature descriptors + descriptor confidence
  (Cat_MLP head: MLP over [enc‖dec] tokens + pixel shuffle,
  catmlp_dpt_head.py:44-100).

The reference's curope CUDA kernel is plain jnp RoPE here (priors/vit.py).
`symmetric_inference` runs both image orderings like the SfM front-end
(mast3r/cloud_opt/sparse_ga.py:629-650). Pair batches are the data-parallel
axis — shard them over the mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from g4splat_tpu.priors.dpt import DPTHead
from g4splat_tpu.priors.vit import (
    Block,
    DecoderBlock,
    Mlp,
    PatchEmbed,
    grid_positions,
)


class MASt3RConfig(NamedTuple):
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    local_feat_dim: int = 24
    rope_base: float = 100.0
    dpt_features: int = 256
    # croco dpt_block.py layer_dims defaults — NOT the DA2 (256,512,1024,1024)
    dpt_layer_dims: Tuple[int, int, int, int] = (96, 192, 384, 768)
    two_confs: bool = True


TINY_CONFIG = MASt3RConfig(
    patch_size=16, enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
    dec_embed_dim=48, dec_depth=2, dec_num_heads=2, local_feat_dim=8,
    dpt_features=32, dpt_layer_dims=(8, 16, 24, 32),
)


class CatMLPDPTHead(nn.Module):
    """pts3d+conf via DPT over [enc, dec mid, dec ¾, dec last] hooks, plus
    local descriptors via MLP + pixel shuffle."""
    cfg: MASt3RConfig

    @nn.compact
    def __call__(self, enc_tokens, dec_taps, grid):
        cfg = self.cfg
        gh, gw = grid
        p = cfg.patch_size
        # DPT over 4 hooks: encoder output + 3 decoder taps.
        taps = [enc_tokens] + list(dec_taps)
        dpt_out = DPTHead(
            features=cfg.dpt_features,
            out_channels=cfg.dpt_layer_dims,
            patch_size=p,
            head_out=4,   # xyz + conf
            last_dim=cfg.dpt_features // 2,
            final_relu=False,   # signed xyz + raw conf (dpt_block.py head)
            name="dpt",
        )(taps, grid)

        # Local features: MLP over concat(enc, dec_last) → pixel shuffle.
        cat = jnp.concatenate([enc_tokens, dec_taps[-1]], axis=-1)
        d_out = (cfg.local_feat_dim + int(cfg.two_confs)) * p * p
        feats = Mlp(int(4.0 * cat.shape[-1]), out=d_out,
                    name="head_local_features")(cat)
        B = cat.shape[0]
        C = cfg.local_feat_dim + int(cfg.two_confs)
        # pixel shuffle: (B, gh, gw, C·p·p) → (B, gh·p, gw·p, C)
        feats = feats.reshape(B, gh, gw, C, p, p)
        feats = jnp.einsum("bhwcpq->bhpwqc", feats).reshape(
            B, gh * p, gw * p, C
        )

        xyz_raw = dpt_out[..., :3]
        conf_raw = dpt_out[..., 3]
        # reg_dense_depth 'exp' mode: direction × expm1(magnitude).
        d = jnp.linalg.norm(xyz_raw, axis=-1, keepdims=True)
        pts3d = xyz_raw / jnp.maximum(d, 1e-8) * jnp.expm1(d)
        conf = 1.0 + jnp.exp(jnp.minimum(conf_raw, 15.0))

        desc = feats[..., : cfg.local_feat_dim]
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
        if cfg.two_confs:
            # desc_conf_mode=('exp', 0, inf): exp(x), no +1 (model.py
            # instantiation for the released catmlpdpt checkpoints).
            desc_conf = jnp.exp(jnp.minimum(feats[..., -1], 15.0))
        else:
            desc_conf = conf
        return {"pts3d": pts3d, "conf": conf, "desc": desc,
                "desc_conf": desc_conf}


class AsymmetricMASt3R(nn.Module):
    cfg: MASt3RConfig = MASt3RConfig()

    def setup(self):
        cfg = self.cfg
        self.patch_embed = PatchEmbed(cfg.patch_size, cfg.enc_embed_dim,
                                      name="patch_embed")
        self.enc_blocks = [
            Block(cfg.enc_num_heads, 4.0, qkv_bias=True, use_rope=True,
                  rope_base=cfg.rope_base, name=f"enc_blocks_{i}")
            for i in range(cfg.enc_depth)
        ]
        self.enc_norm = nn.LayerNorm(name="enc_norm")
        self.decoder_embed = nn.Dense(cfg.dec_embed_dim, name="decoder_embed")
        self.dec_blocks = [
            DecoderBlock(cfg.dec_num_heads, 4.0, qkv_bias=True, use_rope=True,
                         rope_base=cfg.rope_base, name=f"dec_blocks_{i}")
            for i in range(cfg.dec_depth)
        ]
        self.dec_blocks2 = [
            DecoderBlock(cfg.dec_num_heads, 4.0, qkv_bias=True, use_rope=True,
                         rope_base=cfg.rope_base, name=f"dec_blocks2_{i}")
            for i in range(cfg.dec_depth)
        ]
        self.dec_norm = nn.LayerNorm(name="dec_norm")
        self.head1 = CatMLPDPTHead(cfg, name="head1")
        self.head2 = CatMLPDPTHead(cfg, name="head2")

    def encode(self, img):
        """img: (B, H, W, 3) → (tokens, positions, grid)."""
        x, (gh, gw) = self.patch_embed(img)
        pos = grid_positions(x.shape[0], gh, gw)
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x), pos, (gh, gw)

    def __call__(self, img1, img2):
        """Two (B, H, W, 3) image batches → per-image head dicts. pts3d of
        BOTH heads live in image-1's camera frame (dust3r convention)."""
        cfg = self.cfg
        f1, pos1, grid = self.encode(img1)
        f2, pos2, _ = self.encode(img2)

        d1 = self.decoder_embed(f1)
        d2 = self.decoder_embed(f2)
        outs1, outs2 = [], []
        for i, (b1, b2) in enumerate(zip(self.dec_blocks, self.dec_blocks2)):
            d1_new = b1(d1, d2, pos1, pos2)
            d2_new = b2(d2, d1, pos2, pos1)
            d1, d2 = d1_new, d2_new
            last = i == cfg.dec_depth - 1
            outs1.append(self.dec_norm(d1) if last else d1)
            outs2.append(self.dec_norm(d2) if last else d2)
        # DPT hooks at depth/2, 3·depth/4 and the last block (duplicates OK
        # for tiny test configs).
        hook_idx = [
            max(0, cfg.dec_depth * 2 // 4 - 1),
            max(0, cfg.dec_depth * 3 // 4 - 1),
            cfg.dec_depth - 1,
        ]
        taps1 = [outs1[i] for i in hook_idx]
        taps2 = [outs2[i] for i in hook_idx]

        out1 = self.head1(f1, taps1, grid)
        out2 = self.head2(f2, taps2, grid)
        return out1, out2


class MASt3RModel:
    """Stateful wrapper with jitted pair inference."""

    def __init__(self, cfg: MASt3RConfig = MASt3RConfig(),
                 params: Optional[Dict] = None, seed: int = 0,
                 init_size: int = 64):
        self.cfg = cfg
        self.net = AsymmetricMASt3R(cfg)
        if params is None:
            dummy = jnp.zeros((1, init_size, init_size, 3))
            params = self.net.init(jax.random.PRNGKey(seed), dummy, dummy)
        self.params = params
        self._apply = jax.jit(self.net.apply)

    def infer_pair(self, img1, img2):
        return self._apply(self.params, img1, img2)

    def encode_image(self, img):
        """Encoder-only tokens (1, N, C) — the retrieval features
        (mast3r/retrieval/processor.py uses the trunk features)."""
        if not hasattr(self, "_encode"):
            self._encode = jax.jit(
                lambda p, x: self.net.apply(p, x,
                                            method=AsymmetricMASt3R.encode))
        out = self._encode(self.params, img)
        return out[0] if isinstance(out, tuple) else out

    def symmetric_inference(self, img1, img2):
        """Run both orderings (sparse_ga.py:629-650): returns 4 head dicts
        (X11, X21 in frame 1; X22, X12 in frame 2)."""
        out11, out21 = self.infer_pair(img1, img2)
        out22, out12 = self.infer_pair(img2, img1)
        return out11, out21, out22, out12

    def symmetric_inference_batch(self, imgs1, imgs2, mesh=None,
                                  max_batch: int = 8):
        """Symmetric inference over a PAIR BATCH (B, H, W, 3)×2.

        Both orderings ride one doubled batch; with a mesh the pair axis is
        the `data` axis (params replicated, batch sharded — the reference
        runs pairs strictly one at a time on one GPU,
        run_mast3r.py forward_mast3r). Returns a list of B per-pair
        4-tuples matching `symmetric_inference`.
        """
        import jax

        B = imgs1.shape[0]
        a = jnp.concatenate([imgs1, imgs2], axis=0)   # queries
        b = jnp.concatenate([imgs2, imgs1], axis=0)   # supports
        if mesh is not None and mesh.shape.get("data", 1) > 1:
            from jax.sharding import PartitionSpec as P

            n_data = mesh.shape["data"]
            pad = (-a.shape[0]) % n_data
            if pad:
                a = jnp.concatenate([a, jnp.repeat(a[-1:], pad, 0)], 0)
                b = jnp.concatenate([b, jnp.repeat(b[-1:], pad, 0)], 0)
            go = jax.jit(jax.shard_map(
                lambda p, x, y: self.net.apply(p, x, y),
                mesh=mesh, in_specs=(P(), P("data"), P("data")),
                out_specs=P("data"),
            ))
            o1, o2 = go(self.params, a, b)
        else:
            chunks = []
            for s in range(0, a.shape[0], max_batch):
                chunks.append(self._apply(self.params, a[s:s + max_batch],
                                          b[s:s + max_batch]))
            o1 = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0),
                              *[c[0] for c in chunks])
            o2 = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0),
                              *[c[1] for c in chunks])

        def take(tree, i):
            return jax.tree.map(lambda x: x[i:i + 1], tree)

        return [
            (take(o1, k), take(o2, k),          # X11, X21 (frame 1)
             take(o1, B + k), take(o2, B + k))  # X22, X12 (frame 2)
            for k in range(B)
        ]


# ----------------------------------------------------------- weight loading
def _lin(state, prefix):
    return {"kernel": np.asarray(state[prefix + ".weight"]).T,
            "bias": np.asarray(state[prefix + ".bias"])}


def _ln(state, prefix):
    return {"scale": np.asarray(state[prefix + ".weight"]),
            "bias": np.asarray(state[prefix + ".bias"])}


def _conv(state, prefix):
    return {"kernel": np.asarray(state[prefix + ".weight"]).transpose(2, 3, 1, 0),
            "bias": np.asarray(state[prefix + ".bias"])}


def _enc_block(state, pre):
    return {
        "norm1": _ln(state, pre + "norm1"),
        "norm2": _ln(state, pre + "norm2"),
        "attn": {"qkv": _lin(state, pre + "attn.qkv"),
                 "proj": _lin(state, pre + "attn.proj")},
        "mlp": {"fc1": _lin(state, pre + "mlp.fc1"),
                "fc2": _lin(state, pre + "mlp.fc2")},
    }


def _dec_block(state, pre):
    blk = _enc_block(state, pre)
    blk["norm3"] = _ln(state, pre + "norm3")
    blk["norm_y"] = _ln(state, pre + "norm_y")
    blk["cross_attn"] = {
        "projq": _lin(state, pre + "cross_attn.projq"),
        "projk": _lin(state, pre + "cross_attn.projk"),
        "projv": _lin(state, pre + "cross_attn.projv"),
        "proj": _lin(state, pre + "cross_attn.proj"),
    }
    return blk


def _convert_head(state, h):
    """downstream_head{k}.* → CatMLPDPTHead params (torch keys recorded in
    tests/fixtures/mast3r_vitl_keys.json from the reference checkpoint
    structure; croco dpt_block.py DPTOutputAdapter + catmlp_dpt_head.py)."""
    dpt = {}
    for i in range(4):
        dpt[f"projects_{i}"] = _conv(state, h + f".dpt.act_postprocess.{i}.0")
    for i in (0, 1):
        # ConvTranspose: torch (in, out, kh, kw) → flax (kh, kw, in, out)
        # PLUS a spatial flip: torch ConvTranspose2d is the gradient-derived
        # transpose (mirrored taps), flax's default is a direct lhs-dilated
        # conv (empirically verified mapping, exact to 0.0).
        w = np.asarray(state[h + f".dpt.act_postprocess.{i}.1.weight"])
        dpt[f"resize_{i}"] = {
            "kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1].copy(),
            "bias": np.asarray(state[h + f".dpt.act_postprocess.{i}.1.bias"]),
        }
    dpt["resize_3"] = _conv(state, h + ".dpt.act_postprocess.3.1")
    for i in range(4):
        dpt[f"layer{i + 1}_rn"] = {
            "kernel": np.asarray(
                state[h + f".dpt.scratch.layer{i + 1}_rn.weight"]
            ).transpose(2, 3, 1, 0)
        }
    for r in range(1, 5):
        blk = {}
        for u in (1, 2):
            unit = {
                "conv1": _conv(state, h + f".dpt.scratch.refinenet{r}.resConfUnit{u}.conv1"),
                "conv2": _conv(state, h + f".dpt.scratch.refinenet{r}.resConfUnit{u}.conv2"),
            }
            # refinenet4 (deepest) has no skip input: its resConfUnit1 is
            # dead weight in the torch checkpoint and absent from our module.
            # Read it (key-coverage) but drop it.
            if not (r == 4 and u == 1):
                blk[f"resConfUnit{u}"] = unit
        blk["out_conv"] = _conv(state, h + f".dpt.scratch.refinenet{r}.out_conv")
        dpt[f"refinenet{r}"] = blk
    dpt["output_conv1"] = _conv(state, h + ".dpt.head.0")
    dpt["output_conv2_0"] = _conv(state, h + ".dpt.head.2")
    dpt["output_conv2_2"] = _conv(state, h + ".dpt.head.4")
    return {
        "dpt": dpt,
        "head_local_features": {
            "fc1": _lin(state, h + ".head_local_features.fc1"),
            "fc2": _lin(state, h + ".head_local_features.fc2"),
        },
    }


def convert_torch_mast3r(state: Dict, cfg: MASt3RConfig = MASt3RConfig()) -> Dict:
    """AsymmetricMASt3R torch checkpoint (ckpt['model'], numpy-valued) → flax
    params for this module. Covers every checkpoint key except the unused
    croco `mask_token` and the `scratch.layer_rn.*` ModuleList aliases
    (duplicates of `layer{k}_rn`). Reference: mast3r/mast3r/model.py:40-75,
    dust3r/croco ViT blocks, croco dpt_block.py."""
    p = {
        "patch_embed": {"proj": _conv(state, "patch_embed.proj")},
        "enc_norm": _ln(state, "enc_norm"),
        "decoder_embed": _lin(state, "decoder_embed"),
        "dec_norm": _ln(state, "dec_norm"),
    }
    for i in range(cfg.enc_depth):
        p[f"enc_blocks_{i}"] = _enc_block(state, f"enc_blocks.{i}.")
    for i in range(cfg.dec_depth):
        p[f"dec_blocks_{i}"] = _dec_block(state, f"dec_blocks.{i}.")
        p[f"dec_blocks2_{i}"] = _dec_block(state, f"dec_blocks2.{i}.")
    p["head1"] = _convert_head(state, "downstream_head1")
    p["head2"] = _convert_head(state, "downstream_head2")
    return {"params": p}


# ------------------------------------------------------------------ matching
@partial(jax.jit, static_argnames=("block",))
def reciprocal_nn_matches(
    desc1: jnp.ndarray,   # (H, W, D)
    desc2: jnp.ndarray,   # (H, W, D)
    block: int = 4096,
):
    """Dense mutual nearest-neighbor matching (fast_nn.py:17-109 equivalent):
    for every pixel of img1 find its NN in img2 and back; a pair is a match
    when it is mutual. Blocked cdist → big MXU matmuls.
    Returns (idx1→2 (N1,), mutual mask (N1,))."""
    H1, W1, D = desc1.shape
    H2, W2, _ = desc2.shape
    a = desc1.reshape(-1, D)
    b = desc2.reshape(-1, D)

    def nn(a, b):
        # argmax of dot product == NN for unit descriptors.
        n = a.shape[0]
        pad = (-n) % block
        ap = jnp.pad(a, ((0, pad), (0, 0)))

        def one(i):
            blk = jax.lax.dynamic_slice(ap, (i * block, 0), (block, D))
            sim = blk @ b.T
            return jnp.argmax(sim, axis=1)

        idx = jax.lax.map(one, jnp.arange(ap.shape[0] // block))
        return idx.reshape(-1)[:n]

    nn12 = nn(a, b)
    nn21 = nn(b, a)
    mutual = jnp.take(nn21, nn12) == jnp.arange(a.shape[0])
    return nn12, mutual


def extract_correspondences(desc1, desc2, conf1, conf2, subsample: int = 8):
    """Subsampled mutual matches with confidences
    (sparse_ga.py:653-688 semantics): keep matches on a `subsample`-strided
    grid of img1 (and the symmetric grid of img2), dedup. Host-side assembly
    around the jitted matcher. Returns (xy1 (M, 2), xy2 (M, 2), conf (M,))."""
    H1, W1, _ = desc1.shape
    H2, W2, _ = desc2.shape
    nn12, mutual = reciprocal_nn_matches(desc1, desc2)
    nn12 = np.asarray(nn12)
    mutual = np.asarray(mutual)

    ys, xs = np.mgrid[:H1, :W1]
    flat = ys * W1 + xs
    grid_mask = ((ys % subsample == 0) & (xs % subsample == 0)).reshape(-1)
    keep = mutual & grid_mask
    idx1 = np.flatnonzero(keep)
    idx2 = nn12[idx1]
    xy1 = np.stack([idx1 % W1, idx1 // W1], axis=1)
    xy2 = np.stack([idx2 % W2, idx2 // W2], axis=1)
    c1 = np.asarray(conf1).reshape(-1)[idx1]
    c2 = np.asarray(conf2).reshape(-1)[idx2]
    conf = np.sqrt(c1 * c2)
    return xy1, xy2, conf
