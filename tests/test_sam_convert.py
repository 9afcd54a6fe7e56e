"""SAM torch-checkpoint conversion tests.

The `segment_anything` package is not vendored in the reference (it is a pip
dependency there — reference 2d-gaussian-splatting/planes/mask_generator.py:10
imports it), so the oracle here is an independent torch reimplementation of
the published SAM architecture (Kirillov et al., ICCV 2023; modules
image_encoder.py / prompt_encoder.py / transformer.py / mask_decoder.py of
facebookresearch/segment-anything) built at tiny scale with the official
checkpoint's key naming. The test state_dict()s it, runs `convert_torch_sam`,
and demands numeric parity of image-encoder features, mask logits and IoU
predictions — pinning rel-pos attention, window padding, the two-way
transformer PE semantics, every transpose, and the ConvTranspose flip.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from g4splat_tpu.priors.sam import SAM, SAMConfig, convert_torch_sam

pytestmark = pytest.mark.slow  # torch-oracle / integration tier

CFG = SAMConfig(
    img_size=48, patch_size=8, encoder_dim=32, encoder_depth=2,
    encoder_heads=2, window_size=3, global_attn_every=2, embed_dim=32,
    decoder_depth=2, decoder_heads=2, decoder_mlp_dim=64, attn_downsample=2,
)


# ---------------------------------------------------------------- torch side
class LayerNorm2d(tnn.Module):
    def __init__(self, ch, eps=1e-6):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(ch))
        self.bias = tnn.Parameter(torch.zeros(ch))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class MLPBlock(tnn.Module):
    def __init__(self, dim, mlp_dim):
        super().__init__()
        self.lin1 = tnn.Linear(dim, mlp_dim)
        self.lin2 = tnn.Linear(mlp_dim, dim)

    def forward(self, x):
        return self.lin2(F.gelu(self.lin1(x)))


def window_partition(x, w):
    B, H, W, C = x.shape
    ph, pw = (-H) % w, (-W) % w
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    Hp, Wp = H + ph, W + pw
    x = x.view(B, Hp // w, w, Wp // w, w, C)
    return (x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w, w, C), (Hp, Wp))


def window_unpartition(x, w, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = x.shape[0] // (Hp * Wp // w // w)
    x = x.view(B, Hp // w, Wp // w, w, w, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W].contiguous()


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = rel_pos_h[torch.arange(q_h)[:, None] - torch.arange(k_h)[None] + k_h - 1]
    Rw = rel_pos_w[torch.arange(q_w)[:, None] - torch.arange(k_w)[None] + k_w - 1]
    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = (
        attn.view(B, q_h, q_w, k_h, k_w)
        + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    ).view(B, q_h * q_w, k_h * k_w)
    return attn


class EncAttention(tnn.Module):
    def __init__(self, dim, num_heads, input_size):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.rel_pos_h = tnn.Parameter(
            torch.zeros(2 * input_size[0] - 1, dim // num_heads))
        self.rel_pos_w = tnn.Parameter(
            torch.zeros(2 * input_size[1] - 1, dim // num_heads))

    def forward(self, x):
        B, H, W, _ = x.shape
        qkv = (self.qkv(x).reshape(B, H * W, 3, self.num_heads, -1)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv.reshape(3, B * self.num_heads, H * W, -1).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = add_decomposed_rel_pos(
            attn, q, self.rel_pos_h, self.rel_pos_w, (H, W), (H, W))
        attn = attn.softmax(dim=-1)
        x = ((attn @ v).view(B, self.num_heads, H, W, -1)
             .permute(0, 2, 3, 1, 4).reshape(B, H, W, -1))
        return self.proj(x)


class EncBlock(tnn.Module):
    def __init__(self, dim, heads, window, input_size):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = EncAttention(
            dim, heads, input_size if window == 0 else (window, window))
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = MLPBlock(dim, dim * 4)
        self.window_size = window

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        x = self.attn(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class TorchImageEncoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        g = cfg.img_size // cfg.patch_size
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(
            3, cfg.encoder_dim, cfg.patch_size, cfg.patch_size)
        self.pos_embed = tnn.Parameter(torch.zeros(1, g, g, cfg.encoder_dim))
        self.blocks = tnn.ModuleList([
            EncBlock(
                cfg.encoder_dim, cfg.encoder_heads,
                0 if (i + 1) % cfg.global_attn_every == 0 else cfg.window_size,
                (g, g),
            )
            for i in range(cfg.encoder_depth)
        ])
        self.neck = tnn.Sequential(
            tnn.Conv2d(cfg.encoder_dim, cfg.embed_dim, 1, bias=False),
            LayerNorm2d(cfg.embed_dim),
            tnn.Conv2d(cfg.embed_dim, cfg.embed_dim, 3, padding=1, bias=False),
            LayerNorm2d(cfg.embed_dim),
        )

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.neck(x.permute(0, 3, 1, 2))


class TorchPromptEncoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        D = cfg.embed_dim
        self.pe_layer = tnn.Module()
        self.pe_layer.register_parameter(
            "positional_encoding_gaussian_matrix",
            tnn.Parameter(torch.randn(2, D // 2)))
        self.point_embeddings = tnn.ModuleList(
            [tnn.Embedding(1, D) for _ in range(4)])
        self.not_a_point_embed = tnn.Embedding(1, D)
        self.no_mask_embed = tnn.Embedding(1, D)
        # mask_downscaling exists in real checkpoints; converter must
        # read-and-drop it.
        self.mask_downscaling = tnn.Sequential(
            tnn.Conv2d(1, 4, 2, 2), LayerNorm2d(4), tnn.GELU(),
            tnn.Conv2d(4, 16, 2, 2), LayerNorm2d(16), tnn.GELU(),
            tnn.Conv2d(16, D, 1),
        )

    def pe(self, coords):
        proj = ((2 * coords - 1)
                @ self.pe_layer.positional_encoding_gaussian_matrix
                * (2 * math.pi))
        return torch.cat([proj.sin(), proj.cos()], dim=-1)

    def forward(self, points, labels, grid):
        B = points.shape[0]
        points = torch.cat([points, torch.zeros(B, 1, 2)], dim=1)
        labels = torch.cat([labels, -torch.ones(B, 1)], dim=1)
        sparse = self.pe(points)
        sparse[labels == -1] = 0.0
        sparse[labels == -1] += self.not_a_point_embed.weight[0]
        sparse[labels == 0] += self.point_embeddings[0].weight[0]
        sparse[labels == 1] += self.point_embeddings[1].weight[0]
        gh, gw = grid
        ys = (torch.arange(gh, dtype=torch.float32) + 0.5) / gh
        xs = (torch.arange(gw, dtype=torch.float32) + 0.5) / gw
        gx, gy = torch.meshgrid(xs, ys, indexing="xy")
        dense_pe = self.pe(torch.stack([gx, gy], dim=-1))
        return sparse, dense_pe, self.no_mask_embed.weight[0]


class DecAttention(tnn.Module):
    def __init__(self, dim, heads, downsample=1):
        super().__init__()
        self.heads = heads
        ci = dim // downsample
        self.q_proj = tnn.Linear(dim, ci)
        self.k_proj = tnn.Linear(dim, ci)
        self.v_proj = tnn.Linear(dim, ci)
        self.out_proj = tnn.Linear(ci, dim)

    def _split(self, x):
        B, N, C = x.shape
        return x.reshape(B, N, self.heads, C // self.heads).transpose(1, 2)

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        q, k, v = self._split(q), self._split(k), self._split(v)
        attn = (q @ k.transpose(-2, -1)) / math.sqrt(q.shape[-1])
        out = attn.softmax(-1) @ v
        B, H, N, hd = out.shape
        return self.out_proj(out.transpose(1, 2).reshape(B, N, H * hd))


class TorchTwoWayBlock(tnn.Module):
    def __init__(self, cfg, skip_first_layer_pe):
        super().__init__()
        D, H = cfg.embed_dim, cfg.decoder_heads
        self.self_attn = DecAttention(D, H)
        self.norm1 = tnn.LayerNorm(D)
        self.cross_attn_token_to_image = DecAttention(D, H, cfg.attn_downsample)
        self.norm2 = tnn.LayerNorm(D)
        self.mlp = tnn.Module()
        self.mlp.lin1 = tnn.Linear(D, cfg.decoder_mlp_dim)
        self.mlp.lin2 = tnn.Linear(cfg.decoder_mlp_dim, D)
        self.norm3 = tnn.LayerNorm(D)
        self.cross_attn_image_to_token = DecAttention(D, H, cfg.attn_downsample)
        self.norm4 = tnn.LayerNorm(D)
        self.skip_first_layer_pe = skip_first_layer_pe

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(q, k, keys))
        queries = self.norm3(
            queries + self.mlp.lin2(F.gelu(self.mlp.lin1(queries))))
        q = queries + query_pe
        k = keys + key_pe
        keys = self.norm4(keys + self.cross_attn_image_to_token(k, q, queries))
        return queries, keys


class MLP3(tnn.Module):
    def __init__(self, din, dh, dout):
        super().__init__()
        self.layers = tnn.ModuleList(
            [tnn.Linear(din, dh), tnn.Linear(dh, dh), tnn.Linear(dh, dout)])

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = F.relu(l(x)) if i < 2 else l(x)
        return x


class TorchMaskDecoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        D = cfg.embed_dim
        self.transformer = tnn.Module()
        self.transformer.layers = tnn.ModuleList([
            TorchTwoWayBlock(cfg, skip_first_layer_pe=(i == 0))
            for i in range(cfg.decoder_depth)
        ])
        self.transformer.final_attn_token_to_image = DecAttention(
            D, cfg.decoder_heads, cfg.attn_downsample)
        self.transformer.norm_final_attn = tnn.LayerNorm(D)
        self.iou_token = tnn.Embedding(1, D)
        self.mask_tokens = tnn.Embedding(cfg.num_mask_tokens, D)
        self.output_upscaling = tnn.Sequential(
            tnn.ConvTranspose2d(D, D // 4, 2, 2), LayerNorm2d(D // 4),
            tnn.GELU(), tnn.ConvTranspose2d(D // 4, D // 8, 2, 2), tnn.GELU())
        self.output_hypernetworks_mlps = tnn.ModuleList(
            [MLP3(D, D, D // 8) for _ in range(cfg.num_mask_tokens)])
        self.iou_prediction_head = MLP3(D, D, cfg.num_mask_tokens)
        self.cfg = cfg

    def forward(self, img_embed, img_pe, sparse, no_mask):
        cfg = self.cfg
        B, D, gh, gw = img_embed.shape
        tok = torch.cat([self.iou_token.weight, self.mask_tokens.weight])
        tokens = torch.cat([tok.unsqueeze(0).expand(B, -1, -1), sparse], dim=1)
        src = img_embed + no_mask.view(1, -1, 1, 1)
        queries = tokens
        keys = src.flatten(2).permute(0, 2, 1)
        pe = img_pe.reshape(1, gh * gw, D).expand(B, -1, -1)
        for layer in self.transformer.layers:
            queries, keys = layer(queries, keys, tokens, pe)
        q = queries + tokens
        k = keys + pe
        queries = queries + self.transformer.final_attn_token_to_image(
            q, k, keys)
        queries = self.transformer.norm_final_attn(queries)
        iou_tok = queries[:, 0]
        mask_toks = queries[:, 1:1 + cfg.num_mask_tokens]
        src = keys.transpose(1, 2).view(B, D, gh, gw)
        up = self.output_upscaling(src)
        hyper = torch.stack([
            m(mask_toks[:, i])
            for i, m in enumerate(self.output_hypernetworks_mlps)], dim=1)
        masks = (hyper @ up.flatten(2)).view(B, -1, gh * 4, gw * 4)
        return masks, self.iou_prediction_head(iou_tok)


class TorchSAM(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.image_encoder = TorchImageEncoder(cfg)
        self.prompt_encoder = TorchPromptEncoder(cfg)
        self.mask_decoder = TorchMaskDecoder(cfg)

    def forward(self, img, points, labels):
        emb = self.image_encoder(img)
        gh, gw = emb.shape[-2:]
        sparse, dense_pe, no_mask = self.prompt_encoder(
            points, labels, (gh, gw))
        return self.mask_decoder(emb, dense_pe, sparse, no_mask), emb


# ----------------------------------------------------------------- the test
class TestSAMConvert:
    @pytest.fixture(scope="class")
    def setup(self):
        torch.manual_seed(0)
        tmodel = TorchSAM(CFG)
        # Non-degenerate rel-pos / pos-embed (zeros would hide bugs).
        with torch.no_grad():
            for n, p in tmodel.named_parameters():
                if "rel_pos" in n or "pos_embed" in n:
                    p.copy_(torch.randn_like(p) * 0.1)
        tmodel.eval()
        img = torch.randn(1, 3, CFG.img_size, CFG.img_size)
        pts = torch.rand(2, 3, 2)
        lbl = torch.tensor([[1.0, 0.0, 1.0], [1.0, 1.0, 0.0]])
        with torch.no_grad():
            emb = tmodel.image_encoder(img)
            sparse, dense_pe, no_mask = tmodel.prompt_encoder(
                pts, lbl, emb.shape[-2:])
            masks, iou = tmodel.mask_decoder(
                emb.expand(2, -1, -1, -1), dense_pe, sparse, no_mask)
        state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        return state, img, pts, lbl, emb, masks, iou

    def test_forward_parity(self, setup):
        state, img, pts, lbl, emb_ref, masks_ref, iou_ref = setup
        params = convert_torch_sam(state, CFG)
        net = SAM(CFG)
        imgs = jnp.asarray(img.numpy().transpose(0, 2, 3, 1))
        emb = net.apply(params, imgs, method=net.encode_image)
        got = np.asarray(emb).transpose(0, 3, 1, 2)
        ref = emb_ref.numpy()
        scale = max(1e-3, float(np.abs(ref).max()))
        assert np.abs(got - ref).max() / scale < 5e-5, "image encoder mismatch"

        embs = jnp.broadcast_to(jnp.asarray(got.transpose(0, 2, 3, 1)),
                                (2,) + emb.shape[1:])
        masks, iou = net.apply(
            params, embs, jnp.asarray(pts.numpy()), jnp.asarray(lbl.numpy()),
            method=net.decode)
        for name, g, r in (("masks", masks, masks_ref), ("iou", iou, iou_ref)):
            g = np.asarray(g)
            r = r.numpy()
            assert g.shape == r.shape, (name, g.shape, r.shape)
            scale = max(1e-3, float(np.abs(r).max()))
            # f32 accumulation-order noise through 2 transformer layers +
            # deconvs lands ~7e-5; structural errors are orders larger.
            assert np.abs(g - r).max() / scale < 2e-4, f"{name} mismatch"

    def test_key_coverage(self, setup):
        state = setup[0]
        read = set()

        class Rec(dict):
            def __getitem__(s, k):
                read.add(k)
                return state[k]

            def __iter__(s):
                return iter(state)

        convert_torch_sam(Rec(), CFG)
        missed = set(state) - read
        assert not missed, f"checkpoint keys not consumed: {sorted(missed)[:10]}"


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
