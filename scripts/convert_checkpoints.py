#!/usr/bin/env python
"""Convert a directory of reference torch checkpoints into the npz zoo that
`g4splat_tpu.cli --checkpoint_dir` consumes.

Reference checkpoint layout (reference README.md:108-139):

    Depth-Anything-V2/checkpoints/depth_anything_v2_vitl.pth
    mast3r/checkpoints/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth
    checkpoint/segment-anything/sam_vit_h_4b8939.pth
    checkpoint/MVD_weights/            (diffusers layout: unet/sparse/
                                        ema-checkpoint, vae/, image_encoder/)
    + torchvision VGG16 / LPIPS linear heads for calibrated LPIPS eval

Output zoo (each npz: pickled ``params`` pytree + optional pickled ``cfg``
kwargs dict; see cli._load_npz):

    depth_anything_v2.npz  mast3r.npz  sam.npz  see3d.npz  [see3d_sr.npz]
    vae.npz  clip.npz  [lpips.npz]

Usage:
    python scripts/convert_checkpoints.py --src /path/to/reference/ckpts \
        --dst /path/to/npz_zoo [--only sam,see3d]

Files that cannot be found are skipped with a warning — the CLI degrades
the corresponding stage, so a partial zoo is still usable.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _find(src: str, patterns) -> str | None:
    for pat in patterns:
        hits = sorted(glob.glob(os.path.join(src, pat), recursive=True))
        if hits:
            return hits[0]
    return None


def _load_torch_state(path: str) -> dict:
    """torch .pth/.bin/.ckpt or .safetensors → flat {name: np.ndarray}."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        state = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
        return state
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict", "params"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items() if hasattr(v, "shape")}


def _save(dst: str, name: str, params, cfg=None) -> None:
    out = os.path.join(dst, name + ".npz")
    payload = {"params": np.array(params, dtype=object)}
    if cfg is not None:
        payload["cfg"] = np.array(cfg, dtype=object)
    np.savez(out, **payload)
    print(f"  wrote {out}")


def convert_da2(src, dst, encoder="vitl"):
    p = _find(src, ["**/depth_anything_v2_*.pth", "depth_anything_v2*.pth"])
    if not p:
        return print("  [skip] depth_anything_v2: no checkpoint found")
    from g4splat_tpu.priors.depth_anything import convert_torch_checkpoint

    for enc in ("vits", "vitb", "vitl", "vitg"):
        if enc in os.path.basename(p):
            encoder = enc
    params = convert_torch_checkpoint(_load_torch_state(p), encoder=encoder)
    _save(dst, "depth_anything_v2", params, {"encoder": encoder})


def convert_mast3r(src, dst):
    p = _find(src, ["**/MASt3R_ViTLarge*metric.pth", "**/mast3r*.pth"])
    if not p:
        return print("  [skip] mast3r: no checkpoint found")
    from g4splat_tpu.priors.mast3r import convert_torch_mast3r

    params = convert_torch_mast3r(_load_torch_state(p))
    _save(dst, "mast3r", params)


def convert_sam(src, dst):
    p = _find(src, ["**/sam_vit_h*.pth", "**/sam_*.pth"])
    if not p:
        return print("  [skip] sam: no checkpoint found")
    from g4splat_tpu.priors.sam import convert_torch_sam

    params = convert_torch_sam(_load_torch_state(p))
    _save(dst, "sam", params)


def _diffusers_unet_state(root: str) -> dict | None:
    p = _find(root, ["diffusion_pytorch_model.safetensors",
                     "diffusion_pytorch_model.bin", "*.safetensors", "*.bin",
                     "*.pth", "*.ckpt"])
    return _load_torch_state(p) if p else None


def convert_see3d(src, dst):
    base = _find(src, ["**/MVD_weights"]) or src
    for sub, name in (("unet/sparse/ema-checkpoint", "see3d"),
                      ("unet/single/ema-checkpoint", "see3d_sr")):
        root = os.path.join(base, sub)
        if not os.path.isdir(root):
            print(f"  [skip] {name}: {root} not found")
            continue
        state = _diffusers_unet_state(root)
        if state is None:
            print(f"  [skip] {name}: no weight file under {root}")
            continue
        from g4splat_tpu.priors.see3d import convert_torch_see3d

        params = convert_torch_see3d(state)
        _save(dst, name, params)

    vroot = os.path.join(base, "vae")
    if os.path.isdir(vroot):
        state = _diffusers_unet_state(vroot)
        if state is not None:
            from g4splat_tpu.priors.vae import convert_torch_vae

            _save(dst, "vae", convert_torch_vae(state))
    else:
        print(f"  [skip] vae: {vroot} not found")

    croot = os.path.join(base, "image_encoder")
    cpath = (_diffusers_unet_state(croot) if os.path.isdir(croot) else None)
    if cpath is not None:
        from g4splat_tpu.priors.clip_vision import convert_torch_clip_vision

        # Persist the architecture implied by the state dict so the CLI
        # rebuilds the exact variant (See3D ships OpenCLIP ViT-H/14:
        # embed 1280 / 32 layers / projection 1024, mv_diffusion.py:35).
        vpre = "vision_model."
        pe = np.asarray(cpath[vpre + "embeddings.patch_embedding.weight"])
        vdepth = 1 + max(
            int(k.split(".")[3]) for k in cpath
            if k.startswith(vpre + "encoder.layers."))
        patch = int(pe.shape[-1])
        npos = int(np.asarray(
            cpath[vpre + "embeddings.position_embedding.weight"]).shape[0])
        # num_heads: from the shipped config.json when present; else a
        # known-variant table (CLIPVision's default of 16 is right for
        # ViT-L/H but silently wrong for e.g. ViT-bigG's 20 heads).
        embed_dim = int(pe.shape[0])
        vcfg_path = os.path.join(croot, "config.json")
        if os.path.isfile(vcfg_path):
            import json

            with open(vcfg_path) as f:
                num_heads = int(json.load(f).get(
                    "num_attention_heads", embed_dim // 80))
        else:
            known = {768: 12, 1024: 16, 1280: 16, 1664: 20}
            assert embed_dim in known, (
                f"unknown CLIP vision width {embed_dim}: no config.json and "
                "no known num_heads — refusing to guess")
            num_heads = known[embed_dim]
        vcfg = {
            "embed_dim": embed_dim,
            "depth": vdepth,
            "patch_size": patch,
            "image_size": int(round((npos - 1) ** 0.5)) * patch,
            "projection_dim": int(np.asarray(
                cpath["visual_projection.weight"]).shape[0]),
            "num_heads": num_heads,
        }
        _save(dst, "clip", convert_torch_clip_vision(cpath), vcfg)
    else:
        print(f"  [skip] clip: {croot} not found")

    troot = os.path.join(base, "text_encoder")
    tstate = (_diffusers_unet_state(troot) if os.path.isdir(troot) else None)
    if tstate is not None:
        from g4splat_tpu.priors.clip_text import convert_torch_clip_text

        n_layers = len({k.split(".")[3] for k in tstate
                        if k.startswith("text_model.encoder.layers.")})
        # The reference consumes text_encoder(ids)[0] = final_layer_norm
        # over ALL instantiated layers; for SD2.x the "penultimate" trick is
        # already baked into the shipped config (num_hidden_layers=23 with a
        # 23-layer state dict). So keep every layer the config instantiates:
        # depth = config.json num_hidden_layers, truncating only when the
        # raw state dict provably ships MORE layers than the config uses
        # (e.g. a full 24-layer OpenCLIP dump next to a 23-layer config).
        cfg_path = os.path.join(troot, "config.json")
        hidden_act = None
        depth = n_layers
        if os.path.isfile(cfg_path):
            import json

            with open(cfg_path) as f:
                tcfg = json.load(f)
            depth = min(n_layers, int(tcfg.get("num_hidden_layers",
                                               n_layers)))
            hidden_act = tcfg.get("hidden_act")
        width = int(np.asarray(
            tstate["text_model.embeddings.token_embedding.weight"]).shape[1])
        # Variant detection: SD1.x CLIP ViT-L (width 768) uses quick_gelu,
        # 12 heads, and pads prompts with EOS (49407); SD2.x OpenCLIP ViT-H
        # (width 1024) uses gelu, 16 heads, pad 0. config.json hidden_act
        # wins when present.
        is_sd1 = (hidden_act == "quick_gelu") or (
            hidden_act is None and width == 768)
        act = "quick_gelu" if is_sd1 else "gelu"
        _save(dst, "clip_text", convert_torch_clip_text(tstate, depth=depth),
              cfg={"depth": depth, "width": width, "act": act,
                   "num_heads": width // 64,
                   "pad_id": 49407 if is_sd1 else 0})
    else:
        print(f"  [skip] clip_text: {troot} not found")


def convert_lpips(src, dst):
    vgg = _find(src, ["**/vgg16*.pth", "**/vgg16*.bin"])
    lin = _find(src, ["**/lpips*vgg*.pth", "**/weights/v0.1/vgg.pth"])
    if not vgg or not lin:
        return print("  [skip] lpips: need torchvision vgg16 + LPIPS heads")
    from g4splat_tpu.eval.image_metrics import load_torch_lpips_weights

    params = load_torch_lpips_weights(_load_torch_state(vgg),
                                      _load_torch_state(lin))
    _save(dst, "lpips", params)


CONVERTERS = {
    "depth_anything_v2": convert_da2,
    "mast3r": convert_mast3r,
    "sam": convert_sam,
    "see3d": convert_see3d,
    "lpips": convert_lpips,
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True,
                    help="reference checkpoint root (searched recursively)")
    ap.add_argument("--dst", required=True, help="npz zoo output dir")
    ap.add_argument("--only", default=None,
                    help=f"comma list from {sorted(CONVERTERS)}")
    args = ap.parse_args(argv)
    os.makedirs(args.dst, exist_ok=True)
    names = args.only.split(",") if args.only else list(CONVERTERS)
    for name in names:
        print(f"[{name}]")
        CONVERTERS[name](args.src, args.dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
