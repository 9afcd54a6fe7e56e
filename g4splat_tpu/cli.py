"""Command-line entry point with the reference `train.py` flag surface.

Usage (mirrors the reference README):
    python -m g4splat_tpu.cli -s data/scene -o output/scene \
        --sfm_config posed --use_view_config --config_view_num 5 \
        --select_inpaint_num 10 --tetra_downsample_ratio 0.25

Input layout: `source_path/images/*.png|jpg` (+ optional COLMAP
`source_path/sparse/0` for posed mode). Checkpoints for the prior networks
are provided via --checkpoint_dir; absent checkpoints degrade the
corresponding stage (documented per stage in pipeline/orchestrator.py).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="g4splat_tpu scene reconstruction")
    p.add_argument("-s", "--source_path", type=str, required=True)
    p.add_argument("-o", "--output_path", type=str, default=None)
    p.add_argument("--n_images", type=int, default=None)
    p.add_argument("--use_view_config", action="store_true")
    p.add_argument("--config_view_num", type=int, default=10)
    p.add_argument("--image_idx", type=int, nargs="*", default=None)
    p.add_argument("--randomize_images", action="store_true",
                   help="shuffle (seeded) the image list before --n_images "
                        "truncation; ignored with --image_idx / view config "
                        "(run_sfm.py:48-53 semantics — the reference parses "
                        "this in run_mast3r.py:76 without reading it)")
    p.add_argument("--dense_supervision", action="store_true",
                   help="switch the GS schedule to the 30k 'long' config "
                        "(train.py:120-121)")
    p.add_argument("--use_dense_view", action="store_true")
    p.add_argument("--dense_regul", type=str, default="default",
                   choices=["default", "strong", "weak", "none"],
                   help="accepted for reference flag parity (the reference "
                        "trainer receives but never reads it)")
    p.add_argument("--no_interpolated_views", action="store_true",
                   help="disable interpolated cameras in mesh extraction")
    p.add_argument("--downweight_input_view_color_loss", action="store_true",
                   help="x0.01 color loss on input views too "
                        "(train_with_refine_depth.py:384)")
    p.add_argument("--use_multires_tsdf", action="store_true")
    p.add_argument("--use_mesh_filter", action="store_true")
    p.add_argument("--sfm_config", type=str, default="unposed",
                   choices=["posed", "unposed"])
    p.add_argument("--alignment_config", type=str, default="default")
    p.add_argument("--depth_model", type=str, default="depthanythingv2",
                   choices=["depthanythingv2"],
                   help="monocular depth prior family (only DA2 is "
                        "implemented; the reference parses this in "
                        "align_charts.py:23 without reading it)")
    p.add_argument("--depthanything_encoder", type=str, default="vitl")
    p.add_argument("--free_gaussians_config", type=str, default=None,
                   help="None → 'long' with --dense_supervision else "
                        "'default' (train.py:120-121)")
    p.add_argument("--tsdf_config", type=str, default="default")
    p.add_argument("--tetra_config", type=str, default="default")
    p.add_argument("--tetra_downsample_ratio", type=float, default=0.5)
    p.add_argument("--select_inpaint_num", type=int, default=20)
    p.add_argument("--use_downsample_gaussians", action="store_true")
    p.add_argument("--downsample_gaussians_type", type=str, default="warp",
                   choices=["warp", "voxel"])
    p.add_argument("--warp_depth_error_thresh", type=float, default=0.01)
    p.add_argument("--warp_downsample_pixel_grid_size", type=int, default=-1)
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="Directory with converted prior-model checkpoints")
    p.add_argument("--work_size", type=int, default=512)
    p.add_argument("--iterations", type=int, default=None,
                   help="None → iterations from the resolved "
                        "free_gaussians_refinement YAML (7000/30000)")
    p.add_argument("--render_backend", type=str, default="pallas",
                   choices=["pallas", "tiled", "dense"])
    return p


def load_scene_images(source_path: str, n_images=None, image_idx=None,
                      work_size: int = 512, randomize: bool = False,
                      seed: int = 0):
    import jax
    import jax.numpy as jnp

    img_dir = os.path.join(source_path, "images")
    files = sorted(
        glob.glob(os.path.join(img_dir, "*.png"))
        + glob.glob(os.path.join(img_dir, "*.jpg"))
        + glob.glob(os.path.join(img_dir, "*.jpeg"))
    )
    if image_idx:
        files = [files[i] for i in image_idx]
    elif n_images:
        if randomize:
            # --randomize_images: seeded shuffle, then constant-spacing
            # subsample to n_images (run_mast3r.py:76 help text).
            order = np.random.RandomState(seed).permutation(len(files))
            step = max(1, len(files) // n_images)
            files = [files[i] for i in sorted(order[::step][:n_images])]
        else:
            files = files[:n_images]
    from g4splat_tpu.io.images import load_image

    imgs = []
    for f in files:
        img = load_image(f)
        H, W = img.shape[:2]
        s = work_size / max(H, W)
        nh = max(16, int(round(H * s / 16)) * 16)
        nw = max(16, int(round(W * s / 16)) * 16)
        imgs.append(np.asarray(
            jax.image.resize(jnp.asarray(img), (nh, nw, 3), "bilinear")
        ))
    return np.stack(imgs), files


def _load_npz(path):
    """npz zoo entry → (params_dict, cfg_kwargs_or_None).

    Every checkpoint written by scripts/convert_checkpoints.py carries a
    pickled ``params`` pytree plus an optional pickled ``cfg`` kwargs dict so
    the CLI can reconstruct the exact architecture (incl. tiny test configs).
    """
    data = dict(np.load(path, allow_pickle=True))
    params = data["params"].item()
    cfg = data["cfg"].item() if "cfg" in data else None
    return params, cfg


def build_priors(args):
    """Wire ALL prior networks from --checkpoint_dir (absent file → None →
    the stage degrades as documented per stage in pipeline/orchestrator.py).

    Zoo layout (produced by scripts/convert_checkpoints.py): one npz per
    prior — depth_anything_v2, mast3r, sam, see3d, see3d_sr, vae, clip,
    lpips. The reference loads the torch originals at
    guidance/see3d_util.py:18-40 (MVD UNet + VAE + CLIP),
    planes/mask_generator.py:10-18 (SAM), eval (pretrained VGG for LPIPS).
    """
    from g4splat_tpu.pipeline.orchestrator import Priors

    priors = Priors()
    ckpt = args.checkpoint_dir
    if not ckpt:
        return priors

    def path(name):
        p = os.path.join(ckpt, name + ".npz")
        return p if os.path.exists(p) else None

    p = path("depth_anything_v2")
    if p:
        from g4splat_tpu.priors.depth_anything import DepthAnything

        params, cfg = _load_npz(p)
        enc = (cfg or {}).get("encoder", args.depthanything_encoder)
        priors.depth_model = DepthAnything(encoder=enc, params=params)

    p = path("mast3r")
    if p:
        from g4splat_tpu.priors.mast3r import MASt3RConfig, MASt3RModel

        params, cfg = _load_npz(p)
        mcfg = MASt3RConfig(**cfg) if cfg else MASt3RConfig()
        priors.mast3r = MASt3RModel(cfg=mcfg, params=params)

    p = path("sam")
    if p:
        from g4splat_tpu.priors.sam import (
            SAMConfig,
            SAMPredictor,
            sam_mask_generator,
        )

        params, cfg = _load_npz(p)
        scfg = SAMConfig(**cfg) if cfg else SAMConfig()
        priors.sam_generator = sam_mask_generator(
            SAMPredictor(cfg=scfg, params=params)
        )

    for name, attr in (("see3d", "see3d"), ("see3d_sr", "see3d_sr")):
        p = path(name)
        if p:
            from g4splat_tpu.priors.see3d import (
                MultiViewUNet,
                See3DPipeline,
                UNetConfig,
            )

            params, cfg = _load_npz(p)
            ucfg = UNetConfig(**cfg) if cfg else UNetConfig()
            setattr(priors, attr,
                    See3DPipeline(MultiViewUNet(ucfg), params))

    p = path("vae")
    if p:
        from g4splat_tpu.priors.vae import AutoencoderKL

        params, cfg = _load_npz(p)
        vae = AutoencoderKL(**cfg) if cfg else AutoencoderKL()
        priors.vae = (vae, params)

    p = path("clip")
    if p:
        from g4splat_tpu.priors.clip_vision import (
            CLIPImageEmbedder,
            CLIPVision,
        )

        params, cfg = _load_npz(p)
        model = CLIPVision(**cfg) if cfg else CLIPVision()
        priors.image_embedder = CLIPImageEmbedder(model=model, params=params)

    p = path("clip_text")
    if p:
        from g4splat_tpu.priors.clip_text import CLIPText, CLIPTextEmbedder

        params, cfg = _load_npz(p)
        cfg = dict(cfg or {})
        pad_id = int(cfg.pop("pad_id", 0))
        model = CLIPText(**cfg) if cfg else CLIPText()
        priors.text_embedder = CLIPTextEmbedder(model=model, params=params,
                                                pad_id=pad_id)

    p = path("lpips")
    if p:
        from g4splat_tpu.eval.image_metrics import LPIPS

        params, _ = _load_npz(p)
        priors.lpips = LPIPS(params=params, calibrated=True)
    return priors


def main(argv=None):
    args = build_parser().parse_args(argv)
    out = args.output_path or os.path.join(
        "output", os.path.basename(args.source_path.rstrip("/"))
    )
    os.makedirs(out, exist_ok=True)

    from g4splat_tpu.io import colmap as colmap_io
    from g4splat_tpu.pipeline.orchestrator import (
        G4SplatPipeline,
        PipelineConfig,
    )

    # View split (reference --use_view_config + split-{N}views.json,
    # train.py:99-114 / eval/eval.py:67-80): train ids select the training
    # views, test ids become the held-out eval set.
    image_idx = args.image_idx
    test_ids: list = []
    if args.use_view_config and not image_idx:
        from g4splat_tpu.io.splits import load_view_split

        split = load_view_split(args.source_path, args.config_view_num)
        if split is not None:
            image_idx, test_ids = split

    images, files = load_scene_images(
        args.source_path, args.n_images, image_idx, args.work_size,
        randomize=args.randomize_images,
    )
    test_images = None
    if test_ids:
        test_images, _ = load_scene_images(
            args.source_path, None, test_ids, args.work_size
        )

    cameras = test_cameras = None
    sparse_dir = os.path.join(args.source_path, "sparse", "0")
    if args.sfm_config == "posed" and os.path.isdir(sparse_dir):
        from g4splat_tpu.core.cameras import stack_cameras

        cams, imgs_meta, _ = colmap_io.read_model(sparse_dir)
        fw = colmap_io.to_framework_cameras(cams, imgs_meta)
        if image_idx:
            cameras = stack_cameras([fw[i][1] for i in image_idx])
        else:
            cameras = stack_cameras([c for _, c in fw[: len(images)]])
        if test_ids:
            test_cameras = stack_cameras([fw[i][1] for i in test_ids])

    # --dense_supervision → the 30k 'long' schedule (train.py:120-121);
    # iterations follow the resolved YAML unless --iterations overrides.
    fg_config = args.free_gaussians_config or (
        "long" if args.dense_supervision else "default"
    )
    iterations = args.iterations
    if iterations is None:
        from g4splat_tpu.utils.config import load_config

        iterations = int(load_config(
            "free_gaussians_refinement", fg_config).get("iterations", 7000))

    cfg = PipelineConfig(
        source_path=args.source_path,
        output_path=out,
        sfm_config=args.sfm_config,
        alignment_config=args.alignment_config,
        free_gaussians_config=fg_config,
        tetra_config=args.tetra_config,
        tsdf_config=args.tsdf_config,
        tetra_downsample_ratio=args.tetra_downsample_ratio,
        select_inpaint_num=args.select_inpaint_num,
        use_dense_view=args.use_dense_view,
        dense_regul=args.dense_regul,
        use_interpolated_views=not args.no_interpolated_views,
        downweight_input_view_color_loss=args.downweight_input_view_color_loss,
        use_mesh_filter=args.use_mesh_filter,
        use_multires_tsdf=args.use_multires_tsdf,
        use_downsample_gaussians=args.use_downsample_gaussians,
        downsample_gaussians_type=args.downsample_gaussians_type,
        warp_depth_error_thresh=args.warp_depth_error_thresh,
        warp_downsample_pixel_grid_size=args.warp_downsample_pixel_grid_size,
        work_size=args.work_size,
        train_iterations=iterations,
        render_backend=args.render_backend,
    )
    pipeline = G4SplatPipeline(cfg, build_priors(args))
    results = pipeline.run(images, cameras=cameras,
                           test_images=test_images,
                           test_cameras=test_cameras)
    print(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
