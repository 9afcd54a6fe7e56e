"""Record See3D MV-UNet conversion fixtures from the vendored reference.

Imports the reference MultiViewUNetModel
(/root/reference/2d-gaussian-splatting/guidance/See3D_modules/mv_unet.py)
on CPU torch with its GPU-only deps stubbed (diffusers mixins, xformers
memory-efficient attention -> exact math, kiui), then records:

- tests/fixtures/see3d_tiny_ref.npz : a tiny-config model's full state dict,
  a fixed input batch, and the reference forward output (numeric parity
  target for convert_torch_see3d).
- tests/fixtures/see3d_full_keys.json : the full-size (MVDream SD-2.1,
  in_channels=9) checkpoint's key -> shape map, built on the meta device.

Run: python scripts/record_see3d_fixture.py
"""

import json
import os
import sys
import types

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/2d-gaussian-splatting/guidance/See3D_modules"
FIXTURES = os.path.join(REPO, "tests", "fixtures")


def install_stubs():
    diffusers = types.ModuleType("diffusers")
    cfg_utils = types.ModuleType("diffusers.configuration_utils")
    mdl = types.ModuleType("diffusers.models")
    mdl_utils = types.ModuleType("diffusers.models.modeling_utils")

    class ConfigMixin:
        pass

    class ModelMixin(torch.nn.Module):
        pass

    cfg_utils.ConfigMixin = ConfigMixin
    mdl_utils.ModelMixin = ModelMixin
    diffusers.configuration_utils = cfg_utils
    diffusers.models = mdl
    mdl.modeling_utils = mdl_utils
    sys.modules["diffusers"] = diffusers
    sys.modules["diffusers.configuration_utils"] = cfg_utils
    sys.modules["diffusers.models"] = mdl
    sys.modules["diffusers.models.modeling_utils"] = mdl_utils

    xformers = types.ModuleType("xformers")
    xops = types.ModuleType("xformers.ops")

    def memory_efficient_attention(q, k, v, attn_bias=None, op=None):
        scale = q.shape[-1] ** -0.5
        att = torch.softmax(q @ k.transpose(-1, -2) * scale, dim=-1)
        return att @ v

    xops.memory_efficient_attention = memory_efficient_attention
    xformers.ops = xops
    sys.modules["xformers"] = xformers
    sys.modules["xformers.ops"] = xops

    kiui = types.ModuleType("kiui")
    kiui_cam = types.ModuleType("kiui.cam")
    kiui_cam.orbit_camera = lambda *a, **kw: np.eye(4, dtype=np.float32)
    kiui.cam = kiui_cam
    sys.modules["kiui"] = kiui
    sys.modules["kiui.cam"] = kiui_cam


def main():
    install_stubs()
    sys.path.insert(0, REF)
    from mv_unet import MultiViewUNetModel

    torch.manual_seed(0)
    tiny = MultiViewUNetModel(
        image_size=8, in_channels=9, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_head_channels=16, context_dim=16,
    ).eval()
    # Perturb the zero-initialized projections so parity covers them.
    with torch.no_grad():
        for name, p in tiny.named_parameters():
            if p.abs().max() == 0:
                p.add_(torch.randn_like(p) * 0.02)

    F, h, w = 2, 8, 8
    g = torch.Generator().manual_seed(1)
    x = torch.randn(F, 9, h, w, generator=g)
    t = torch.tensor([981, 17])
    ctx = torch.randn(F, 5, 16, generator=g)
    with torch.no_grad():
        out = tiny.forward(x=x, timesteps=t, context=ctx, num_frames=F)

    payload = {
        "in.x": x.numpy(), "in.t": t.numpy(), "in.ctx": ctx.numpy(),
        "out.eps": out.numpy(),
    }
    for k, v in tiny.state_dict().items():
        payload[f"sd.{k}"] = v.numpy()
    os.makedirs(FIXTURES, exist_ok=True)
    np.savez_compressed(os.path.join(FIXTURES, "see3d_tiny_ref.npz"),
                        **payload)
    print(f"tiny fixture: {len(payload)} arrays, out std "
          f"{out.std().item():.4f}")

    with torch.device("meta"):
        full = MultiViewUNetModel(
            image_size=32, in_channels=9, model_channels=320, out_channels=4,
            num_res_blocks=2, attention_resolutions=(4, 2, 1),
            channel_mult=(1, 2, 4, 4), num_head_channels=64,
            transformer_depth=1, context_dim=1024, camera_dim=16,
        )
    shapes = {k: list(v.shape) for k, v in full.state_dict().items()}
    with open(os.path.join(FIXTURES, "see3d_full_keys.json"), "w") as f:
        json.dump(shapes, f, indent=0, sort_keys=True)
    n_params = sum(int(np.prod(s)) for s in shapes.values())
    print(f"full keymap: {len(shapes)} keys, {n_params / 1e6:.1f}M params")


if __name__ == "__main__":
    main()
