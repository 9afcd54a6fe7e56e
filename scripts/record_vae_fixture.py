"""Record SD-VAE conversion fixtures.

The See3D stack loads a diffusers ``AutoencoderKL`` (the SD 2.1 VAE) next to
the MV UNet (guidance/see3d_util.py:18-40).  diffusers is not vendored in
the reference, so this script carries a minimal torch replica of
AutoencoderKL written to the diffusers schema — module names, 2 resnets per
encoder down-block / 3 per decoder up-block, asymmetric-padded stride-2
downsampling, nearest-x2 upsampling, single-head Linear-projection
mid-block attention, GroupNorm(32, eps=1e-6) — and records:

- tests/fixtures/vae_tiny_ref.npz  : tiny-config state dict + deterministic
  encode/decode outputs (numeric parity target for convert_torch_vae).
- tests/fixtures/vae_full_keys.json : the full SD-VAE key -> shape map.

Run: python scripts/record_vae_fixture.py
"""

import json
import os

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")


def gn(ch):
    return nn.GroupNorm(min(32, ch), ch, eps=1e-6)


class ResnetBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1, self.conv1 = gn(cin), nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2, self.conv2 = gn(cout), nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = gn(ch)
        self.to_q, self.to_k, self.to_v = (nn.Linear(ch, ch) for _ in range(3))
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        att = torch.softmax(q @ k.transpose(1, 2) / c ** 0.5, dim=-1)
        y = self.to_out[0](att @ v)
        return x + y.transpose(1, 2).reshape(b, c, h, w)


class MidBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlock(ch, ch),
                                      ResnetBlock(ch, ch)])
        self.attentions = nn.ModuleList([Attention(ch)])

    def forward(self, x):
        return self.resnets[1](self.attentions[0](self.resnets[0](x)))


class DownBlock(nn.Module):
    def __init__(self, cin, cout, downsample):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlock(cin, cout),
                                      ResnetBlock(cout, cout)])
        if downsample:
            conv = nn.Conv2d(cout, cout, 3, stride=2, padding=0)
            self.downsamplers = nn.ModuleList([nn.Module()])
            self.downsamplers[0].conv = conv

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0].conv(F.pad(x, (0, 1, 0, 1)))
        return x


class UpBlock(nn.Module):
    def __init__(self, cin, cout, upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(cin if j == 0 else cout, cout) for j in range(3)])
        if upsample:
            conv = nn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = nn.ModuleList([nn.Module()])
            self.upsamplers[0].conv = conv

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "upsamplers"):
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class Encoder(nn.Module):
    def __init__(self, base, mult, z):
        super().__init__()
        self.conv_in = nn.Conv2d(3, base, 3, padding=1)
        blocks, cin = [], base
        for i, m in enumerate(mult):
            blocks.append(DownBlock(cin, base * m, i < len(mult) - 1))
            cin = base * m
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = MidBlock(cin)
        self.conv_norm_out = gn(cin)
        self.conv_out = nn.Conv2d(cin, 2 * z, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class Decoder(nn.Module):
    def __init__(self, base, mult, z):
        super().__init__()
        rev = list(reversed(mult))
        cin = base * rev[0]
        self.conv_in = nn.Conv2d(z, cin, 3, padding=1)
        self.mid_block = MidBlock(cin)
        blocks = []
        for i, m in enumerate(rev):
            blocks.append(UpBlock(cin, base * m, i < len(rev) - 1))
            cin = base * m
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = gn(cin)
        self.conv_out = nn.Conv2d(cin, 3, 3, padding=1)

    def forward(self, z):
        z = self.mid_block(self.conv_in(z))
        for b in self.up_blocks:
            z = b(z)
        return self.conv_out(F.silu(self.conv_norm_out(z)))


class AutoencoderKL(nn.Module):
    def __init__(self, base=128, mult=(1, 2, 4, 4), z=4):
        super().__init__()
        self.encoder = Encoder(base, mult, z)
        self.decoder = Decoder(base, mult, z)
        self.quant_conv = nn.Conv2d(2 * z, 2 * z, 1)
        self.post_quant_conv = nn.Conv2d(z, z, 1)


def main():
    torch.manual_seed(0)
    tiny = AutoencoderKL(base=32, mult=(1, 2), z=4).eval()
    x = torch.randn(1, 3, 16, 16, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        moments = tiny.quant_conv(tiny.encoder(x))
        mean = moments.chunk(2, dim=1)[0]
        rec = tiny.decoder(tiny.post_quant_conv(mean))
    payload = {"in.x": x.numpy(), "out.mean": mean.numpy(),
               "out.rec": rec.numpy()}
    for k, v in tiny.state_dict().items():
        payload[f"sd.{k}"] = v.numpy()
    os.makedirs(FIXTURES, exist_ok=True)
    np.savez_compressed(os.path.join(FIXTURES, "vae_tiny_ref.npz"), **payload)
    print(f"tiny fixture: {len(payload)} arrays, rec std {rec.std():.4f}")

    with torch.device("meta"):
        full = AutoencoderKL()
    shapes = {k: list(v.shape) for k, v in full.state_dict().items()}
    with open(os.path.join(FIXTURES, "vae_full_keys.json"), "w") as f:
        json.dump(shapes, f, indent=0, sort_keys=True)
    print(f"full keymap: {len(shapes)} keys, "
          f"{sum(int(np.prod(s)) for s in shapes.values()) / 1e6:.1f}M params")


if __name__ == "__main__":
    main()
