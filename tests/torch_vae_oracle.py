"""Independent torch oracle for the diffusers-0.14 AutoencoderKL semantics.

The reference uses diffusers' AutoencoderKL unmodified
(/root/reference/pretrain_e4t.py:237, requirements.txt pins
diffusers==0.14.0). This is an independently written torch
implementation of those semantics — GroupNorm(eps=1e-6) + SiLU resnets,
asymmetric-pad stride-2 downsample, nearest-2x + conv upsample,
single-head mid attention scaled by 1/sqrt(C), quant/post_quant 1x1
convs, logvar clamp [-30, 20] — used to catch silent drift in
models/vae.py. State-dict keys match the diffusers layout consumed by
``vae_from_torch``.
"""
import torch
import torch.nn.functional as F
from torch import nn


def _gn(c: int, groups: int) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=groups, num_channels=c, eps=1e-6)


class _Resnet(nn.Module):
    def __init__(self, cin: int, cout: int, groups: int):
        super().__init__()
        self.norm1 = _gn(cin, groups)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = _gn(cout, groups)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(cin, cout, 1) if cin != cout
                              else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _Attention(nn.Module):
    def __init__(self, c: int, groups: int):
        super().__init__()
        self.group_norm = _gn(c, groups)
        self.query = nn.Linear(c, c)
        self.key = nn.Linear(c, c)
        self.value = nn.Linear(c, c)
        self.proj_attn = nn.Linear(c, c)

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.group_norm(x).view(b, c, hh * ww).transpose(1, 2)
        q, k, v = self.query(h), self.key(h), self.value(h)
        attn = torch.softmax(q @ k.transpose(1, 2) / (c ** 0.5), dim=-1)
        h = self.proj_attn(attn @ v)
        return x + h.transpose(1, 2).view(b, c, hh, ww)


class _Downsample(nn.Module):
    def __init__(self, c: int):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))  # asymmetric (right/bottom)


class _Upsample(nn.Module):
    def __init__(self, c: int):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _MidBlock(nn.Module):
    def __init__(self, c: int, groups: int):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_Resnet(c, c, groups), _Resnet(c, c, groups)])
        self.attentions = nn.ModuleList([_Attention(c, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _DownBlock(nn.Module):
    def __init__(self, cin: int, cout: int, layers: int, groups: int,
                 downsample: bool):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_Resnet(cin if i == 0 else cout, cout, groups)
             for i in range(layers)])
        self.downsamplers = (nn.ModuleList([_Downsample(cout)])
                             if downsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class _UpBlock(nn.Module):
    def __init__(self, cin: int, cout: int, layers: int, groups: int,
                 upsample: bool):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_Resnet(cin if i == 0 else cout, cout, groups)
             for i in range(layers)])
        self.upsamplers = (nn.ModuleList([_Upsample(cout)])
                           if upsample else None)

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class _Encoder(nn.Module):
    def __init__(self, cin, block_out, layers, groups, latent):
        super().__init__()
        self.conv_in = nn.Conv2d(cin, block_out[0], 3, padding=1)
        blocks, prev = [], block_out[0]
        for i, c in enumerate(block_out):
            blocks.append(_DownBlock(prev, c, layers, groups,
                                     downsample=i < len(block_out) - 1))
            prev = c
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = _MidBlock(prev, groups)
        self.conv_norm_out = _gn(prev, groups)
        self.conv_out = nn.Conv2d(prev, 2 * latent, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class _Decoder(nn.Module):
    def __init__(self, cout, block_out, layers, groups, latent):
        super().__init__()
        rev = list(reversed(block_out))
        self.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
        self.mid_block = _MidBlock(rev[0], groups)
        blocks, prev = [], rev[0]
        for i, c in enumerate(rev):
            blocks.append(_UpBlock(prev, c, layers + 1, groups,
                                   upsample=i < len(rev) - 1))
            prev = c
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = _gn(prev, groups)
        self.conv_out = nn.Conv2d(prev, cout, 3, padding=1)

    def forward(self, z):
        z = self.conv_in(z)
        z = self.mid_block(z)
        for b in self.up_blocks:
            z = b(z)
        return self.conv_out(F.silu(self.conv_norm_out(z)))


class TorchAutoencoderKL(nn.Module):
    def __init__(self, in_channels=3, out_channels=3, latent_channels=4,
                 block_out_channels=(128, 256, 512, 512), layers_per_block=2,
                 norm_num_groups=32):
        super().__init__()
        self.encoder = _Encoder(in_channels, block_out_channels,
                                layers_per_block, norm_num_groups,
                                latent_channels)
        self.decoder = _Decoder(out_channels, block_out_channels,
                                layers_per_block, norm_num_groups,
                                latent_channels)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels,
                                    1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = torch.chunk(moments, 2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
