"""Independent torch implementation of the SD v1 UNet architecture.

Written from the architecture specification (conv/resnet/transformer
wiring, norm epsilons, activation choices) as a numerical oracle for the
flax UNet — it consumes the diffusers-named state dict our converter
emits, so a passing comparison validates both the model math and
utils/convert.unet_to_torch key-for-key.
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim):
    half = dim // 2
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32)
    emb = torch.exp(exponent / half)
    emb = t.float()[:, None] * emb[None]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    # flip_sin_to_cos=True
    return torch.cat([emb[:, half:], emb[:, :half]], dim=-1)


class Resnet(nn.Module):
    def __init__(self, cin, cout, temb, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-5)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-5)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(cin, cout, 1) if cin != cout
                              else None)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Attn(nn.Module):
    def __init__(self, dim, ctx, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx, dim, bias=False)
        self.to_v = nn.Linear(ctx, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, d = x.shape
        h = self.heads
        q = self.to_q(x).view(b, s, h, d // h).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], h, d // h).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], h, d // h).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, s, d)
        return self.to_out[0](o)


class GEGLU(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = nn.Linear(dim, dim * 8)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TxBlock(nn.Module):
    def __init__(self, dim, ctx, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attn(dim, dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attn(dim, ctx, heads)
        self.norm3 = nn.LayerNorm(dim)

        class FF(nn.Module):
            def __init__(self):
                super().__init__()
                self.net = nn.ModuleList(
                    [GEGLU(dim), nn.Identity(), nn.Linear(dim * 4, dim)])

            def forward(self, x):
                return self.net[2](self.net[0](x))

        self.ff = FF()

    def forward(self, x, ctx):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), ctx) + x
        return self.ff(self.norm3(x)) + x


class Tx2D(nn.Module):
    def __init__(self, dim, ctx, heads, groups, linear=False):
        super().__init__()
        self.linear = linear
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = nn.Linear(dim, dim) if linear else nn.Conv2d(dim, dim, 1)
        self.transformer_blocks = nn.ModuleList([TxBlock(dim, ctx, heads)])
        self.proj_out = (nn.Linear(dim, dim) if linear
                         else nn.Conv2d(dim, dim, 1))

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        res = x
        if self.linear:  # SD v2 use_linear_projection ordering
            x = self.norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
            x = self.proj_in(x)
            x = self.transformer_blocks[0](x, ctx)
            x = self.proj_out(x)
            return x.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + res
        x = self.proj_in(self.norm(x))
        x = x.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        x = self.transformer_blocks[0](x, ctx)
        x = x.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        return self.proj_out(x) + res


class Downsampler(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsampler(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TorchTinyUNet(nn.Module):
    """Matches e4t_diffusion_tpu.models.unet.UNetConfig.tiny():
    blocks (32, 64), layers_per_block=1, heads=4, groups=8."""

    def __init__(self, ctx_dim=32, linear_proj=False, class_proj_dim=None):
        super().__init__()
        g, heads = 8, 4
        temb = 128
        lin = linear_proj
        self.conv_in = nn.Conv2d(4, 32, 3, padding=1)

        class TimeEmb(nn.Module):
            def __init__(self, cin=32):
                super().__init__()
                self.linear_1 = nn.Linear(cin, temb)
                self.linear_2 = nn.Linear(temb, temb)

            def forward(self, t):
                return self.linear_2(F.silu(self.linear_1(t)))

        self.time_embedding = TimeEmb()
        self.class_embedding = (TimeEmb(class_proj_dim)
                                if class_proj_dim else None)

        class Down0(nn.Module):  # CrossAttnDownBlock2D(32), downsample
            def __init__(self):
                super().__init__()
                self.resnets = nn.ModuleList([Resnet(32, 32, temb, g)])
                self.attentions = nn.ModuleList(
                    [Tx2D(32, ctx_dim, heads, g, linear=lin)])
                self.downsamplers = nn.ModuleList([Downsampler(32)])

        class Down1(nn.Module):  # DownBlock2D(64), final (no downsample)
            def __init__(self):
                super().__init__()
                self.resnets = nn.ModuleList([Resnet(32, 64, temb, g)])

        self.down_blocks = nn.ModuleList([Down0(), Down1()])

        class Mid(nn.Module):
            def __init__(self):
                super().__init__()
                self.resnets = nn.ModuleList(
                    [Resnet(64, 64, temb, g), Resnet(64, 64, temb, g)])
                self.attentions = nn.ModuleList(
                    [Tx2D(64, ctx_dim, heads, g, linear=lin)])

        self.mid_block = Mid()

        class Up0(nn.Module):  # UpBlock2D(64): 2 resnets, upsample
            def __init__(self):
                super().__init__()
                self.resnets = nn.ModuleList(
                    [Resnet(64 + 64, 64, temb, g), Resnet(64 + 32, 64, temb, g)])
                self.upsamplers = nn.ModuleList([Upsampler(64)])

        class Up1(nn.Module):  # CrossAttnUpBlock2D(32): 2 resnets, final
            def __init__(self):
                super().__init__()
                self.resnets = nn.ModuleList(
                    [Resnet(64 + 32, 32, temb, g), Resnet(32 + 4 * 0 + 32, 32, temb, g)])
                self.attentions = nn.ModuleList(
                    [Tx2D(32, ctx_dim, heads, g, linear=lin),
                     Tx2D(32, ctx_dim, heads, g, linear=lin)])
                self.upsamplers = None

        self.up_blocks = nn.ModuleList([Up0(), Up1()])
        self.conv_norm_out = nn.GroupNorm(g, 32, eps=1e-5)
        self.conv_out = nn.Conv2d(32, 4, 3, padding=1)

    def forward(self, x, t, ctx, class_labels=None):
        temb = self.time_embedding(timestep_embedding(t, 32))
        if self.class_embedding is not None:
            temb = temb + self.class_embedding(class_labels)
        x = self.conv_in(x)
        res = [x]
        d0 = self.down_blocks[0]
        x = d0.resnets[0](x, temb)
        x = d0.attentions[0](x, ctx)
        res.append(x)
        x = d0.downsamplers[0](x)
        res.append(x)
        d1 = self.down_blocks[1]
        x = d1.resnets[0](x, temb)
        res.append(x)
        m = self.mid_block
        x = m.resnets[0](x, temb)
        x = m.attentions[0](x, ctx)
        x = m.resnets[1](x, temb)
        # up block 0 (UpBlock2D): layers_per_block+1 = 2 resnets
        u0 = self.up_blocks[0]
        x = u0.resnets[0](torch.cat([x, res.pop()], dim=1), temb)
        x = u0.resnets[1](torch.cat([x, res.pop()], dim=1), temb)
        x = u0.upsamplers[0](x)
        u1 = self.up_blocks[1]
        x = u1.resnets[0](torch.cat([x, res.pop()], dim=1), temb)
        x = u1.attentions[0](x, ctx)
        x = u1.resnets[1](torch.cat([x, res.pop()], dim=1), temb)
        x = u1.attentions[1](x, ctx)
        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        return x


class TimeEmb(nn.Module):
    def __init__(self, cin, temb):
        super().__init__()
        self.linear_1 = nn.Linear(cin, temb)
        self.linear_2 = nn.Linear(temb, temb)

    def forward(self, t):
        return self.linear_2(F.silu(self.linear_1(t)))


class TorchGenericUNet(nn.Module):
    """Geometry-general UNet oracle built from the same independent
    blocks as TorchTinyUNet — instantiate with the SD-v1 defaults for
    the full-geometry numerics check (tests/test_unet_full_geometry.py),
    mirroring the reference's own full-size smoke
    (/root/reference/e4t/models/unet_2d_condition.py:565-586)."""

    def __init__(self, block_out_channels=(320, 640, 1280, 1280),
                 down_block_types=("CrossAttnDownBlock2D",) * 3
                 + ("DownBlock2D",),
                 up_block_types=("UpBlock2D",)
                 + ("CrossAttnUpBlock2D",) * 3,
                 layers_per_block=2, heads=8, ctx_dim=768, groups=32,
                 linear_proj=False):
        super().__init__()
        chans = block_out_channels
        temb = chans[0] * 4
        self._sin_dim = chans[0]
        self.conv_in = nn.Conv2d(4, chans[0], 3, padding=1)
        self.time_embedding = TimeEmb(chans[0], temb)
        self._cross_down = [t == "CrossAttnDownBlock2D"
                            for t in down_block_types]
        self._cross_up = [t == "CrossAttnUpBlock2D" for t in up_block_types]
        hd = ((lambda i: heads[i]) if isinstance(heads, (tuple, list))
              else (lambda i: heads))

        res_ch = [chans[0]]  # skip-connection channel bookkeeping
        self.down_blocks = nn.ModuleList()
        out_c = chans[0]
        for bi, cross in enumerate(self._cross_down):
            in_c, out_c = out_c, chans[bi]
            final = bi == len(chans) - 1
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [Resnet(in_c if j == 0 else out_c, out_c, temb, groups)
                 for j in range(layers_per_block)])
            if cross:
                blk.attentions = nn.ModuleList(
                    [Tx2D(out_c, ctx_dim, hd(bi), groups, linear=linear_proj)
                     for _ in range(layers_per_block)])
            res_ch += [out_c] * layers_per_block
            if not final:
                blk.downsamplers = nn.ModuleList([Downsampler(out_c)])
                res_ch.append(out_c)
            self.down_blocks.append(blk)

        mid = nn.Module()
        mid.resnets = nn.ModuleList([Resnet(chans[-1], chans[-1], temb, groups),
                                     Resnet(chans[-1], chans[-1], temb, groups)])
        mid.attentions = nn.ModuleList(
            [Tx2D(chans[-1], ctx_dim, hd(len(chans) - 1), groups,
                  linear=linear_proj)])
        self.mid_block = mid

        rev = list(reversed(chans))
        self.up_blocks = nn.ModuleList()
        prev_c = chans[-1]
        for bi, cross in enumerate(self._cross_up):
            out_c = rev[bi]
            final = bi == len(chans) - 1
            n = layers_per_block + 1
            blk = nn.Module()
            rs = []
            for j in range(n):
                skip = res_ch.pop()
                rs.append(Resnet((prev_c if j == 0 else out_c) + skip,
                                 out_c, temb, groups))
            blk.resnets = nn.ModuleList(rs)
            if cross:
                blk.attentions = nn.ModuleList(
                    [Tx2D(out_c, ctx_dim, hd(len(chans) - 1 - bi), groups,
                          linear=linear_proj) for _ in range(n)])
            if not final:
                blk.upsamplers = nn.ModuleList([Upsampler(out_c)])
            self.up_blocks.append(blk)
            prev_c = out_c
        self.conv_norm_out = nn.GroupNorm(groups, chans[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chans[0], 4, 3, padding=1)

    def forward(self, x, t, ctx, return_tap=False):
        temb = self.time_embedding(timestep_embedding(t, self._sin_dim))
        x = self.conv_in(x)
        res = [x]
        for bi, blk in enumerate(self.down_blocks):
            for j, rn in enumerate(blk.resnets):
                x = rn(x, temb)
                if self._cross_down[bi]:
                    x = blk.attentions[j](x, ctx)
                res.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
                res.append(x)
        m = self.mid_block
        x = m.resnets[0](x, temb)
        x = m.attentions[0](x, ctx)
        x = m.resnets[1](x, temb)
        if return_tap:
            # the E4T tap: every down residual + mid, spatially pooled
            return torch.cat([r.mean(dim=(2, 3)) for r in res + [x]], dim=1)
        for bi, blk in enumerate(self.up_blocks):
            for j, rn in enumerate(blk.resnets):
                x = rn(torch.cat([x, res.pop()], dim=1), temb)
                if self._cross_up[bi]:
                    x = blk.attentions[j](x, ctx)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))
