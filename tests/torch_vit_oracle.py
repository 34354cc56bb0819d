"""Independent torch oracle for the open_clip VisionTransformer contract.

Written from the open_clip semantics the reference relies on
(/root/reference/e4t/encoder.py:91-96: ``output_tokens=True`` with
``proj = None``): patchify conv (no bias) -> prepend class embedding ->
add positional embedding -> ln_pre -> pre-LN resblocks with
torch.nn.MultiheadAttention + exact-GELU MLP -> ``(ln_post(cls), tokens)``
where the patch tokens are returned UN-normalized (no ln_post). This is
an independent implementation, not a copy of open_clip — its point is to
catch silent ln_post/token-normalization drift in models/vit.py.

State-dict key layout intentionally matches what ``vit_from_torch``
consumes (the open_clip visual-tower naming saved inside encoder.pt).
"""
from collections import OrderedDict

import torch
from torch import nn


class _ResBlock(nn.Module):
    def __init__(self, width: int, heads: int, mlp_dim: int):
        super().__init__()
        self.ln_1 = nn.LayerNorm(width)
        self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(width)
        self.mlp = nn.Sequential(OrderedDict([
            ("c_fc", nn.Linear(width, mlp_dim)),
            ("gelu", nn.GELU()),
            ("c_proj", nn.Linear(mlp_dim, width)),
        ]))

    def forward(self, x):
        r = self.ln_1(x)
        a, _ = self.attn(r, r, r, need_weights=False)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class _Transformer(nn.Module):
    def __init__(self, width: int, layers: int, heads: int, mlp_dim: int):
        super().__init__()
        self.resblocks = nn.ModuleList(
            [_ResBlock(width, heads, mlp_dim) for _ in range(layers)])

    def forward(self, x):
        for block in self.resblocks:
            x = block(x)
        return x


class TorchOpenClipVisionTower(nn.Module):
    """open_clip VisionTransformer with output_tokens=True, proj removed."""

    def __init__(self, image_size: int, patch_size: int, width: int,
                 layers: int, heads: int, mlp_dim: int):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, kernel_size=patch_size,
                               stride=patch_size, bias=False)
        scale = width ** -0.5
        n_tokens = (image_size // patch_size) ** 2 + 1
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        self.positional_embedding = nn.Parameter(
            scale * torch.randn(n_tokens, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = _Transformer(width, layers, heads, mlp_dim)
        self.ln_post = nn.LayerNorm(width)

    def forward(self, x):
        x = self.conv1(x)                        # (B, W, g, g)
        x = x.flatten(2).transpose(1, 2)         # (B, g*g, W)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + self.positional_embedding
        x = self.ln_pre(x)
        x = self.transformer(x)
        pooled = self.ln_post(x[:, 0])           # ln_post on CLS only
        tokens = x[:, 1:]                        # tokens stay un-normalized
        return pooled, tokens
