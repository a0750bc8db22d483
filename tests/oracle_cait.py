"""Eager-PyTorch oracle: CaiT backbone (talking heads + class attention).

Independent re-derivation for parity testing; timm-layout state dicts.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.oracles import softmax_with_policy_torch

class RefCaitSABlock(nn.Module):
    """Talking-heads self-attention block with LayerScale (timm layout)."""

    def __init__(self, dim, heads, mlp_ratio=4.0, init_scale=1e-5):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.gamma_1 = nn.Parameter(init_scale * torch.ones(dim))
        self.gamma_2 = nn.Parameter(init_scale * torch.ones(dim))

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = nn.Linear(dim, dim * 3, bias=True)
                self.proj = nn.Linear(dim, dim)
                self.proj_l = nn.Linear(heads, heads)
                self.proj_w = nn.Linear(heads, heads)

        class Mlp(nn.Module):
            def __init__(self):
                super().__init__()
                hidden = int(dim * mlp_ratio)
                self.fc1 = nn.Linear(dim, hidden)
                self.fc2 = nn.Linear(hidden, dim)

        self.attn = Attn()
        self.mlp = Mlp()

    def forward(self, x):
        B, N, C = x.shape
        H = self.heads
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, H, C // H).permute(2, 0, 3, 1, 4)
        # CaiT scales q BEFORE the matmul (ref: cait_models_attn.py:118)
        q, k, v = qkv[0] * (C // H) ** -0.5, qkv[1], qkv[2]
        logits = q @ k.transpose(-2, -1)
        logits = self.attn.proj_l(logits.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        probs = logits.softmax(dim=-1)
        probs = self.attn.proj_w(probs.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        h = (probs @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.gamma_1 * self.attn.proj(h)
        x = x + self.gamma_2 * self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x, probs


class RefCaitCABlock(nn.Module):
    """Class-attention block with LayerScale (timm layout)."""

    def __init__(self, dim, heads, mlp_ratio=4.0, init_scale=1e-5):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.gamma_1 = nn.Parameter(init_scale * torch.ones(dim))
        self.gamma_2 = nn.Parameter(init_scale * torch.ones(dim))

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.q = nn.Linear(dim, dim, bias=True)
                self.k = nn.Linear(dim, dim, bias=True)
                self.v = nn.Linear(dim, dim, bias=True)
                self.proj = nn.Linear(dim, dim)

        class Mlp(nn.Module):
            def __init__(self):
                super().__init__()
                hidden = int(dim * mlp_ratio)
                self.fc1 = nn.Linear(dim, hidden)
                self.fc2 = nn.Linear(hidden, dim)

        self.attn = Attn()
        self.mlp = Mlp()

    def forward(self, x, x_cls, policy=None):
        u = torch.cat([x_cls, x], dim=1)
        B, N, C = u.shape
        H = self.heads
        h = self.norm1(u)
        q = self.attn.q(h[:, :1]).reshape(B, 1, H, C // H).permute(0, 2, 1, 3)
        k = self.attn.k(h).reshape(B, N, H, C // H).permute(0, 2, 1, 3)
        v = self.attn.v(h).reshape(B, N, H, C // H).permute(0, 2, 1, 3)
        logits = (q * (C // H) ** -0.5) @ k.transpose(-2, -1)
        if policy is None:
            probs = logits.softmax(dim=-1)
        else:
            probs = softmax_with_policy_torch(
                logits, policy, identity_escape=False
            )
        h = (probs @ v).transpose(1, 2).reshape(B, 1, C)
        x_cls = x_cls + self.gamma_1 * self.attn.proj(h)
        x_cls = x_cls + self.gamma_2 * self.mlp.fc2(
            F.gelu(self.mlp.fc1(self.norm2(x_cls)))
        )
        return x_cls, probs


class RefCait(nn.Module):
    """timm-layout CaiT with policy-masked class-attention pruning."""

    def __init__(self, img_size=32, patch_size=8, dim=24, depth=3, heads=2,
                 depth_token_only=2, init_scale=1e-5):
        super().__init__()
        self.dim = dim
        n = (img_size // patch_size) ** 2

        class PatchEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(3, dim, patch_size, patch_size)

        self.patch_embed = PatchEmbed()
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [RefCaitSABlock(dim, heads, init_scale=init_scale)
             for _ in range(depth)]
        )
        self.blocks_token_only = nn.ModuleList(
            [RefCaitCABlock(dim, heads, init_scale=init_scale)
             for _ in range(depth_token_only)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def embed_all(self, x):
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = t + self.pos_embed
        return self.cls_token.expand(x.shape[0], -1, -1), t

    def masked_forward(self, cls_embed, x_embed, reserve_layer_nums,
                       discard_ratio=0.9):
        from tests.oracles import normalize_map_torch

        B, patch_num = x_embed.shape[0], x_embed.shape[1]
        layer_map = dict(reserve_layer_nums)
        x = x_embed
        all_sa = []
        for blk in self.blocks:
            x, attn = blk(x)
            all_sa.append(attn)

        cls_tokens = cls_embed
        policy = torch.ones(B, 1 + patch_num, 1)
        all_ca_norm = []
        cls_token_attn = None
        for i, blk in enumerate(self.blocks_token_only):
            if i in layer_map:
                # normalize all maps; SA product; mean CA; drop CLS col
                result = torch.eye(patch_num)[None].repeat(B, 1, 1)
                for a in all_sa:
                    na = normalize_map_torch(a.mean(dim=1), discard_ratio)
                    result = na @ result
                ca = torch.cat(all_ca_norm, dim=1).mean(dim=1, keepdim=True)
                scores = (ca[:, :, 1:] @ result).detach()
                cls_token_attn = scores[:, 0]
                idx = torch.topk(cls_token_attn, k=layer_map[i], dim=-1)[1]
                idx = idx.sort(dim=-1)[0] + 1
                policy = torch.zeros(B, 1 + patch_num)
                policy[:, 0] = 1.0
                policy.scatter_(1, idx, 1.0)
                policy = policy[:, :, None]
            cls_tokens, attn = blk(x, cls_tokens, policy)
            all_ca_norm.append(
                normalize_map_torch(attn.mean(dim=1), discard_ratio)
            )
        x = torch.cat([cls_tokens, x], dim=1)
        return self.norm(x), cls_token_attn


