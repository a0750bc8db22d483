"""Eager-PyTorch oracle: DeiT backbone + PPNet head (reference semantics).

Independent re-derivation (functional style) used for parity testing and for
exercising the checkpoint converter: ``state_dict()`` emits timm-layout keys.
CPU-only, fp32, eval-mode semantics (no dropout/drop-path).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.oracles import (
    attn_rollout_torch,
    softmax_with_policy_torch,
)


class RefBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0, eps=1e-6):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.norm2 = nn.LayerNorm(dim, eps=eps)

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = nn.Linear(dim, dim * 3, bias=True)
                self.proj = nn.Linear(dim, dim)

        class Mlp(nn.Module):
            def __init__(self):
                super().__init__()
                hidden = int(dim * mlp_ratio)
                self.fc1 = nn.Linear(dim, hidden)
                self.fc2 = nn.Linear(hidden, dim)

        self.attn = Attn()
        self.mlp = Mlp()

    def forward(self, x, policy):
        B, N, C = x.shape
        H = self.heads
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, H, C // H).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        logits = (q @ k.transpose(-2, -1)) * (C // H) ** -0.5
        if policy is None:
            probs = logits.softmax(dim=-1)
        else:
            probs = softmax_with_policy_torch(logits, policy)
        h = (probs @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.attn.proj(h)
        x = x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x, probs


class RefDeiT(nn.Module):
    """timm-layout DeiT with policy-masked pruning forward."""

    def __init__(self, img_size=32, patch_size=8, dim=24, depth=3, heads=2):
        super().__init__()
        self.dim, self.depth = dim, depth
        n = (img_size // patch_size) ** 2

        class PatchEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(3, dim, patch_size, patch_size)

        self.patch_embed = PatchEmbed()
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = nn.ModuleList([RefBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def embed_all(self, x):
        """x: (B, 3, H, W) NCHW."""
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), t], dim=1)
        t = t + self.pos_embed
        return t[:, :1], t[:, 1:]

    def masked_forward(self, cls_embed, x_embed, reserve_layer_nums,
                       discard_ratio=0.9):
        B, patch_num = x_embed.shape[0], x_embed.shape[1]
        layer_map = dict(reserve_layer_nums)
        x = torch.cat([cls_embed, x_embed], dim=1)
        policy = torch.ones(B, 1 + patch_num, 1)
        all_attn = []
        cls_token_attn = None
        for i, blk in enumerate(self.blocks):
            if i in layer_map:
                roll = attn_rollout_torch(
                    all_attn, discard_ratio=discard_ratio
                ).detach()
                cls_token_attn = roll[:, 0, 1:]
                idx = torch.topk(cls_token_attn, k=layer_map[i], dim=-1)[1]
                idx = idx.sort(dim=-1)[0] + 1
                policy = torch.zeros(B, 1 + patch_num)
                policy[:, 0] = 1.0
                policy.scatter_(1, idx, 1.0)
                policy = policy[:, :, None]
            x, attn = blk(x, policy)
            all_attn.append(attn)
        return self.norm(x), cls_token_attn

    def plain_forward(self, x):
        cls_embed, x_embed = self.embed_all(x)
        t = torch.cat([cls_embed, x_embed], dim=1)
        for blk in self.blocks:
            t, _ = blk(t, None)
        return self.norm(t)


class RefPPNet(nn.Module):
    """timm-layout PPNet over RefDeiT (eval semantics)."""

    def __init__(
        self, backbone, num_prototypes=40, proto_dim=16, num_classes=4,
        reserve_layer_nums=((2, 9),), global_per_class=3, global_coe=0.5,
        epsilon=1e-4, discard_ratio=0.9,
    ):
        super().__init__()
        self.features = backbone
        self.reserve_layer_nums = list(reserve_layer_nums)
        self.global_coe = global_coe
        self.epsilon = epsilon
        self.discard_ratio = discard_ratio
        self.add_on_layers = nn.Sequential(
            nn.Conv2d(backbone.dim, proto_dim, 1), nn.Sigmoid()
        )
        self.prototype_vectors = nn.Parameter(
            torch.rand(num_prototypes, proto_dim, 1, 1)
        )
        # the real reference registers this frozen all-ones parameter
        # (protopformer.py:123-124), so strict load_state_dict requires it
        self.ones = nn.Parameter(
            torch.ones(num_prototypes, proto_dim, 1, 1), requires_grad=False
        )
        pg = num_classes * global_per_class
        self.prototype_vectors_global = nn.Parameter(
            torch.rand(pg, proto_dim, 1, 1)
        )
        self.last_layer = nn.Linear(num_prototypes, num_classes, bias=False)
        self.last_layer_global = nn.Linear(pg, num_classes, bias=False)
        per = num_prototypes // num_classes
        w = torch.full((num_classes, num_prototypes), -0.5)
        for j in range(num_prototypes):
            w[j // per, j] = 1.0
        self.last_layer.weight.data.copy_(w)
        wg = torch.full((num_classes, pg), -0.5)
        for j in range(pg):
            wg[j // global_per_class, j] = 1.0
        self.last_layer_global.weight.data.copy_(wg)

    def _dist(self, tokens, protos):
        """tokens (B, K, C); protos (P, C, 1, 1) -> (B, P, K) distances."""
        p = protos[:, :, 0, 0]
        x2 = (tokens ** 2).sum(-1)[:, None, :]
        p2 = (p ** 2).sum(-1)[None, :, None]
        xp = torch.einsum("bkc,pc->bpk", tokens, p)
        return F.relu(x2 - 2 * xp + p2)

    def _sim(self, d):
        return torch.log((d + 1) / (d + self.epsilon))

    def _trunk(self, x):
        """Shared eval trunk: (img tokens (B,K,P_dim), cls (B,1,P_dim),
        cls_token_attn) after add-on projection."""
        cls_embed, x_embed = self.features.embed_all(x)
        t, cls_token_attn = self.features.masked_forward(
            cls_embed, x_embed, self.reserve_layer_nums, self.discard_ratio
        )
        k = self.reserve_layer_nums[-1][1]
        idx = torch.topk(cls_token_attn, k=k, dim=-1)[1].sort(dim=-1)[0]
        img = torch.gather(
            t[:, 1:], 1, idx[:, :, None].expand(-1, -1, t.shape[-1])
        )
        cls_t = t[:, :1]
        conv = self.add_on_layers[0]
        sig = self.add_on_layers[1]
        proj = lambda z: sig(  # noqa: E731
            torch.einsum("bkc,pc->bkp", z, conv.weight[:, :, 0, 0]) + conv.bias
        )
        return proj(img), proj(cls_t), cls_token_attn

    def push_forward(self, x):
        """Offline-analysis forward (ref: protopformer.py:337-344):
        (cls_token_attn, local log-sim activation maps (B, P, K))."""
        img, _, cls_token_attn = self._trunk(x)
        return cls_token_attn, self._sim(self._dist(img, self.prototype_vectors))

    def forward(self, x):
        img, cls_t, cls_token_attn = self._trunk(x)

        d_local = self._dist(img, self.prototype_vectors)  # (B, P, K)
        acts_local = self._sim(d_local).amax(dim=-1)  # (B, P)
        d_global = self._dist(cls_t, self.prototype_vectors_global)[:, :, 0]
        acts_global = self._sim(d_global)
        logits_local = self.last_layer(acts_local)
        logits_global = self.last_layer_global(acts_global)
        logits = (
            self.global_coe * logits_global
            + (1 - self.global_coe) * logits_local
        )
        return logits, cls_token_attn, d_local, logits_global, logits_local
