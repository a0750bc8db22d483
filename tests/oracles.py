"""NumPy/PyTorch oracle implementations for unit tests.

These re-derive the reference semantics independently (straight from the math
described in SURVEY.md §2.2) in eager NumPy/torch so the JAX ops can be
checked against a second implementation. torch is CPU-only here.
"""

import numpy as np
import torch
import torch.nn.functional as F


def softmax_with_policy_torch(attn, policy, eps=1e-6, identity_escape=True):
    """attn (B,H,M,N) float32 torch; policy (B,N,1)."""
    B, H, M, N = attn.shape
    attn_policy = policy.reshape(B, 1, 1, N)
    if identity_escape:
        eye = torch.eye(N).view(1, 1, N, N)
        attn_policy = attn_policy + (1.0 - attn_policy) * eye
    max_att = torch.max(attn, dim=-1, keepdim=True)[0]
    a = (attn - max_att).to(torch.float32).exp() * attn_policy.to(torch.float32)
    a = (a + eps / N) / (a.sum(dim=-1, keepdim=True) + eps)
    return a.type_as(max_att)


def normalize_map_torch(attn_fused, discard_ratio=0.9, identity_weight=0.2):
    """attn_fused (B,M,N) torch float32, already head-fused."""
    B, M, N = attn_fused.shape
    flat = attn_fused.reshape(B, -1).clone()
    k = int(flat.shape[-1] * discard_ratio)
    if k > 0:
        _, idx = flat.topk(k, -1, False)
        flat.scatter_(1, idx, 0)
    a = flat.reshape(B, M, N)
    eye = torch.eye(N)[:M]
    a = (a + identity_weight * eye) / (1.0 + identity_weight)
    return a / a.sum(dim=-1, keepdim=True)


def attn_rollout_torch(all_attn, discard_ratio=0.9, head_fusion="mean"):
    """all_attn: list of (B,H,N,N) torch tensors."""
    B, H, N, _ = all_attn[0].shape
    result = torch.eye(N).unsqueeze(0).repeat(B, 1, 1)
    for attn in all_attn:
        if head_fusion == "mean":
            fused = attn.mean(dim=1)
        elif head_fusion == "max":
            fused = attn.max(dim=1)[0]
        else:
            fused = attn.min(dim=1)[0]
        a = normalize_map_torch(fused, discard_ratio)
        result = torch.matmul(a, result)
    return result


def l2_distances_torch(tokens, prototypes):
    """tokens (B,K,C); prototypes (P,C) — via the conv identity like the ref."""
    B, K, C = tokens.shape
    x = tokens.permute(0, 2, 1).reshape(B, C, K, 1)  # NCHW with H=K
    w = prototypes.reshape(-1, C, 1, 1)
    ones = torch.ones_like(w)
    x2 = F.conv2d(x**2, ones)
    p2 = (w**2).sum(dim=(1, 2, 3)).view(-1, 1, 1)
    xp = F.conv2d(x, w)
    d = F.relu(x2 - 2 * xp + p2)  # (B,P,K,1)
    return d[..., 0].permute(0, 2, 1)  # (B,K,P)


def batch_cov_torch(points, weights):
    """points (M,N,2); weights (M,N) — ref protopformer.py:249-257 semantics."""
    M, N, D = points.shape
    w = weights / weights.sum(dim=-1, keepdim=True) * N
    mean = (points * w[:, :, None]).mean(dim=1).unsqueeze(1)
    diffs = (points - mean).reshape(M * N, D)
    prods = torch.bmm(diffs.unsqueeze(2), diffs.unsqueeze(1)).reshape(M, N, D, D)
    prods = prods * w[:, :, None, None]
    return mean.squeeze(1), prods.sum(dim=1) / (N - 1)


def ppc_loss_torch(
    total_proto_act, cls_attn, label, proto_per_class, grid_size,
    cov_thresh, mean_thresh,
):
    """total_proto_act (B,P,K); cls_attn (B,N); label (B,)."""
    B, P, K = total_proto_act.shape
    N = grid_size * grid_size
    pts = torch.tensor(
        [[float(x), float(y)] for x in range(grid_size) for y in range(grid_size)]
    )
    pts = pts[None].repeat(B * proto_per_class, 1, 1)
    proto_idx = (label * proto_per_class).unsqueeze(-1).repeat(1, proto_per_class)
    proto_idx = proto_idx + torch.arange(proto_per_class)
    proto_idx = proto_idx[:, :, None].repeat(1, 1, K)
    act = torch.gather(total_proto_act, 1, proto_idx)  # (B, ppc, K)

    reserve_idx = torch.topk(cls_attn, k=K, dim=-1)[1].sort(dim=-1)[0]
    reserve_idx = reserve_idx[:, None, :].repeat(1, proto_per_class, 1)
    grid_w = torch.zeros(B, proto_per_class, N)
    grid_w.scatter_(2, reserve_idx, act)
    grid_w = grid_w.reshape(B * proto_per_class, N)

    mean, cov = batch_cov_torch(pts, grid_w)
    cov_loss = F.relu((cov[:, 0, 0] + cov[:, 1, 1]) / 2 - cov_thresh).mean()
    mean = mean.reshape(B, proto_per_class, 2)
    dist = torch.cdist(mean, mean)
    mask = 1.0 - torch.eye(proto_per_class)
    mean_loss = F.relu((mean_thresh - dist) * mask).mean()
    return cov_loss, mean_loss
