"""Interpretability consistency score (EvalProtoPNet protocol).

Rebuild of the reference's eval_interpretability.py (module-level script,
ref: eval_interpretability.py:96-337): for every CUB test image, take the
target class's ``proto_per_class`` local prototype activation maps
(push_forward), scatter them from the k reserved tokens to the 14x14 grid,
bicubic-upsample to 224, place a (2*half_size)^2 box at the argmax
(half_size=36 -> 72x72, ref :183), and record which of the 15 annotated bird
parts fall inside the box (only parts inside the image bbox count, and the
box is intersected with the bbox region semantics of the protocol). A
prototype is *consistent* if the same part is hit in >= part_thresh (0.8) of
its class's images; the Consistency Score is the mean over all prototypes
(ref: :309-337). Published reference scores: DeiT-Ti 82.65 / DeiT-S 31.30 /
CaiT-XXS 71.45 (README.md:130-133).

Device/host split: the batched push_forward runs jitted on TPU; the
per-image box/part matching is O(15) numpy work overlapped with the next
batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

import jax

from protopformer_tpu.data.local_parts import CubPartAnnotations, in_bbox
from protopformer_tpu.tools.visualize import scatter_activations_to_grid


@dataclass
class ConsistencyConfig:
    half_size: int = 36  # 72x72 box (ref: eval_interpretability.py:183)
    part_thresh: float = 0.8  # (ref: :184)
    img_size: int = 224
    num_parts: int = 15


def part_hits_for_image(
    act_maps: np.ndarray,  # (ppc, g, g) scattered grid activations
    part_locs: List[Tuple[int, float, float]],  # visible (part_id, x, y)
    bbox: Tuple[float, float, float, float],
    scale_x: float,
    scale_y: float,
    cfg: ConsistencyConfig,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-prototype part-hit rows for one image.

    Returns:
      (hits (ppc, num_parts) 0/1, visible (num_parts,) 0/1) —
      part coordinates are scaled from original image space to the
      model's 224 input (ref: :244-259 coordinate rescale).
    """
    import cv2

    ppc = act_maps.shape[0]
    hits = np.zeros((ppc, cfg.num_parts), np.float32)
    visible = np.zeros((cfg.num_parts,), np.float32)
    scaled_parts = []
    for part_id, x, y in part_locs:
        if in_bbox(x, y, bbox):
            visible[part_id - 1] = 1.0
            scaled_parts.append((part_id - 1, x * scale_x, y * scale_y))

    for j in range(ppc):
        up = cv2.resize(
            act_maps[j], (cfg.img_size, cfg.img_size),
            interpolation=cv2.INTER_CUBIC,
        )
        cy, cx = np.unravel_index(np.argmax(up), up.shape)
        y0, y1 = cy - cfg.half_size, cy + cfg.half_size
        x0, x1 = cx - cfg.half_size, cx + cfg.half_size
        for pid, px, py in scaled_parts:
            if x0 <= px <= x1 and y0 <= py <= y1:
                hits[j, pid] = 1.0
    return hits, visible


def consistency_score(
    model,
    params,
    loader,
    annotations: CubPartAnnotations,
    image_ids: np.ndarray,
    image_sizes: Dict[int, Tuple[int, int]],
    ppnet_cfg,
    cfg: Optional[ConsistencyConfig] = None,
    logger=None,
) -> float:
    """Consistency Score over a test loader (ref: :190-337).

    Args:
      loader: yields batches with 'image', 'label', 'valid', and
        'position' (index into image_ids, so padded samples are skipped).
      image_ids: dataset-native CUB ids aligned with loader order.
      image_sizes: id -> (width, height) of the ORIGINAL image.
    """
    cfg = cfg or ConsistencyConfig()
    ppc = ppnet_cfg.num_prototypes_per_class
    P = ppnet_cfg.num_prototypes
    num_classes = ppnet_cfg.num_classes

    push = jax.jit(
        lambda p, im: model.apply(
            {"params": p}, im, method=lambda m, x: m.push_forward(x)
        )
    )

    # per-prototype accumulators
    hit_sum = np.zeros((P, cfg.num_parts), np.float64)
    vis_sum = np.zeros((P, cfg.num_parts), np.float64)
    img_count = np.zeros((P,), np.float64)

    seen = 0
    for batch in loader:
        out = push(params, batch["image"])
        cls_attn = np.asarray(out.cls_token_attn)
        acts = np.asarray(out.proto_acts)  # (B, P, k, k)
        labels = np.asarray(batch["label"])
        valid = np.asarray(batch.get("valid", np.ones(labels.shape[0])))
        pos = np.asarray(batch["position"])
        B = labels.shape[0]
        K = acts.shape[-1] ** 2
        grid_len = cls_attn.shape[-1]
        # select the label's ppc maps BEFORE the host scatter: (B, ppc, k, k)
        sel = np.stack([
            acts[b, labels[b] * ppc:(labels[b] + 1) * ppc] for b in range(B)
        ])
        grid = scatter_activations_to_grid(
            sel.reshape(B, ppc, K), cls_attn, grid_len
        )  # (B, ppc, g, g)
        for b in range(B):
            if valid[b] == 0:
                continue
            img_id = int(image_ids[pos[b]])
            if img_id not in annotations.id_to_part_loc:
                continue
            w, h = image_sizes[img_id]
            hits, vis = part_hits_for_image(
                grid[b],
                annotations.id_to_part_loc[img_id],
                annotations.id_to_bbox[img_id],
                cfg.img_size / w,
                cfg.img_size / h,
                cfg,
            )
            base = labels[b] * ppc
            hit_sum[base:base + ppc] += hits
            vis_sum[base:base + ppc] += vis[None, :]
            img_count[base:base + ppc] += 1
            seen += 1
        if logger is not None and seen % 500 < B:
            logger.info(f"consistency eval: {seen} images")

    # a prototype is consistent if some part is hit in >= part_thresh of the
    # images where that part is visible (ref: :313-329)
    with np.errstate(invalid="ignore", divide="ignore"):
        rates = np.where(vis_sum > 0, hit_sum / np.maximum(vis_sum, 1), 0.0)
    effective = (rates >= cfg.part_thresh).any(axis=1) & (img_count > 0)
    score = 100.0 * float(effective.mean())
    if logger is not None:
        logger.info(f"Consistency Score: {score:.2f} over {P} prototypes")
    return score
