"""Attention rollout — CLS->patch foreground scoring.

The reference computes rollout by stacking every block's (B, H, N, N)
attention map and post-processing the list (ref: tools/deit_models_attn.py:
99-124 and tools/cait_models_attn.py:223-261). On TPU that materializes
``depth * B * H * N * N`` floats in HBM for no reason: only the running
product matters. Here rollout is an *incremental* operator —
``rollout_step`` folds one block's head-fused map into a scan-carried
(B, N, N) product — so the pruning forward keeps O(B*N*N) state total.

Per-layer normalization semantics preserved from the reference
(deit_models_attn.py:103-121):
  1. fuse heads (mean; max/min variants kept for parity),
  2. zero the lowest 90% of the *flattened* (B, M*N) values
     (torch: ``flat.topk(int(0.9*M*N), largest=False)`` then scatter zeros;
     here: keep values >= the kept-count-th largest — identical except on
     exact ties at the threshold, which have measure zero for real attention),
  3. blend with identity at weight 0.2 and renormalize rows,
  4. left-multiply into the running product (``result = a @ result``).

All rollout math is fp32 at ``Precision.HIGHEST`` — the 1e-4 activation-map
parity budget is spent almost entirely here, and JAX's default matmul
precision truncates fp32 operands (bf16-class error ~1e-3) even off-TPU.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _fuse_heads(attn: jax.Array, head_fusion: str) -> jax.Array:
    """(B, H, M, N) -> (B, M, N). Reference default is 'mean'
    (deit_models_attn.py:99, cait pruning path passes 'mean' at
    cait_models_attn.py:328)."""
    if head_fusion == "mean":
        return jnp.mean(attn, axis=1)
    if head_fusion == "max":
        return jnp.max(attn, axis=1)
    if head_fusion == "min":
        return jnp.min(attn, axis=1)
    raise ValueError(f"unknown head_fusion: {head_fusion}")


def _static_bracket(bound, to_bits):
    """Static bisection bracket from a ``bound`` spec.

    ``bound`` is either a float upper bound (lower bound 0) or a
    ``(lo, hi)`` float pair bracketing the k-th largest value — the
    caller guarantees count(x >= lo) >= keep and kth <= hi. Returns
    (lo0, hi0, iters) in the searched integer bit space: a bisection
    over [lo0, hi0] needs exactly ceil(log2(width)) passes.
    """
    if isinstance(bound, tuple):
        lo_f, hi_f = bound
        lo0 = to_bits(lo_f)
        hi0 = to_bits(hi_f)
    else:
        lo0 = 0
        hi0 = to_bits(bound)
    return lo0, hi0, (hi0 - lo0 + 1).bit_length()


def kth_largest(
    flat: jax.Array, keep: int, bound=None
) -> jax.Array:
    """Exact keep-th largest value per row of a NON-NEGATIVE fp32 matrix.

    ``jax.lax.top_k`` over the rollout's flattened (B, N*N) maps is a sort —
    ~10ms/layer at production shape, the single hottest op in the pruning
    forward. For non-negative fp32, value order equals int32 bit order, so
    the k-th order statistic falls out of a 32-step binary search on the bit
    pattern with one compare+count pass per step (HBM-bound, ~6x faster than
    the sort; a Pallas row-resident kernel tightens this further).

    Returns the same value as ``jax.lax.top_k(flat, keep)[0][:, -1]``.

    Mixed-sign inputs (CaiT's talking-heads maps are not probabilities):
    negative floats bitcast to negative int32, so every negative value
    counts as below any candidate threshold — the result is still EXACT
    whenever the k-th largest value is >= 0, but it is WRONG if k exceeds
    the number of non-negative entries (CaiT maps can be entirely
    negative — measured on seeded weights; caught by
    tests/test_reference_groundtruth.py). Use ``kth_largest_signed`` for
    any input that is not non-negative by construction.

    Args:
      flat: (B, ...) fp32, all values >= 0 — the k-th largest is taken over
        ALL trailing axes (order-invariant, so no flatten/layout copy).
      keep: k (static).
    Returns:
      (B,) fp32 k-th largest per batch element.
    """
    bits = jax.lax.bitcast_convert_type(flat, jnp.int32)  # order-preserving
    red = tuple(range(1, bits.ndim))
    texp = (slice(None),) + (None,) * (bits.ndim - 1)

    def feasible(t):
        # count of elements >= t per batch element
        return jnp.sum((bits >= t[texp]).astype(jnp.int32), axis=red)

    B = flat.shape[0]
    if bound is not None:
        # static bound -> static bracket width: the search converges once
        # the bracket hits 1 element, so ceil(log2(width)) passes suffice
        # (bound=1.0 -> 30 passes; a (floor, cap) probability-mass bracket
        # from masked_map_stats -> 28) — bit-identical result
        lob, hib, iters = _static_bracket(
            bound, lambda v: int(np.float32(v).view(np.int32))
        )
        lo = jnp.full((B,), lob, jnp.int32)
        hi = jnp.full((B,), hib, jnp.int32)
    else:
        lo = jnp.zeros((B,), jnp.int32)
        hi = jnp.max(bits, axis=red)
        # int32 range of non-negative floats is < 2^31; 31 iterations
        # suffice
        iters = 31

    # Python-unrolled on purpose: a fori_loop's per-iteration while-op
    # bookkeeping costs as much as the count pass itself (~6.5us each at
    # B=160 map shape — measured, docs/DESIGN.md), and XLA cannot hoist it;
    # unrolling is straight-line HLO and cut 0.96 -> 0.74 ms/map on v5e.
    for _ in range(iters):
        mid = lo + (hi - lo + 1) // 2  # round up so lo strictly advances
        ok = feasible(mid) >= keep
        lo, hi = jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)
    return jax.lax.bitcast_convert_type(lo, jnp.float32)


def _monotone_keys_u32(flat: jax.Array) -> jax.Array:
    """fp32 -> uint32 keys whose unsigned order equals float order for ALL
    finite values (negatives included): flip all bits of negatives, set the
    sign bit of non-negatives."""
    u = jax.lax.bitcast_convert_type(flat, jnp.uint32)
    sign = jnp.uint32(0x80000000)
    return jnp.where(u >= sign, ~u, u | sign)


def _key_to_f32(key: jax.Array) -> jax.Array:
    sign = jnp.uint32(0x80000000)
    u = jnp.where(key >= sign, key ^ sign, ~key)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def kth_largest_signed(
    flat: jax.Array, keep: int, bound=None
) -> jax.Array:
    """Exact keep-th largest value per row for MIXED-SIGN fp32 input.

    CaiT's talking-heads maps are post-``proj_w`` head mixtures, not
    probabilities — entire maps can be negative (measured on seeded
    weights: 10/24 layers all-negative), so the k-th largest is negative
    and ``kth_largest``'s [0, hi] bracket is invalid. This variant bisects
    the order-preserving unsigned key space (sign-flip trick) instead:
    exact for any sign pattern, at the cost of a min/max bracket-init pass
    and up to 32 count passes. Static ``bound``s assume non-negative
    values and are rejected.
    """
    assert bound is None, "static bounds assume non-negative maps"
    keys = _monotone_keys_u32(flat)
    red = tuple(range(1, keys.ndim))
    texp = (slice(None),) + (None,) * (keys.ndim - 1)

    def feasible(t):
        return jnp.sum((keys >= t[texp]).astype(jnp.int32), axis=red)

    lo = jnp.min(keys, axis=red)
    hi = jnp.max(keys, axis=red)
    for _ in range(32):
        mid = lo + (hi - lo + jnp.uint32(1)) // jnp.uint32(2)
        ok = feasible(mid) >= keep
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - jnp.uint32(1))
    return _key_to_f32(lo)


def kth_largest_bf16_signed(
    flat: jax.Array, keep: int, bound=None
) -> jax.Array:
    """Exact keep-th largest of MIXED-SIGN bf16 input (speed mode; see
    kth_largest_signed for why CaiT needs the signed key space)."""
    assert bound is None, "static bounds assume non-negative maps"
    u = jax.lax.bitcast_convert_type(flat, jnp.uint16)
    sign = jnp.uint16(0x8000)
    keys = jnp.where(u >= sign, ~u, u | sign)
    red = tuple(range(1, keys.ndim))
    texp = (slice(None),) + (None,) * (keys.ndim - 1)

    def feasible(t):
        return jnp.sum((keys >= t[texp]).astype(jnp.int32), axis=red)

    lo = jnp.min(keys, axis=red)
    hi = jnp.max(keys, axis=red)
    for _ in range(16):
        mid = lo + (hi - lo + jnp.uint16(1)) // jnp.uint16(2)
        ok = feasible(mid) >= keep
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid - jnp.uint16(1))
    back = jnp.where(lo >= sign, lo ^ sign, ~lo)
    return jax.lax.bitcast_convert_type(back, jnp.bfloat16)


def kth_largest_prefix16(
    flat: jax.Array, keep: int, bound: float = None
) -> jax.Array:
    """bf16-prefix k-th-largest threshold (SPEED MODE, approximate ties).

    Bisects only the high 16 bits (15 passes instead of 31 — the count
    passes are the hot HBM loop). Returns the bf16-floor of the exact k-th
    value; thresholding with ``>=`` keeps every element sharing that 16-bit
    prefix, i.e. AT LEAST the exact keep set plus boundary-prefix ties
    (tiny values near the 10% cutoff). Only for
    ``rollout_exact_discard=False``; the default path is exact.
    """
    bits = jax.lax.bitcast_convert_type(flat, jnp.int32) >> 16
    B = flat.shape[0]
    red = tuple(range(1, bits.ndim))
    texp = (slice(None),) + (None,) * (bits.ndim - 1)

    def feasible(t):
        return jnp.sum((bits >= t[texp]).astype(jnp.int32), axis=red)

    if bound is not None:
        # static bracket (1.0 -> 14 passes); >> 16 is monotone, so a
        # (lo, hi) float pair maps to a valid prefix-space bracket
        lob, hib, iters = _static_bracket(
            bound, lambda v: int(np.float32(v).view(np.int32)) >> 16
        )
        lo = jnp.full((B,), lob, jnp.int32)
        hi = jnp.full((B,), hib, jnp.int32)
    else:
        lo = jnp.zeros((B,), jnp.int32)
        hi = jnp.max(bits, axis=red)
        iters = 15

    # unrolled: see kth_largest — loop bookkeeping ~doubles the pass cost
    for _ in range(iters):
        mid = lo + (hi - lo + 1) // 2
        ok = feasible(mid) >= keep
        lo, hi = jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)
    return jax.lax.bitcast_convert_type(lo << 16, jnp.float32)


def kth_largest_bf16(
    flat: jax.Array, keep: int, bound: float = None
) -> jax.Array:
    """Exact k-th largest of a NON-NEGATIVE bf16 matrix (SPEED MODE).

    bf16 is the top 16 bits of fp32, so value order equals int16 bit order
    for non-negative values (positive max 0x7f7f < 2^15 — 15 search steps
    suffice). Each count pass reads HALF the bytes of the fp32 bisection;
    exact within bf16 — the approximation is the map's bf16 storage itself.

    Args:
      flat: (B, ...) bf16, all values >= 0 (k-th largest over all trailing
        axes).
      bound: static upper bound on the values, when known (e.g. 1.0 for
        softmax probability maps) — skips the full-array max pass that
        otherwise initializes the search bracket.
    Returns:
      (B,) bf16 k-th largest per batch element.
    """
    bits = jax.lax.bitcast_convert_type(flat, jnp.int16)
    red = tuple(range(1, bits.ndim))
    texp = (slice(None),) + (None,) * (bits.ndim - 1)

    def feasible(t):
        return jnp.sum((bits >= t[texp]).astype(jnp.int32), axis=red)

    B = flat.shape[0]
    if bound is not None:
        # static bracket (1.0 -> 14 passes); float->bf16-bits is monotone
        # for non-negative values, so (lo, hi) pairs stay valid brackets
        lob, hib, iters = _static_bracket(
            bound,
            lambda v: int(np.float32(v).astype(jnp.bfloat16).view(np.uint16)),
        )
        lo = jnp.full((B,), lob, jnp.int16)
        hi = jnp.full((B,), hib, jnp.int16)
    else:
        lo = jnp.zeros((B,), jnp.int16)
        hi = jnp.max(bits, axis=red)
        iters = 15

    # unrolled: see kth_largest — loop bookkeeping ~doubles the pass cost
    for _ in range(iters):
        mid = lo + (hi - lo + jnp.int16(1)) // jnp.int16(2)
        ok = feasible(mid) >= keep
        lo, hi = (
            jnp.where(ok, mid, lo),
            jnp.where(ok, hi, mid - jnp.int16(1)),
        )
    return jax.lax.bitcast_convert_type(lo, jnp.bfloat16)


def normalize_attention_map(
    attn_fused: jax.Array,
    discard_ratio: float = 0.9,
    identity_weight: float = 0.2,
    exact_discard: bool = True,
    signed: bool = False,
) -> jax.Array:
    """Discard + identity-blend + row-normalize one fused map.

    Args:
      attn_fused: (B, M, N) head-fused attention probabilities. M == N for
        self-attention; M == 1 for CaiT class attention.
      discard_ratio: fraction of the flattened (M*N) values zeroed per batch
        element (ref: deit_models_attn.py:110-113).
      identity_weight: identity blend weight (ref: deit_models_attn.py:118-119).
      exact_discard: exact reference-parity threshold (default); False uses
        the bf16-prefix threshold (faster, keeps boundary-prefix ties).

    Returns:
      (B, M, N) fp32 normalized map.
    """
    B, M, N = attn_fused.shape
    a = attn_fused.astype(jnp.float32)
    keep = M * N - int(M * N * discard_ratio)
    if keep < M * N:
        # torch zeroes the k smallest by index; thresholding on the keep-th
        # largest value is equivalent up to ties at the threshold.
        # signed: mixed-sign maps (CaiT talking-heads) need the signed key
        # space — see kth_largest_signed
        if signed:
            kth_fn = kth_largest_signed
        else:
            kth_fn = kth_largest if exact_discard else kth_largest_prefix16
        kth = kth_fn(a.reshape(B, M * N), keep)
        a = jnp.where(a >= kth[:, None, None], a, 0.0)
    # identity is row-truncated for class-attention maps (M < N)
    # (ref: cait_models_attn.py:240-241)
    eye = jnp.eye(N, dtype=jnp.float32)[:M]
    a = (a + identity_weight * eye) / (1.0 + identity_weight)
    return a / jnp.sum(a, axis=-1, keepdims=True)


def masked_map_stats(
    attn_fused: jax.Array,
    discard_ratio: float = 0.9,
    exact_discard: bool = True,
    keep_elements: int = None,
    value_bound: float = None,
    sample: int = 1,
    stochastic_eps: float = None,
    signed: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Discard threshold + masked row sums of one fused map — the compact
    per-layer state for the LAZY rollout chain (rollout_row_scores_lazy).

    The normalized map A' = (Â + λI) / (s + λ) (the reference's blend +
    row-norm — deit_models_attn.py:110-121 — with the uniform 1/(1+λ)
    factor cancelled by the row normalization) is fully determined by the
    RAW fused map F plus the scalar threshold t (Â = F·[F >= t]) and the
    masked row sums s. Keeping (t, s) instead of materializing A' saves a
    40 MB fp32 write + read per layer at production shape.

    Args:
      attn_fused: (B, M, N) fp32 head-fused attention probabilities — or
        bf16 in speed mode (``exact_discard=False``): the bisection runs on
        the bf16 bit patterns directly (kth_largest_bf16) and the row sums
        accumulate fp32; every pass reads half the bytes.
      keep_elements: REAL element count per map when the map is padded with
        exact zeros (the padded serving path) — keep/discard counts are
        computed on it instead of M*N; zeros never reach the threshold.
      value_bound: static upper bound on the map values when known (1.0
        for softmax probability maps) — skips the bracket-init max pass.
        Do NOT pass for CaiT talking-heads maps (not probabilities).
      sample: SPEED MODE ONLY (requires ``exact_discard=False``): estimate
        the threshold from a lane-contiguous 1/sample subset of the map
        (the first 512//sample lanes of every 512-lane block — flat index
        stride 197 vs block 512 are coprime, so every map column is
        covered ~uniformly across rows). The count passes — the serving
        profile's second-hottest region — read ``sample``x fewer
        elements; the threshold becomes a sampled-quantile estimate with
        rank error ~sqrt(keep/sample)*sample (~3% of the keep count at
        sample=4), an error class strictly inside the speed-mode
        selection contract (tests/test_parity.py). 1 = exact counts.
      stochastic_eps: when the map is a head-MEAN of eps-softmax outputs
        (ops/masking.py::eps_softmax with this eps — rows sum to EXACTLY
        1 and every element is >= (eps/N)/(N + eps) since e >= 0 and
        sum(e) <= N), derive a static probability-mass bracket for the
        bisection: kth <= row_count/keep (keep elements above kth cannot
        exceed the total mass M) and kth >= the eps floor. Cuts the
        bisection from 30 to 28 passes (fp32) / 14 to 13 (bf16) with a
        bit-identical result. Ignored for padded maps (zeros break the
        floor). Do NOT pass for non-eps-softmax maps.
      signed: the map is NOT non-negative by construction (CaiT's
        post-proj_w talking-heads maps — entire maps can be negative, so
        the k-th largest itself can be negative): bisect the
        order-preserving signed key space instead (kth_largest_signed /
        kth_largest_bf16_signed). Incompatible with value_bound /
        stochastic_eps (both assume probability maps); ``sample`` DOES
        compose — a sampled quantile estimate is distribution-agnostic
        (the rank-error argument uses only the stratified lane coverage,
        not non-negativity), and the speed-mode selection contract test
        is the gate either way (round-5; tests/test_parity.py).
    Returns:
      (t (B,) keep-threshold in the map dtype — -inf when discard is
       disabled, s (B, M) fp32 masked row sums).
    """
    B, M, N = attn_fused.shape
    if signed and (value_bound is not None or stochastic_eps is not None):
        raise ValueError(
            "signed maps are not probabilities: value_bound/stochastic_eps"
            " do not apply"
        )
    if attn_fused.dtype == jnp.bfloat16 and not exact_discard:
        a = attn_fused
        kth_fn = kth_largest_bf16_signed if signed else kth_largest_bf16
    else:
        a = attn_fused.astype(jnp.float32)
        if signed:
            # prefix16 has no signed variant; exact signed fp32 covers both
            kth_fn = kth_largest_signed
        else:
            kth_fn = kth_largest if exact_discard else kth_largest_prefix16
    real = keep_elements if keep_elements is not None else M * N
    keep = real - int(real * discard_ratio)

    def _bound_for(keep_count):
        """Static bisection bound for a keep_count-th largest search."""
        if stochastic_eps is None or keep_elements is not None:
            return value_bound
        # mass bracket (see stochastic_eps above); 2%/±2% safety margins
        # absorb the map dtype's round-to-nearest storage (<= 2^-8
        # relative in bf16) and the fp32 constant conversions
        floor = stochastic_eps / N / (N + stochastic_eps) * 0.98
        cap = M / keep_count * 1.02
        if value_bound is not None:
            cap = min(cap, value_bound)
        return (floor, cap)

    if keep < real:
        # flatten for the count passes: (B, M*N) pads to 128 lanes with
        # +0.3% waste vs +31% counting on the (B, M, N) tiles. The
        # flatten costs a transpose copy of the QK-dot's token-major map
        # layout, but every alternative measured worse end-to-end:
        # 3-D counting 8.4 vs 6.2 ms; swapaxes-first flatten 140 ms (XLA
        # re-materializes it per pass); float-space compares on the
        # native layout (no int16 view at all) 8.0 vs 6.2 ms at B=96.
        flat = a.reshape(a.shape[0], -1)
        if sample > 1:
            if exact_discard:
                raise ValueError(
                    "sampled discard counts are a speed-mode approximation;"
                    " use sample=1 with exact_discard=True"
                )
            if keep_elements is not None:
                raise ValueError(
                    "sampled counts do not compose with padded maps"
                )
            blk = 512
            ec = (flat.shape[1] // blk) * blk
            sub = flat[:, :ec].reshape(B, ec // blk, blk)[
                :, :, : blk // sample
            ].reshape(B, -1)
            # materialize the subset ONCE — without the barrier XLA
            # re-fuses the strided slice into every count pass and
            # re-reads the full map each time (the round-2 swapaxes
            # lesson, docs/DESIGN.md)
            sub = jax.lax.optimization_barrier(sub)
            keep_sub = max(1, round(keep * sub.shape[1] / real))
            # the subset's total mass is still <= M, so the full-map cap
            # holds with keep_sub in the denominator; the eps floor holds
            # element-wise
            t = kth_fn(sub, keep_sub, bound=_bound_for(keep_sub))
        else:
            t = kth_fn(flat, keep, bound=_bound_for(keep))
        s = jnp.sum(
            jnp.where(a >= t[:, None, None], a, 0),
            axis=-1, dtype=jnp.float32,
        )
    else:
        # no-discard sentinel must keep EVERYTHING — CaiT's talking-heads
        # maps are not probabilities and carry negative entries, so 0 is
        # not a neutral threshold
        t = jnp.full((B,), -jnp.inf, jnp.float32)
        s = jnp.sum(a, axis=-1, dtype=jnp.float32)
    return t, s


def masked_map_stats_multi(
    fmaps: Sequence[jax.Array],
    discard_ratio: float = 0.9,
    exact_discard: bool = True,
    value_bound: float = None,
    sample: int = 1,
    stochastic_eps: float = None,
    signed: bool = False,
) -> Sequence[Tuple[jax.Array, jax.Array]]:
    """``masked_map_stats`` for a whole LIST of same-shape maps with ONE
    batched bisection (``rollout_stats_batched``).

    The k-th-largest bisection is row-independent, so the L per-layer
    searches collapse into one search over the (L*B,)-row stack: the same
    count passes run 13x (speed) / 28x (exact) TOTAL instead of per layer
    — per-pass dispatch/fusion overhead amortizes over L-fold bigger VPU
    passes. Bit-identical per layer to the sequential calls (same
    thresholds, same row sums); the masked row sums stay per-layer
    (batching them would stack the full maps — a copy that costs more
    than the launches it saves).

    DeiT pruning collects all 11 pre-prune maps before any threshold is
    consumed, and TPU programs execute as one linear schedule anyway, so
    deferring the searches to the prune point loses nothing.

    Same argument contract as ``masked_map_stats`` minus ``keep_elements``
    (padded maps don't arise on the batched path).
    """
    L = len(fmaps)
    if L == 1:
        return [masked_map_stats(
            fmaps[0], discard_ratio, exact_discard,
            value_bound=value_bound, sample=sample,
            stochastic_eps=stochastic_eps, signed=signed,
        )]
    B, M, N = fmaps[0].shape
    if signed and (value_bound is not None or stochastic_eps is not None):
        raise ValueError(
            "signed maps are not probabilities: value_bound/stochastic_eps"
            " do not apply"
        )
    if fmaps[0].dtype == jnp.bfloat16 and not exact_discard:
        maps = list(fmaps)
        kth_fn = kth_largest_bf16_signed if signed else kth_largest_bf16
    else:
        maps = [a.astype(jnp.float32) for a in fmaps]
        if signed:
            kth_fn = kth_largest_signed
        else:
            kth_fn = kth_largest if exact_discard else kth_largest_prefix16
    real = M * N
    keep = real - int(real * discard_ratio)
    if keep >= real:
        # no-discard sentinel (see masked_map_stats)
        t = jnp.full((B,), -jnp.inf, jnp.float32)
        return [
            (t, jnp.sum(a, axis=-1, dtype=jnp.float32)) for a in maps
        ]

    def _bound_for(keep_count):
        if stochastic_eps is None:
            return value_bound
        floor = stochastic_eps / N / (N + stochastic_eps) * 0.98
        cap = M / keep_count * 1.02
        if value_bound is not None:
            cap = min(cap, value_bound)
        return (floor, cap)

    flats = [a.reshape(B, -1) for a in maps]
    if sample > 1:
        if exact_discard:
            raise ValueError(
                "sampled discard counts are a speed-mode approximation;"
                " use sample=1 with exact_discard=True"
            )
        blk = 512
        ec = (real // blk) * blk
        subs = [
            f[:, :ec].reshape(B, ec // blk, blk)[
                :, :, : blk // sample
            ].reshape(B, -1)
            for f in flats
        ]
        keep_count = max(1, round(keep * subs[0].shape[1] / real))
        # the stack IS the single materialization point (the per-layer
        # barrier in masked_map_stats); without it XLA re-fuses the
        # strided slices into every count pass
        stacked = jax.lax.optimization_barrier(jnp.stack(subs))
    else:
        keep_count = keep
        stacked = jnp.stack(flats)
    t_all = kth_fn(
        stacked.reshape(L * B, -1), keep_count, bound=_bound_for(keep_count)
    ).reshape(L, B)
    out = []
    for i, a in enumerate(maps):
        t = t_all[i]
        s = jnp.sum(
            jnp.where(a >= t[:, None, None], a, 0),
            axis=-1, dtype=jnp.float32,
        )
        out.append((t, s))
    return out


def rollout_row_scores_lazy(
    fused_maps: Sequence[jax.Array],
    thresholds: Sequence[jax.Array],
    row_sums: Sequence[jax.Array],
    seed_row: jax.Array,
    identity_weight: float = 0.2,
) -> jax.Array:
    """``rollout_row_scores`` over LAZILY-normalized maps.

    Algebra: with Â = F·[F >= t], s = rowsum(Â), λ = identity_weight,
    the normalized map is A' = diag(s+λ)^{-1}(Â + λI), so

        v @ A'  ==  u @ Â  +  λ·u,      u = v / (s + λ)

    — one fused mask-multiply-reduce pass over each RAW map instead of a
    dot against a materialized A'. Bit-equivalent to the eager path up to
    one float reassociation (the division moves from the map rows onto the
    R-row vector), well inside the 1e-5 rollout parity budget.

    Args:
      fused_maps: per-layer (B, N, N) RAW head-fused maps, forward order —
        fp32 (parity) or bf16 (speed mode; the mask-multiply promotes to
        fp32 against the carried row, so only the map READS are half-width).
      thresholds / row_sums: per-layer outputs of ``masked_map_stats``.
      seed_row: (B, R, N) rows to propagate (R=1 for the CLS row).

    Returns:
      (B, R, N) fp32 == seed_row @ (A'_L @ ... @ A'_1).
    """
    v = seed_row.astype(jnp.float32)
    for f, t, s in reversed(list(zip(fused_maps, thresholds, row_sums))):
        u = v / (s + identity_weight)[:, None, :]  # (B, R, N)
        masked = jnp.where(f >= t[:, None, None], f, 0.0)
        # mul+reduce (not dot) so XLA fuses the masking into the single
        # pass over the raw map — R is 1, a dot would materialize `masked`
        v = (
            jnp.sum(u[:, :, :, None] * masked[:, None, :, :], axis=2)
            + identity_weight * u
        )
    return v


def rollout_step(
    result: jax.Array,
    attn: jax.Array,
    discard_ratio: float = 0.9,
    head_fusion: str = "mean",
    identity_weight: float = 0.2,
) -> jax.Array:
    """Fold one block's attention into the running rollout product.

    Args:
      result: (B, N, N) fp32 running product (init: identity).
      attn: (B, H, N, N) attention probabilities from one block.

    Returns:
      (B, N, N) fp32 updated product ``a @ result``.
    """
    a = normalize_attention_map(
        _fuse_heads(attn, head_fusion), discard_ratio, identity_weight
    )
    return jnp.matmul(a, result, precision=jax.lax.Precision.HIGHEST)


def identity_rollout(batch: int, n: int) -> jax.Array:
    """Initial rollout carry (ref: deit_models_attn.py:100)."""
    return jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (batch, n, n))


def rollout_row_scores(
    norm_maps: Sequence[jax.Array],
    seed_row: jax.Array,
) -> jax.Array:
    """Row-slice of the rollout product via reverse vector-matrix products.

    The model consumes only the CLS ROW of the rollout
    (``rollout[:, 0, 1:]`` — ref: deit_models_attn.py:226), so the full
    O(B*N^3)-per-layer matrix product the reference computes is wasted work:
    by associativity,

        e0^T (a_L @ ... @ a_1)  ==  (((e0^T a_L) a_{L-1}) ... a_1),

    a chain of O(B*N^2) vector-matrix products — N x cheaper, and the
    dominant cost of the whole pruning forward at production shapes
    (11 layers x 256 x 197^3 fp32 MACs otherwise).

    Args:
      norm_maps: per-layer (B, N, N) fp32 normalized maps, FORWARD order
        (layer 0 first) — each already through ``normalize_attention_map``.
      seed_row: (B, R, N) row(s) to propagate (e.g. one-hot CLS row, or
        CaiT's averaged class-attention rows).

    Returns:
      (B, R, N) fp32 == seed_row @ (a_L @ ... @ a_1).
    """
    v = seed_row.astype(jnp.float32)
    for a in reversed(list(norm_maps)):
        v = jnp.matmul(v, a, precision=jax.lax.Precision.HIGHEST)
    return v


def attn_rollout(
    all_attn: jax.Array,
    discard_ratio: float = 0.9,
    head_fusion: str = "mean",
    identity_weight: float = 0.2,
) -> jax.Array:
    """Full rollout over a stacked (L, B, H, N, N) attention tensor.

    Batch-offline equivalent of the reference's ``attn_rollout``
    (deit_models_attn.py:99-124), expressed as a ``lax.scan`` so XLA compiles
    one program regardless of depth. The hot training path uses
    ``rollout_step`` incrementally instead.

    Returns:
      (B, N, N) fp32 rollout; CLS->patch scores are ``out[:, 0, 1:]``.
    """
    L, B, H, N, _ = all_attn.shape

    def body(result, attn):
        return (
            rollout_step(result, attn, discard_ratio, head_fusion, identity_weight),
            None,
        )

    init = identity_rollout(B, N)
    result, _ = jax.lax.scan(body, init, all_attn)
    return result


def attn_rollout_cait(
    sa_attn: jax.Array,
    ca_attn: jax.Array,
    discard_ratio: float = 0.9,
    head_fusion: str = "mean",
    identity_weight: float = 0.2,
) -> Tuple[jax.Array, jax.Array]:
    """CaiT rollout (ref: tools/cait_models_attn.py:223-261).

    CaiT self-attention runs on the 196 patch tokens WITHOUT the CLS token;
    class-attention maps are (B, H, 1, 197) rows over [CLS; patches].

    Steps (reference semantics):
      * normalize every map (SA and CA alike) with the per-layer transform;
      * product of the normalized SA maps -> (B, 196, 196) rollout;
      * mean the normalized CA maps over the layer axis, drop the CLS column,
        and right-multiply by the SA rollout -> (B, 1, 196) CLS scores.

    Args:
      sa_attn: (L_sa, B, H, P, P) self-attention maps (P = num patches).
      ca_attn: (L_ca, B, H, 1, 1+P) class-attention maps.

    Returns:
      (rollout (B, P, P), cls_scores (B, 1, P)) both fp32.
    """
    L_sa, B, H, P, _ = sa_attn.shape

    def body(result, attn):
        return (
            rollout_step(result, attn, discard_ratio, head_fusion, identity_weight),
            None,
        )

    result, _ = jax.lax.scan(body, identity_rollout(B, P), sa_attn)

    # normalize each CA map: (B, 1, 1+P) rows; identity row-truncated to the
    # first row (adds weight to the CLS column) — ref: cait_models_attn.py:240-245
    def norm_ca(attn):
        return normalize_attention_map(
            _fuse_heads(attn, head_fusion), discard_ratio, identity_weight
        )

    ca_norm = jax.vmap(norm_ca)(ca_attn)  # (L_ca, B, 1, 1+P)
    cls_mean = jnp.mean(ca_norm, axis=0)  # (B, 1, 1+P)
    cls_mean = cls_mean[:, :, 1:]  # drop CLS column (ref: :258)
    cls_scores = jnp.matmul(cls_mean, result, precision=jax.lax.Precision.HIGHEST)
    return result, cls_scores
