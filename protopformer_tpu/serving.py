"""Serving engine: fixed-shape jitted inference over arbitrary batches.

XLA compiles one program per input shape, so production serving runs at a
FIXED batch size and pads the tail — the same padded+masked discipline the
sharded eval loop uses (train/loop.py). This module packages the measured
serving recipe behind one object:

  * normalization (and the uint8 /255) FOLDED into the patch-embed conv
    (data/preprocess.py) — the engine consumes raw uint8 RGB;
  * bf16 speed mode at the measured batch sweet spot (B=160 on v5e-1:
    23.7k img/s/chip, docs/DESIGN.md);
  * requests of ANY size: chunked to the compiled batch, tail padded and
    sliced off; one compile total (plus the persistent compilation cache,
    utils/cache.py).

The reference has no serving surface (research repo); this is the
TPU-framework-native equivalent of its eval loop driven as a service.

Throughput expectations: the jitted forward itself sustains the bench.py
number (23.7k img/s/chip on v5e-1 at B=160). End-to-end engine throughput
is bounded by host->device input bandwidth: 24 MB per 160-image uint8
chunk needs ~16 GB/s PCIe on a real TPU host to stay compute-bound. On
the remote-tunnel dev environment the tunnel's network H2D (0.05-1.2 GB/s
depending on load) dominates instead — measured 340 img/s there; that is
the environment, not the engine (the same program measures 23.7k with
device-resident inputs).
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from protopformer_tpu.core.config import BackboneConfig, PPNetConfig
from protopformer_tpu.data.preprocess import (
    fold_normalization_into_patch_embed,
)
from protopformer_tpu.models import construct_ppnet
from protopformer_tpu.utils.cache import enable_compilation_cache


class ServingResult(NamedTuple):
    logits: np.ndarray  # (N, num_classes) fp32
    top_class: np.ndarray  # (N,) int32 argmax
    cls_token_attn: Optional[np.ndarray]  # (N, P) rollout foreground scores


class ServingEngine:
    """Fixed-batch jitted PPNet inference over raw uint8 images.

    Args:
      backbone / ppnet: model configuration (presets in core/config.py).
      params: trained params pytree (fp32; e.g. restored from Orbax or
        converted from a reference ``.pth``). Normalization folding is
        applied internally — pass the plain trained params.
      batch_size: compiled batch (default 160, the measured v5e sweet spot;
        PER CHIP when a mesh is given — the compiled chunk is
        ``batch_size * mesh_size``).
      compute_dtype: jnp.bfloat16 (speed, default) or jnp.float32 (parity).
      with_attn: also return the CLS rollout foreground scores per image
        (the interpretability signal the reference tooling consumes).
      mesh: optional ``jax.sharding.Mesh`` for multi-chip serving scale-out:
        params are replicated over the mesh, each request chunk is sharded
        on the data axis, and XLA runs the chunk SPMD across the chips
        (no collectives in the forward — it is batch-parallel throughout).
        Outputs match single-device serving to fp32 reduction-order
        tolerance (<=2e-6 measured; the per-shard shapes change XLA's
        reduction grouping), with identical argmax classes — contract-tested
        on the 8-virtual-device CPU mesh (tests/test_serving.py).
      stage_window: chunks staged ahead of compute (bounded look-ahead:
        each 224^2 uint8 chunk is ~24 MB/160 images on device, so staging a
        large request unboundedly could exhaust HBM before compute starts).
      auto_layout: compile with compiler-chosen input layouts
        (``jax.experimental.layout`` AUTO) and stage params/chunks in those
        layouts — removes the in-program input relayout copy and the
        per-iteration frozen-head layout traffic (measured −0.6 ms/chunk at
        B=160 on v5e-1, docs/DESIGN.md). The H2D transfer writes the tiled
        layout directly, so staging costs nothing extra. Single-device
        engines only (a mesh engine keeps NamedSharding staging); falls
        back to default layouts on backends without layout support.
    """

    def __init__(
        self,
        backbone: BackboneConfig,
        ppnet: PPNetConfig,
        params,
        batch_size: int = 160,
        compute_dtype=jnp.bfloat16,
        with_attn: bool = False,
        mesh=None,
        stage_window: int = 4,
        auto_layout: bool = True,
    ):
        enable_compilation_cache()
        self.mesh = mesh
        self._mesh_size = 1 if mesh is None else mesh.size
        self.batch_size = batch_size * self._mesh_size
        self.with_attn = with_attn
        self.stage_window = max(1, stage_window)
        self._model = construct_ppnet(
            backbone, ppnet, compute_dtype=compute_dtype
        )
        self._params = fold_normalization_into_patch_embed(
            params, input_scale=1.0 / 255.0
        )
        if mesh is not None:
            from protopformer_tpu.parallel import (
                batch_sharding,
                replicated_sharding,
            )

            self._params = jax.device_put(
                self._params, replicated_sharding(mesh)
            )
            self._chunk_sharding = batch_sharding(mesh)
        else:
            self._chunk_sharding = None
        img = backbone.img_size

        def _forward(p, images, token):
            out = self._model.apply({"params": p}, images, train=False)
            ret = {"logits": out.logits.astype(jnp.float32)}
            if with_attn:
                ret["cls_token_attn"] = out.cls_token_attn
            # ordering token: chaining a scalar through successive chunk
            # dispatches makes the backend STREAM them — independent
            # dispatches serialize at one round trip each on remote-tunnel
            # backends (measured 0.5 s/chunk vs ~8 ms chained)
            ret["token"] = token + ret["logits"].sum() * jnp.float32(1e-30)
            return ret

        self._forward_impl = _forward
        self._forward = jax.jit(_forward)
        self._img_size = img
        self._chunk_format = None
        # dispatch-count contract (docs/DESIGN.md round-4): every chunk
        # forward threads the ordering token; the ONLY un-chained dispatch
        # a request issues is the final concat+slice per output stream —
        # one for logits, plus one for cls_token_attn when with_attn.
        # On a remote-tunnel backend each un-chained dispatch serializes at
        # one round trip, so this counter is the structural contract a
        # line-rate host needs (pinned by tests/test_serving.py).
        self.last_unchained_dispatches = 0
        if auto_layout and mesh is None:
            self._try_auto_layout()

    def _try_auto_layout(self) -> None:
        """Recompile with compiler-chosen input layouts and restage params.

        The default-layout program contains an on-device relayout copy of
        every uint8 input chunk (u8 NHWC default vs the batch-minor tiled
        layout the patch-embed wants) plus per-iteration layout traffic on
        the frozen fp32 heads; compiling with AUTO input layouts moves both
        into the (free) H2D staging writes."""
        try:
            from jax.experimental.layout import Format, Layout

            jitted = jax.jit(
                self._forward_impl, in_shardings=Format(Layout.AUTO)
            )
            dummy = jax.ShapeDtypeStruct(
                (self.batch_size, self._img_size, self._img_size, 3),
                jnp.uint8,
            )
            compiled = jitted.lower(
                self._params, dummy, jnp.float32(0)
            ).compile()
            from protopformer_tpu.utils.layouts import true_input_formats

            # layouts read from the EXECUTABLE — compiled.input_formats
            # can LIE about the required layouts, and lie-stamped arrays
            # are silently RESHARDED on every dispatch (a served request
            # measured ~30x slower: each chunk re-crossed the tunnel) —
            # utils/layouts.py; docs/DESIGN.md round-5
            params_f, chunk_f, _ = true_input_formats(compiled)
            staged = jax.tree.map(
                lambda a, f: jax.device_put(np.asarray(a), f),
                self._params, params_f,
            )
            # ... and validate by EXECUTION before committing: the
            # pristine ``self._params`` stay untouched until a probe
            # chunk has actually dispatched
            probe = jax.device_put(
                np.zeros(
                    (self.batch_size, self._img_size, self._img_size, 3),
                    np.uint8,
                ),
                chunk_f,
            )
            np.asarray(
                compiled(staged, probe, jnp.float32(0))["logits"][0, 0]
            )
            self._params = staged
            self._chunk_format = chunk_f
            self._forward = lambda p, images, token: compiled(
                p, images, token
            )
        except Exception:
            self._chunk_format = None  # default layouts (e.g. CPU backend)

    def _stage_chunk(self, images, start):
        """Pad + H2D-stage the chunk at ``start``; returns (device_chunk,
        real_rows). A method (not a closure) so measurement harnesses can
        substitute pre-staged device buffers (scripts/serving_ab.py)."""
        chunk = images[start:start + self.batch_size]
        real = chunk.shape[0]
        if real < self.batch_size:
            chunk = np.concatenate(
                [
                    chunk,
                    np.zeros(
                        (self.batch_size - real,) + chunk.shape[1:],
                        np.uint8,
                    ),
                ]
            )
        return self._to_device(chunk), real

    def _to_device(self, chunk):
        """H2D-stage one chunk in the layout the compiled program
        requires (the H2D transfer writes the tiled layout for free; the
        format comes from the executable's own layout list — see
        _try_auto_layout)."""
        if self._chunk_format is not None:
            return jax.device_put(chunk, self._chunk_format)
        if self._chunk_sharding is not None:
            return jax.device_put(chunk, self._chunk_sharding)
        return jnp.asarray(chunk)

    def _concat_unpad(self, pieces, n):
        """On-device concat + single tail-padding slice for one output
        stream — the request's one un-chained dispatch for that stream."""
        self.last_unchained_dispatches += 1
        return jnp.concatenate(pieces)[:n]

    def warmup(self) -> None:
        """Compile (or deserialize from the persistent cache) eagerly.

        Syncs with a VALUE fetch: on remote-tunnel backends
        ``block_until_ready`` returns before the server-side compile has
        actually happened (measured — the first inference call then pays
        the full compile)."""
        dummy = np.zeros(
            (self.batch_size, self._img_size, self._img_size, 3), np.uint8
        )
        chunk = self._to_device(dummy)
        np.asarray(
            self._forward(self._params, chunk, jnp.float32(0))
            ["logits"][0, 0]
        )

    def throughput_probe(
        self, n_images: int = 10240, reps: int = 3
    ) -> dict:
        """Sustained on-chip serving rate for an n-image request (img/s).

        Measures the engine's full chunk pipeline — per-chunk dispatch with
        the ordering token, tail padding, on-device concatenation with one
        post-concat unpad slice, one final fetch — with the request's chunks staged
        DEVICE-RESIDENT up front. That isolates the engine from host->device
        input bandwidth: on the remote-tunnel dev box the tunnel's network
        H2D (0.05-1.2 GB/s) binds any end-to-end number, which says nothing
        about the engine (a real v5e host has ~16 GB/s PCIe and holds line
        rate — module docstring). n=10240 uint8 @224^2 is ~1.5 GB of HBM.

        Returns {"img_per_sec", "best_img_per_sec", "n_images", "chunks"}:
        ``img_per_sec`` is the mean over ``reps`` full-request runs,
        ``best_img_per_sec`` the fastest run."""
        rng = np.random.default_rng(0)
        starts = list(range(0, n_images, self.batch_size))
        chunks = []
        for s in starts:
            c = (rng.integers(
                0, 256,
                (self.batch_size, self._img_size, self._img_size, 3),
            )).astype(np.uint8)
            chunks.append(self._to_device(c))
        self.warmup()

        def run_once():
            t0 = time.perf_counter()
            logits = []
            token = jnp.float32(0)
            self.last_unchained_dispatches = 0
            for dev_chunk in chunks:
                out = self._forward(self._params, dev_chunk, token)
                token = out["token"]
                # keep the FULL chunk output: a per-chunk [:real] slice is
                # an un-chained dispatch that serializes at one tunnel RTT
                # per chunk (measured: 64 slices cost 0.35x the raw rate);
                # only the tail chunk is padded, so one slice after the
                # concat drops exactly the padding rows
                logits.append(out["logits"])
            np.asarray(
                self._concat_unpad(logits, n_images)
            )  # one slice + fetch, full sync
            return time.perf_counter() - t0

        dts = [run_once() for _ in range(reps)]
        return {
            "img_per_sec": n_images * len(dts) / sum(dts),
            "best_img_per_sec": n_images / min(dts),
            "n_images": n_images,
            "chunks": len(chunks),
        }

    def __call__(self, images: np.ndarray) -> ServingResult:
        """Run inference on (N, H, W, 3) uint8 RGB, any N >= 1.

        N is chunked to the compiled batch size; the final partial chunk is
        zero-padded and the padding rows discarded (exactly one compiled
        program regardless of N).
        """
        images = np.asarray(images)
        if images.dtype != np.uint8:
            raise ValueError(
                f"ServingEngine consumes raw uint8 RGB, got {images.dtype}"
            )
        n = images.shape[0]
        # stage chunks AHEAD of their dispatch (async device_put before the
        # forward that consumes them — interleaving H2D with compute
        # dispatches serializes the pipeline on remote-tunnel backends,
        # measured ~0.5 s/chunk vs fully-pipelined), but with a BOUNDED
        # look-ahead window: each staged chunk is resident uint8 HBM, so an
        # unbounded stage-everything pass could exhaust device memory on
        # large requests before compute starts. Backpressure: before
        # staging chunk i, wait for chunk i-window's compute (which frees
        # its input buffer).
        starts = list(range(0, n, self.batch_size))
        staged = [
            self._stage_chunk(images, s) for s in starts[: self.stage_window]
        ]
        # stage-window accounting (contract-tested): peak number of staged
        # input chunks alive at once must never exceed stage_window
        self.last_peak_staged = min(len(starts), self.stage_window)
        self.last_unchained_dispatches = 0
        logits, attns = [], []
        token = jnp.float32(0)
        # tail padding is dropped by ONE slice after the concat — a
        # per-chunk [:real] slice is an un-chained dispatch costing one
        # tunnel RTT per chunk (only the last chunk is padded, so
        # concat[:n] is exactly equivalent)
        for i in range(len(starts)):
            dev_chunk, _real = staged[i]
            out = self._forward(self._params, dev_chunk, token)
            token = out["token"]
            logits.append(out["logits"])
            if self.with_attn:
                attns.append(out["cls_token_attn"])
            nxt = i + self.stage_window
            if nxt < len(starts):
                if i >= 1:
                    # chunk i-1's forward output ready => its input freed
                    jax.block_until_ready(logits[i - 1])
                staged.append(self._stage_chunk(images, starts[nxt]))
            staged[i] = None  # drop our reference to the consumed input
            self.last_peak_staged = max(
                self.last_peak_staged,
                sum(1 for s in staged if s is not None),
            )
        # concatenate ON DEVICE, drop the tail padding with one slice, and
        # fetch once — each host fetch is a full round trip (~30-500 ms
        # through a remote tunnel)
        logits = np.asarray(self._concat_unpad(logits, n))
        attns = (
            [np.asarray(self._concat_unpad(attns, n))] if attns else []
        )
        return ServingResult(
            logits=logits,
            top_class=np.argmax(logits, axis=-1).astype(np.int32),
            cls_token_attn=np.concatenate(attns) if attns else None,
        )
