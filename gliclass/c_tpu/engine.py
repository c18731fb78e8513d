"""InferenceEngine: compiled, sharded, shape-bucketed forward steps.

Replaces the reference's model runtime layer (L2: ORT session + per-batch
``Run``; reference src/model.c:122-207) with jit-compiled XLA executables over a
device mesh. Key differences from the reference, by design:

  * one executable per (batch, seq-bucket, label-bucket) shape — compiled once,
    cached; the reference re-resolves its output name and re-marshals tensors
    every call (reference src/model.c:159)
  * batches execute across ALL devices of the mesh (dp x tp); the reference
    serialized its one GPU behind a mutex (reference main.c:143-146)
  * sigmoid runs in-graph; the reference computed it per-logit on host
    (reference src/postprocessor.c:14-16)
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import GLiClassConfig, RuntimeConfig
from .models.gliclass import gliclass_probs
from .ops.layers import act_quant as act_quant_ctx
from .parallel.mesh import (
    DATA_AXIS,
    Mesh,
    NamedSharding,
    P,
    make_mesh,
    seq_sharding,
    stack_sharding,
)
from .parallel.sharding import shard_params, shard_spec_tree
from .tokenization import TokenizedBatch

Params = dict[str, Any]

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


def _concat_dense(parts: list[Params]) -> Params | None:
    """Concatenate dense params along the output dim: [K,N1],[K,N2],... ->
    [K, sum Ni]. Works for fp ({"w","b"}) and INT8 ({"w_q","scale","b"}) leaves,
    stacked ([L,K,N]) or not; per-output-channel INT8 scales concatenate
    exactly (each output column's math is untouched). Returns None if the
    parts are not homogeneous dense params."""
    wk = "w_q" if "w_q" in parts[0] else "w"
    if not all(wk in p for p in parts):
        return None
    fused: Params = {wk: jnp.concatenate([p[wk] for p in parts], axis=-1)}
    if wk == "w_q":
        if not all("scale" in p for p in parts):
            return None
        fused["scale"] = jnp.concatenate([p["scale"] for p in parts], axis=-1)
    if all(p.get("b") is not None for p in parts):
        fused["b"] = jnp.concatenate([p["b"] for p in parts], axis=-1)
    elif any(p.get("b") is not None for p in parts):
        return None  # mixed bias/no-bias: keep unfused
    return fused


def fuse_qkv_params(params: Params, cfg: GLiClassConfig) -> Params:
    """Load-time perf transform: merge each attention block's q/k/v dense
    params into one fused "qkv" param ([H, 3H] weight -> a single wide matmul,
    ~2x the MXU rate of three narrow ones at serving shapes on v5e).

    Math-identical to the separate projections (disjoint output columns).
    Applied to the ENGINE's copy only — bundles, the converter and the training
    tree keep the reference-shaped separate tensors (naming contract of
    parallel/sharding.py). Skipped when the model needs the separate q/k
    weights for position projections it could not otherwise recover
    (relative_attention without share_att_key and without explicit pos_q/pos_k).
    """
    bb = cfg.backbone
    if bb.model_type != "deberta-v2":
        return params

    def fuse_attn(attn: Params) -> Params:
        if "qkv" in attn or not all(k in attn for k in ("q", "k", "v")):
            return attn
        if bb.relative_attention and not bb.share_att_key and not (
            "pos_q" in attn and "pos_k" in attn
        ):
            return attn
        fused = _concat_dense([attn["q"], attn["k"], attn["v"]])
        if fused is None:
            return attn
        out = {k: v for k, v in attn.items() if k not in ("q", "k", "v")}
        out["qkv"] = fused
        return out

    out = dict(params)
    backbone = dict(params["backbone"])
    layers = dict(backbone["layers"])
    layers["attn"] = fuse_attn(layers["attn"])
    backbone["layers"] = layers
    out["backbone"] = backbone
    return out


class InferenceEngine:
    def __init__(
        self,
        cfg: GLiClassConfig,
        params: Params,
        runtime: RuntimeConfig | None = None,
        mesh: Mesh | None = None,
    ):
        self.cfg = cfg
        self.runtime = runtime or RuntimeConfig()
        self.mesh = mesh if mesh is not None else make_mesh(
            self.runtime.dp_size, self.runtime.tp_size, self.runtime.sp_size
        )
        self.compute_dtype = _DTYPES[self.runtime.compute_dtype]
        # w8a8: dynamic per-token INT8 activations on top of INT8 weights
        # (ops/layers._linear_w8a8) — the int8xint8 MXU path, 2x the bf16
        # matmul peak on v5e. Weight-only ("int8") stays the conservative
        # default; "int8-dynamic" mirrors the reference's ONNX dynamic
        # quantization mode (DynamicQuantizeLinear + MatMulInteger).
        self._act_quant = self.runtime.quant_mode == "int8-dynamic"
        if self.runtime.fuse_qkv:
            params = fuse_qkv_params(params, cfg)
        self.params = shard_params(params, self.mesh)
        self._param_shardings = shard_spec_tree(params, self.mesh)
        # Multi-process (multi-host) mesh: inputs must be assembled into
        # global arrays from each host's identical copy, and outputs must be
        # replicated so every host can read its result locally ([B, L] probs
        # are tiny — the all-gather is noise next to the step).
        self._multiprocess = any(
            d.process_index != jax.process_index()
            for d in np.asarray(self.mesh.devices).flat
        )
        self._out_sharding = NamedSharding(
            self.mesh, P() if self._multiprocess else P(DATA_AXIS, None)
        )
        self._steps: dict[tuple[int, int], Any] = {}

    # ------------------------------------------------------------------
    def _get_step(self, seq_len: int, max_labels: int):
        key = (seq_len, max_labels)
        step = self._steps.get(key)
        if step is None:
            cfg, dtype = self.cfg, self.compute_dtype
            act_q = self._act_quant
            # Inputs shard [B, S] over (data, seq). With sp>1 the activations
            # stay token-sharded through embeddings/FFN/norms; XLA's SPMD
            # partitioner inserts the k/v all-gathers attention needs (the
            # sequence-parallel schedule of the scaling-book recipe). Buckets
            # not divisible by sp fall back to seq-replicated.
            in_sharding = seq_sharding(self.mesh, seq_len)

            def fwd(params, input_ids, attention_mask):
                # act_quant is a TRACE-time switch (jit calls fwd with tracers,
                # so the context wraps tracing; see ops/layers.act_quant).
                with act_quant_ctx(act_q):
                    return gliclass_probs(
                        params, input_ids, attention_mask, cfg, max_labels, dtype
                    )

            step = jax.jit(
                fwd,
                in_shardings=(self._param_shardings, in_sharding, in_sharding),
                out_shardings=self._out_sharding,
            )
            self._steps[key] = step
        return step

    def _get_stack_step(self, seq_len: int, max_labels: int, nb: int):
        """One executable running ``nb`` same-shape batches via ``lax.scan``.

        Exists because each executable LAUNCH carries a fixed host-side cost
        (~25ms through a tunneled PJRT stack, ~50us locally) that dwarfs the
        ~6ms device step at serving shapes — one launch per shape bucket
        instead of one per batch moves that cost off the critical path. The
        reference pays the per-batch equivalent on every ``session.Run``
        (reference src/model.c:159); XLA lets us fold the batch loop into the
        compiled program instead.

        Measured trade (r4, [128,96] w8a8, v5e): a scan iteration costs
        ~+2.2 ms over the SAME step as a single launch (17.3 vs 15.0 ms,
        chain-differenced) — the scan serializes step boundaries that
        pipelined launches overlap. Stacking therefore pays only when the
        per-launch overhead actually exceeds that (fresh-input launches
        through the tunnel, many tiny serving batches), which is why the
        streamed plan stacks same-chunk bursts but never waits to stack."""
        key = ("stack", seq_len, max_labels, nb)
        step = self._steps.get(key)
        if step is None:
            cfg, dtype = self.cfg, self.compute_dtype
            act_q = self._act_quant
            in_sharding = stack_sharding(self.mesh, seq_len)

            def fwd(params, input_ids, attention_mask):
                def body(_, xs):
                    ids, mask = xs
                    return None, gliclass_probs(
                        params, ids, mask, cfg, max_labels, dtype
                    )

                with act_quant_ctx(act_q):
                    _, probs = jax.lax.scan(
                        body, None, (input_ids, attention_mask)
                    )
                return probs

            out_sharding = NamedSharding(
                self.mesh,
                P() if self._multiprocess else P(None, DATA_AXIS, None),
            )
            step = jax.jit(
                fwd,
                in_shardings=(self._param_shardings, in_sharding, in_sharding),
                out_shardings=out_sharding,
            )
            self._steps[key] = step
        return step

    # ------------------------------------------------------------------
    def _row_bucket(self, n: int) -> int:
        """Pad target for the batch dimension: next power of two clamped at
        ``runtime.batch_size``, rounded up to a multiple of dp.

        Executables are traced per input SHAPE, so without row bucketing every
        distinct micro-batch size arriving at the serving scheduler compiles
        its own step — measured as a compile storm that held streaming
        throughput to 19 req/s on the tunneled chip. Power-of-two buckets
        bound the variety to log2(batch_size) sizes per (seq, labels) bucket
        at a worst-case 2x row padding (padded rows are fully masked and cost
        only device time, never correctness — padding-invariance tests).

        The clamp matters for non-power-of-two batch sizes: a FULL batch
        (n == batch_size, the hot path) must never pad past itself (e.g.
        batch_size=96 padding 96->128 would waste ~33% device compute on
        every full step); sizes above batch_size (stack_batches tails) keep
        their own dp-aligned count for the same reason."""
        dp = max(self.mesh.shape[DATA_AXIS], 1)
        bs = self.runtime.batch_size
        if n >= bs:
            target = n
        else:
            p = 1
            while p < n:
                p *= 2
            target = min(p, bs)
        return -(-target // dp) * dp

    def _pad_batch(self, batch: TokenizedBatch) -> tuple[np.ndarray, np.ndarray, int]:
        """Pad the batch dim to the row bucket (power of two, multiple of dp);
        padded rows are fully masked."""
        n = batch.batch_size
        target = self._row_bucket(n)
        if target == n:
            return batch.input_ids, batch.attention_mask, n
        ids = np.zeros((target, batch.seq_length), dtype=batch.input_ids.dtype)
        mask = np.zeros((target, batch.seq_length), dtype=batch.attention_mask.dtype)
        ids[:n] = batch.input_ids
        # padded rows keep one valid token so softmax rows are not all -inf
        ids[n:, 0] = self.cfg.backbone.pad_token_id
        mask[:n] = batch.attention_mask
        mask[n:, 0] = 1
        return ids, mask, n

    def _device_inputs(self, ids: np.ndarray, mask: np.ndarray):
        """Host arrays -> device arrays matching the step's in_shardings.

        Single-process: plain transfers (jit places them). Multi-process: every
        host tokenized the SAME job (deterministic planning), so each host's
        copy IS the global array — assemble it by slicing out this host's
        addressable shards (the multihost data-loading recipe; the request
        plane the reference never had, SURVEY §2 'distributed backend')."""
        if not self._multiprocess:
            return jnp.asarray(ids), jnp.asarray(mask)
        sh = seq_sharding(self.mesh, ids.shape[1])
        return (
            jax.make_array_from_process_local_data(sh, ids, ids.shape),
            jax.make_array_from_process_local_data(sh, mask, mask.shape),
        )

    def stack_batches(
        self, batches: list[TokenizedBatch]
    ) -> tuple[np.ndarray, np.ndarray, list[int]]:
        """Stack same-seq-length batches into [nb, B0, S] host arrays for
        :meth:`run_stacked_async`; padded rows follow the :meth:`_pad_batch`
        convention (fully masked, one valid pad token). Returns (ids, mask,
        valid-row counts)."""
        B0 = self._row_bucket(max(b.batch_size for b in batches))
        S = batches[0].seq_length
        ids = np.zeros((len(batches), B0, S), dtype=np.int32)
        mask = np.zeros((len(batches), B0, S), dtype=np.int32)
        rows: list[int] = []
        for i, b in enumerate(batches):
            n = b.batch_size
            ids[i, :n] = b.input_ids
            mask[i, :n] = b.attention_mask
            if n < B0:
                ids[i, n:, 0] = self.cfg.backbone.pad_token_id
                mask[i, n:, 0] = 1
            rows.append(n)
        return ids, mask, rows

    def warmup(
        self,
        seq_buckets=None,
        label_buckets=None,
        max_seq: int | None = None,
        stack_depths: tuple = tuple(range(2, 17)),
        log=None,
    ) -> int:
        """Pre-compile (or cache-load) and EXECUTE the serving executable
        set: every (seq bucket, power-of-two row bucket, label bucket)
        single-launch step plus the ``stack_depths`` stacked-scan variants
        the streaming scheduler's dispatch_ready produces. Kills serving
        cold starts — each first-touch costs a compile (seconds-to-minutes
        through a remote-compile tunnel) or a compile-cache load (~0.3 s
        measured), which showed up as a multi-drain warm-up ramp and
        multi-second p99s in the r5 serving measurements (stack warmup
        alone measured first-drain 1,070 -> 2,284 req/s). The default
        depth set covers EVERY depth dispatch_ready can produce (2.._MAX
        _STACK — scan executables are shape-keyed per depth, so warming
        only powers of two would leave e.g. a 3-deep stack to compile on
        first traffic); round tails dispatch alone at partial row buckets,
        which the singles sweep covers. ``max_seq`` skips long-context
        buckets a latency-sensitive server never uses; ``stack_depths=()``
        warms singles only. Returns the number of executables warmed."""
        rt = self.runtime
        seqs = [
            s for s in (seq_buckets or rt.seq_buckets)
            if max_seq is None or s <= max_seq
        ]
        labels = list(label_buckets or rt.label_buckets)
        rows: list[int] = []
        r = 1
        while r < rt.batch_size:
            rows.append(self._row_bucket(r))
            r *= 2
        rows.append(self._row_bucket(rt.batch_size))
        rows = sorted(set(rows))
        pad = self.cfg.backbone.pad_token_id
        n = 0
        last = None
        for s in seqs:
            for lb in labels:
                for b in rows:
                    ids = np.full((b, s), pad, dtype=np.int32)
                    mask = np.zeros((b, s), dtype=np.int32)
                    mask[:, 0] = 1
                    step = self._get_step(s, lb)
                    last = step(self.params, *self._device_inputs(ids, mask))
                    n += 1
                B0 = self._row_bucket(rt.batch_size)
                for nb in stack_depths:
                    ids = np.full((nb, B0, s), pad, dtype=np.int32)
                    mask = np.zeros((nb, B0, s), dtype=np.int32)
                    mask[:, :, 0] = 1
                    last = self.run_stacked_async(ids, mask, lb)
                    n += 1
            if log:
                log(f"warmup: seq {s} done ({n} executables)")
        if last is not None:
            np.asarray(last)  # drain the queue once
        return n

    def run(self, batch: TokenizedBatch, max_labels: int) -> np.ndarray:
        """Tokenized batch -> per-label probabilities [batch, max_labels] (f32).

        Probabilities for padded label slots are exactly 0 (hard-masked logits).
        """
        ids, mask, n = self._pad_batch(batch)
        step = self._get_step(ids.shape[1], max_labels)
        probs = step(self.params, *self._device_inputs(ids, mask))
        return np.asarray(probs)[:n]

    def run_async(self, batch: TokenizedBatch, max_labels: int):
        """Dispatch without blocking; returns (device_array, n_valid).

        XLA dispatch is async — the host thread can tokenize the next batch
        while the device computes (the pipelining the reference's three-phase
        barrier design precludes; reference main.c:116-155)."""
        ids, mask, n = self._pad_batch(batch)
        step = self._get_step(ids.shape[1], max_labels)
        return step(self.params, *self._device_inputs(ids, mask)), n

    def run_stacked_async(
        self, ids: np.ndarray, mask: np.ndarray, max_labels: int
    ):
        """Dispatch ``nb`` same-shape batches as ONE executable launch.

        ``ids``/``mask``: [nb, B, S] with padded rows fully masked except one
        pad token (the :meth:`_pad_batch` convention — the caller stacks).
        Returns the device array [nb, B, max_labels]; probabilities for padded
        rows/label slots are garbage/0 respectively and must be sliced off by
        the caller."""
        step = self._get_stack_step(ids.shape[2], max_labels, ids.shape[0])
        if not self._multiprocess:
            return step(self.params, jnp.asarray(ids), jnp.asarray(mask))
        sh = stack_sharding(self.mesh, ids.shape[2])
        return step(
            self.params,
            jax.make_array_from_process_local_data(sh, ids, ids.shape),
            jax.make_array_from_process_local_data(sh, mask, mask.shape),
        )

    # ------------------------------------------------------------------
    @classmethod
    def from_bundle(
        cls,
        bundle_path: str,
        runtime: RuntimeConfig | None = None,
        mesh: Mesh | None = None,
    ) -> "InferenceEngine":
        from .convert import bundle as B

        runtime = runtime or RuntimeConfig()
        cfg = B.load_config(bundle_path)
        params = B.load_params(
            bundle_path,
            quantized=runtime.quant_mode in ("int8", "int8-dynamic"),
        )
        return cls(cfg, params, runtime, mesh)
