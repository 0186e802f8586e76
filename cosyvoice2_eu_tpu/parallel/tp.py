"""Tensor-parallel serving shardings for the speech-LM decode.

The AR decode is HBM-bandwidth-bound — every token reads the full weight set
once (see bench.py stage_roofline: lm_bw_util ~0.65 on one v5e) — so
sharding the weights over a 'tp' mesh axis cuts per-token latency nearly
linearly with chips: each chip streams 1/tp of the bytes and XLA inserts the
row-parallel psum reductions (after o_proj / down_proj) that ride ICI.

This is pure GSPMD: megatron-style layouts expressed as NamedShardings on
the parameter pytree, consumed by the UNCHANGED decode programs
(models/llm.py lm_prefill / lm_decode_chunk / lm_decode) — the partitioner
propagates the shardings through the lax.while_loop, keeping the KV cache
sharded over kv-heads and activations sharded over attention heads / MLP
columns with no model-code changes.

The reference has no tensor parallelism outside its optional vLLM engine
(reference: cosy_repo/cosyvoice/vllm/cosyvoice2.py:57-67, ParallelLMHead);
this is the TPU-native equivalent for multi-chip serving.

Layout (weights are torch-orientation ``(out, in)``, applied as ``x @ W.T``):

  q/k/v_proj, gate/up_proj, llm_decoder   column-parallel: out dim over 'tp'
  o_proj, down_proj                        row-parallel:    in dim over 'tp'
  embeddings, norms, biases of row-parallel layers   replicated

Any tensor whose shard axis is not divisible by tp (e.g. the 2 kv-heads of
Qwen2-0.5B at tp=4) falls back to replicated — correct, just less saving on
that tensor.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel module names: shard the OUT dim (weight axis 0, bias)
_COL = frozenset({"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "llm_decoder"})
# row-parallel module names: shard the IN dim (weight axis 1); bias replicated
_ROW = frozenset({"o_proj", "down_proj"})


def make_tp_mesh(tp: int = -1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if tp == -1:
        tp = len(devices)
    assert tp <= len(devices), f"tp({tp}) > devices({len(devices)})"
    return Mesh(np.asarray(devices[:tp]), ("tp",))


def _module_specs(module: dict, kind: str, tp: int) -> dict:
    """Specs for one dense module's leaves ({weight[, bias]} or the int8
    {weight_q, scale[, bias]} variant)."""
    out = {}
    for name, leaf in module.items():
        spec = P()
        if kind == "col":
            # out dim: weight/weight_q axis 0; bias/scale are (out,)
            if leaf.ndim >= 1 and leaf.shape[0] % tp == 0:
                spec = P("tp") if leaf.ndim == 1 else P("tp", *([None] * (leaf.ndim - 1)))
        elif kind == "row" and name in ("weight", "weight_q", "weight_q_xla"):
            if leaf.ndim == 2 and leaf.shape[1] % tp == 0:
                spec = P(None, "tp")
        out[name] = spec
    return out


def lm_tp_specs(params: dict, tp: int) -> dict:
    """PartitionSpec pytree matching an LM parameter pytree (init_lm)."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for key, val in node.items():
                if key in _COL and isinstance(val, dict):
                    out[key] = _module_specs(val, "col", tp)
                elif key in _ROW and isinstance(val, dict):
                    out[key] = _module_specs(val, "row", tp)
                else:
                    out[key] = walk(val)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return P()  # replicated leaf

    return walk(params)


def shard_lm_tp(params: dict, mesh: Mesh) -> dict:
    """Place an LM parameter pytree on the 'tp' mesh per lm_tp_specs.

    The decode programs need no changes: jit infers input shardings from the
    placed arrays and GSPMD partitions the while_loop body (KV cache lands
    sharded over kv-heads because k/v_proj outputs are).

    Quantized modules are re-keyed ``weight_q`` -> ``weight_q_xla`` so
    utils/params.py dense() takes the XLA dequant path under tp: a
    pallas_call has no GSPMD partitioning rule, so routing sharded int8
    weights through the Pallas kernel would force a full all-gather per
    decode step (or fail to lower)."""

    def requantize(node):
        if isinstance(node, dict):
            return {
                ("weight_q_xla" if k == "weight_q" else k): requantize(v)
                for k, v in node.items()
            }
        if isinstance(node, (list, tuple)):
            return type(node)(requantize(v) for v in node)
        return node

    params = requantize(params)
    specs = lm_tp_specs(params, mesh.shape["tp"])

    # manual walk: PartitionSpec is tuple-like, so jax.tree.map would
    # traverse INTO the specs instead of treating them as leaves
    def place(node, spec):
        if isinstance(node, dict):
            return {k: place(v, spec[k]) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(place(v, s) for v, s in zip(node, spec))
        return jax.device_put(node, NamedSharding(mesh, spec))

    return place(params, specs)
