"""AOT export of compiled XLA artifacts.

TPU-native replacement for the reference's TorchScript / ONNX / TensorRT
export path (reference: cosy_repo/cosyvoice/bin/export_jit.py:56-118,
bin/export_onnx.py:70-183, utils/file_utils.py:53-129): stage functions are
lowered + compiled ahead of time with jax.export and serialized to disk, so a
serving process can skip JIT compilation entirely.

Exports are per (stage, bucket) — the same static-shape grid the runtime uses.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def export_flow_estimator(params, cfg, mel_buckets: Sequence[int], out_dir: str) -> list[str]:
    """Serialize the CFM estimator for each mel bucket (the reference exports
    exactly this module to ONNX/TRT, export_onnx.py:70)."""
    from jax import export as jax_export

    from cosyvoice2_eu_tpu.models.estimator import estimator_forward

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for t_mel in mel_buckets:
        def fn(p, x, mask, mu, t, spks, cond):
            return estimator_forward(p, cfg.estimator, x, mask, mu, t, spks, cond)

        args = (
            params["estimator"],
            jnp.zeros((2, cfg.output_size, t_mel), jnp.bfloat16),
            jnp.zeros((2, 1, t_mel), jnp.bfloat16),
            jnp.zeros((2, cfg.output_size, t_mel), jnp.bfloat16),
            jnp.zeros((2,), jnp.bfloat16),
            jnp.zeros((2, cfg.output_size), jnp.bfloat16),
            jnp.zeros((2, cfg.output_size, t_mel), jnp.bfloat16),
        )
        exported = jax_export.export(jax.jit(fn))(*args)
        path = os.path.join(out_dir, f"flow.estimator.mel{t_mel}.jax")
        with open(path, "wb") as f:
            f.write(exported.serialize())
        paths.append(path)
    return paths


def load_exported(path: str):
    from jax import export as jax_export

    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def export_tts_stages(tts_model, out_dir: str, token_buckets=(128, 256)) -> list[str]:
    """Export the flow stage functions the orchestrator uses."""
    paths = export_flow_estimator(
        tts_model.params["flow"],
        tts_model.cfg.flow,
        [b * tts_model.cfg.flow.token_mel_ratio for b in token_buckets],
        out_dir,
    )
    return paths
