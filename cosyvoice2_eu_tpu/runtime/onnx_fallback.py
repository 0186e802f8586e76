"""Executor-backed frontend functions: the graceful-degradation path for
real checkpoint ONNX files the structural converter cannot map.

First contact with a real ``speech_tokenizer_v2.onnx`` / ``campplus.onnx``
(reference cli/frontend.py:262-283) may hit an export variant the structural
converter (runtime/onnx_convert.py) does not recognize.  Rather than failing
the whole load, these wrappers run prompt extraction directly through the
numpy graph executor (runtime/onnx_exec.run_graph) with the reference's
exact feed conventions:

  speech tokenizer: feeds[0] = whisper log-mel (1, n_mels, T) float32,
                    feeds[1] = [T] int32; output[0] flattened = codes
                    (frontend.py:262-274)
  campplus:         feeds[0] = kaldi fbank - mean (1, T, 80) float32;
                    output[0] flattened = 192-d x-vector (frontend.py:276-283)

This path is 10-100x slower than the JAX ports (prompt extraction happens
once per prompt, so it is tolerable) but requires zero topology assumptions
beyond the executor's op matrix.
"""

from __future__ import annotations

import numpy as np


def _first_conv_in_channels(model: dict, ndim: int) -> int | None:
    """In-channel count of the first Conv whose weight is an initializer."""
    init = model["initializers"]
    for n in model["nodes"]:
        if n["op_type"] == "Conv" and len(n["input"]) > 1 and n["input"][1] in init:
            w = np.asarray(init[n["input"][1]])
            if w.ndim == ndim:
                return int(w.shape[1])
    return None


def make_executor_speech_tokenizer_fn(model: dict):
    """16 kHz wav -> FSQ codes by executing the parsed ONNX graph directly."""
    import jax.numpy as jnp

    from cosyvoice2_eu_tpu.ops.mel import whisper_log_mel
    from cosyvoice2_eu_tpu.runtime.onnx_exec import run_graph

    n_mels = _first_conv_in_channels(model, ndim=3) or 128
    feeds = list(model["inputs"])

    def fn(wav_16k: np.ndarray) -> np.ndarray:
        assert len(wav_16k) <= 30 * 16000, "prompt must be <= 30 s"
        mel = np.asarray(whisper_log_mel(jnp.asarray(wav_16k[None]), n_mels=n_mels))
        feed = {feeds[0]: mel.astype(np.float32)}
        if len(feeds) > 1:
            feed[feeds[1]] = np.asarray([mel.shape[2]], np.int32)
        codes = run_graph(model, feed)[0]
        return np.asarray(codes).reshape(-1).astype(np.int32)

    return fn


def make_executor_spk_embedding_fn(model: dict, feat_dim: int = 80):
    """16 kHz wav -> x-vector by executing the parsed ONNX graph directly."""
    import jax.numpy as jnp

    from cosyvoice2_eu_tpu.models.campplus import kaldi_fbank_cmn
    from cosyvoice2_eu_tpu.runtime.onnx_exec import run_graph

    feeds = list(model["inputs"])

    def fn(wav_16k: np.ndarray) -> np.ndarray:
        fbank = np.asarray(kaldi_fbank_cmn(jnp.asarray(wav_16k[None]), feat_dim))
        emb = run_graph(model, {feeds[0]: fbank.astype(np.float32)})[0]
        return np.asarray(emb).reshape(-1).astype(np.float32)

    return fn


def load_frontend_fns(st_path: str | None, cam_path: str | None,
                      strict: bool = False):
    """(speech_tokenizer_fn, spk_embedding_fn) with structural-first,
    executor-fallback semantics.

    Tries the structural ONNX->JAX conversion (fast, jitted); when that
    raises — unfamiliar export topology, shape drift — falls back to the
    numpy executor wrappers above with a logged warning.  ``strict=True``
    re-raises instead (used by tools/convert_and_verify.py to surface the
    structural failure).  ``COSY2EU_ONNX_EXECUTOR=1`` forces the executor
    path for A/B debugging.
    """
    import logging
    import os

    from cosyvoice2_eu_tpu.frontend.frontend import (
        make_speech_tokenizer_fn,
        make_spk_embedding_fn,
    )
    from cosyvoice2_eu_tpu.runtime.onnx_convert import (
        convert_campplus,
        convert_speech_tokenizer,
    )
    from cosyvoice2_eu_tpu.runtime.onnx_import import load_onnx

    force_exec = os.environ.get("COSY2EU_ONNX_EXECUTOR") == "1"
    log = logging.getLogger(__name__)

    st_fn = cam_fn = None
    if st_path is not None and os.path.exists(st_path):
        graph = load_onnx(st_path)
        if force_exec:
            st_fn = make_executor_speech_tokenizer_fn(graph)
        else:
            try:
                st_params, st_cfg = convert_speech_tokenizer(graph)
                st_fn = make_speech_tokenizer_fn(st_params, st_cfg)
            except Exception:
                if strict:
                    raise
                log.warning(
                    "structural conversion of %s failed; falling back to the "
                    "numpy graph executor (slower, topology-agnostic)",
                    st_path, exc_info=True,
                )
                st_fn = make_executor_speech_tokenizer_fn(graph)
    if cam_path is not None and os.path.exists(cam_path):
        graph = load_onnx(cam_path)
        if force_exec:
            cam_fn = make_executor_spk_embedding_fn(graph)
        else:
            try:
                cam_params, cam_cfg = convert_campplus(graph)
                cam_fn = make_spk_embedding_fn(cam_params, cam_cfg)
            except Exception:
                if strict:
                    raise
                log.warning(
                    "structural conversion of %s failed; falling back to the "
                    "numpy graph executor (slower, topology-agnostic)",
                    cam_path, exc_info=True,
                )
                cam_fn = make_executor_spk_embedding_fn(graph)
    return st_fn, cam_fn
