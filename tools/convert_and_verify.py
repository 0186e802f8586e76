"""One-command real-checkpoint conversion + verification.

Given a model_dir holding the reference release artifacts
(llm.pt / flow.pt / hift.pt, optionally speech_tokenizer_v2.onnx /
campplus.onnx and the Qwen tokenizer / CosyVoice-BlankEN dirs), this tool:

  1. converts every checkpoint to JAX pytrees (runtime/checkpoint.py),
  2. runs activation parity against the ACTUAL reference PyTorch modules on
     CPU (runtime/refverify.py; flow.inference / hift.decode / llm logits),
  3. verifies the ONNX conversions against the graphs' own arithmetic
     (runtime/onnx_exec.py): FSQ codes token-exact, x-vector cosine,
  4. synthesizes a sentence through the JAX stack and reports stats,
  5. writes a JSON report (and optionally the converted orbax pytrees).

Usage:
  python tools/convert_and_verify.py --model_dir /path/to/ckpts \
      [--out report.json] [--save-converted exp/converted] [--skip-torch]

Reference call sites being reproduced: cli/frontend.py:262-283 (ONNX),
cli/model.py:67-98 (load of llm/flow/hift), flow.py:235, generator.py:520.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _maybe(path):
    return path if os.path.exists(path) else None


def verify_torch_checkpoints(model_dir: str, cfg, report: dict) -> dict:
    """Activation parity vs the reference modules loaded with the REAL weights."""
    import torch

    from cosyvoice2_eu_tpu.runtime import refverify as rv

    rng = np.random.default_rng(0)

    hift_path = _maybe(os.path.join(model_dir, "hift.pt"))
    if hift_path:
        ref = rv.build_ref_hift(cfg.hift)
        state = torch.load(hift_path, map_location="cpu", weights_only=True)
        state = {k.replace("generator.", ""): v for k, v in state.items()}
        ref.load_state_dict(state, strict=True)
        t_mel = 50
        mel = rng.standard_normal((1, cfg.hift.in_channels, t_mel)).astype(np.float32)
        src = (rng.standard_normal((1, 1, t_mel * cfg.hift.upsample_scale)) * 0.1).astype(np.float32)
        report["hift"] = rv.hift_parity(ref, cfg.hift, mel, src)

    flow_path = _maybe(os.path.join(model_dir, "flow.pt"))
    if flow_path:
        ref = rv.build_ref_flow(cfg.flow)
        state = torch.load(flow_path, map_location="cpu", weights_only=True)
        ref.load_state_dict(state, strict=False)
        token = rng.integers(0, cfg.flow.vocab_size, (1, 25)).astype(np.int64)
        feat = (rng.standard_normal((1, 20, cfg.flow.output_size)) * 0.5).astype(np.float32)
        emb = rng.standard_normal((1, cfg.flow.spk_embed_dim)).astype(np.float32)
        for streaming in (False, True):
            report[f"flow_streaming_{streaming}"] = rv.flow_parity(
                ref, cfg.flow, token, feat, emb, streaming=streaming
            )

    llm_path = _maybe(os.path.join(model_dir, "llm.pt"))
    backbone_dir = _maybe(os.path.join(model_dir, "CosyVoice-BlankEN"))
    if llm_path and backbone_dir:
        ref = rv.build_ref_qwen2lm(cfg.llm, backbone_dir)
        state = torch.load(llm_path, map_location="cpu", weights_only=True)
        ref.load_state_dict(state, strict=False)
        text = rng.integers(10, 5000, 12).astype(np.int32)
        speech = rng.integers(0, cfg.llm.speech_token_size, 30).astype(np.int32)
        report["llm_logits"] = rv.llm_logits_parity(ref, cfg.llm, text, speech)
    return report


def verify_onnx(model_dir: str, report: dict, n_frames: int = 96) -> dict:
    """Converted JAX aux models vs the ONNX graphs run by the numpy executor."""
    import jax.numpy as jnp

    from cosyvoice2_eu_tpu.models import campplus as cam
    from cosyvoice2_eu_tpu.models import speech_tokenizer as st
    from cosyvoice2_eu_tpu.runtime.onnx_convert import (
        convert_campplus,
        convert_speech_tokenizer,
    )
    from cosyvoice2_eu_tpu.runtime.onnx_exec import run_graph
    from cosyvoice2_eu_tpu.runtime.onnx_import import load_onnx

    rng = np.random.default_rng(1)

    st_path = _maybe(os.path.join(model_dir, "speech_tokenizer_v2.onnx"))
    if st_path:
        t0 = time.time()
        model = load_onnx(st_path)
        try:
            params, st_cfg = convert_speech_tokenizer(model)
        except Exception as e:
            # structural conversion failed: load() would fall back to the
            # numpy graph executor — smoke it and surface the structural error
            from cosyvoice2_eu_tpu.runtime.onnx_fallback import (
                make_executor_speech_tokenizer_fn,
            )

            fn = make_executor_speech_tokenizer_fn(model)
            wav = (rng.standard_normal(16000) * 0.05).astype(np.float32)
            codes = fn(wav)
            report["speech_tokenizer"] = {
                "ok": bool(len(codes) > 0),
                "mode": "executor_fallback",
                "structural_error": str(e),
                "n_tokens": int(len(codes)),
                "seconds": round(time.time() - t0, 1),
            }
        else:
            mel = rng.standard_normal((1, st_cfg.n_mels, n_frames)).astype(np.float32)
            feeds = {model["inputs"][0]: mel}
            if len(model["inputs"]) > 1:  # length input
                feeds[model["inputs"][1]] = np.asarray([n_frames], np.int32)
            ref = np.asarray(run_graph(model, feeds)[0]).reshape(-1)
            codes, code_len = st.encode(params, st_cfg, jnp.asarray(mel), jnp.asarray([n_frames]))
            got = np.asarray(codes)[0, : int(code_len[0])]
            n = min(len(got), len(ref))
            report["speech_tokenizer"] = {
                "ok": bool(n > 0 and (got[:n] == ref[:n]).all()),
                "mode": "structural",
                "token_match": float((got[:n] == ref[:n]).mean()) if n else 0.0,
                "n_tokens": int(n),
                "config": {"layers": st_cfg.num_layers, "d_model": st_cfg.d_model,
                           "strides": list(st_cfg.conv_strides)},
                "seconds": round(time.time() - t0, 1),
            }

    cam_path = _maybe(os.path.join(model_dir, "campplus.onnx"))
    if cam_path:
        t0 = time.time()
        model = load_onnx(cam_path)
        try:
            params, cam_cfg = convert_campplus(model)
        except Exception as e:
            from cosyvoice2_eu_tpu.runtime.onnx_fallback import (
                make_executor_spk_embedding_fn,
            )

            fn = make_executor_spk_embedding_fn(model)
            wav = (rng.standard_normal(2 * 16000) * 0.05).astype(np.float32)
            emb = fn(wav)
            report["campplus"] = {
                "ok": bool(len(emb) > 0 and np.isfinite(emb).all()),
                "mode": "executor_fallback",
                "structural_error": str(e),
                "embedding_dim": int(len(emb)),
                "seconds": round(time.time() - t0, 1),
            }
        else:
            fbank = rng.standard_normal((1, 200, cam_cfg.feat_dim)).astype(np.float32)
            ref = np.asarray(run_graph(model, {model["inputs"][0]: fbank})[0]).reshape(-1)
            got = np.asarray(cam.campplus_forward(params, cam_cfg, jnp.asarray(fbank)))[0]
            cos = float(np.dot(ref, got) / (np.linalg.norm(ref) * np.linalg.norm(got) + 1e-12))
            report["campplus"] = {
                "ok": bool(cos > 0.999),
                "mode": "structural",
                "cosine": cos,
                "config": {"blocks": list(cam_cfg.block_layers),
                           "embedding": cam_cfg.embedding_size},
                "seconds": round(time.time() - t0, 1),
            }
    return report


def synthesize_sentence(model_dir: str, cfg, report: dict) -> dict:
    import cosyvoice2_eu_tpu as cosy

    t0 = time.time()
    model = cosy.load(model_dir=model_dir, config=cfg)
    rng = np.random.default_rng(2)
    prompt_wav = (rng.standard_normal(3 * 16000) * 0.05).astype(np.float32)
    try:
        wav, sr = model.tts("Bonjour, ceci est une phrase de vérification.", prompt_wav)
        report["synthesis"] = {
            "ok": bool(np.isfinite(wav).all() and wav.shape[-1] > 0),
            "seconds_audio": wav.shape[-1] / sr,
            "rms": float(np.sqrt(np.mean(wav**2))),
            "peak": float(np.abs(wav).max()),
            "wall_s": round(time.time() - t0, 1),
        }
    except ValueError as e:  # aux models absent and no precomputed artifacts
        report["synthesis"] = {"ok": False, "skipped": str(e)}
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--out", default=None, help="write the JSON report here")
    ap.add_argument("--save-converted", default=None,
                    help="persist converted pytrees (orbax) under this dir")
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--skip-onnx", action="store_true")
    ap.add_argument("--skip-synthesis", action="store_true")
    args = ap.parse_args(argv)

    from cosyvoice2_eu_tpu.config import TTSConfig

    cfg = TTSConfig()
    report: dict = {"model_dir": args.model_dir}

    _ALL = ("llm.pt", "flow.pt", "hift.pt", "speech_tokenizer_v2.onnx",
            "campplus.onnx")
    present = sorted(
        f for f in _ALL if os.path.exists(os.path.join(args.model_dir, f))
    )
    report["artifacts_found"] = present
    report["artifacts_missing"] = sorted(set(_ALL) - set(present))
    # a subset still produces a full report for what IS there: the first
    # machine that has any real artifact gets evidence with zero friction
    # (docs/REAL_WEIGHTS.md; VERDICT r4 next #10)
    report["partial"] = bool(report["artifacts_missing"])
    if not present:
        print(json.dumps(dict(report, error="no checkpoint artifacts found")))
        return 1

    if not args.skip_torch:
        from cosyvoice2_eu_tpu.runtime.refverify import reference_available

        if reference_available():
            verify_torch_checkpoints(args.model_dir, cfg, report)
        else:
            report["torch_parity"] = "skipped: reference checkout not present"
    if not args.skip_onnx:
        verify_onnx(args.model_dir, report)
    if not args.skip_synthesis and any(f.endswith(".pt") for f in present):
        synthesize_sentence(args.model_dir, cfg, report)

    if args.save_converted:
        from cosyvoice2_eu_tpu.runtime.checkpoint import (
            load_reference_checkpoints,
            save_pytree,
        )

        params = load_reference_checkpoints(args.model_dir, cfg)
        for name, tree in params.items():
            save_pytree(os.path.join(args.save_converted, name), tree)
        report["saved_converted"] = args.save_converted

    ok = all(
        v.get("ok", True) for v in report.values() if isinstance(v, dict) and "ok" in v
    )
    report["all_ok"] = ok
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
