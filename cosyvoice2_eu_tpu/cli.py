"""``cosy2-eu`` command-line interface.

Mirrors the reference CLI flag surface
(reference: standalone_infer/src/cosyvoice2_eu/cli.py:54-123): --text --prompt
--out --setting --llm-run-id --final --stream --speed --backbone, plus a
global in-process model cache.  Audio is written as 16-bit PCM wav (host
stdlib; the reference used torchaudio.save).
"""

from __future__ import annotations

import argparse
import os
import wave

import numpy as np

_cached_model = None
_cached_key = None


def get_or_load_model(**kwargs):
    global _cached_model, _cached_key
    key = tuple(sorted(kwargs.items()))
    if _cached_model is None or _cached_key != key:
        import cosyvoice2_eu_tpu as cosy

        _cached_model = cosy.load(**kwargs)
        _cached_key = key
    return _cached_model


def save_wav(path: str, audio: np.ndarray, sr: int) -> None:
    audio = np.clip(audio, -1.0, 1.0)
    pcm = (audio * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def main(argv=None):
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    if argv[:1] == ["warmup"]:
        # `cosy2-eu warmup`: precompile + export the AOT executable store so
        # a fresh machine's first audio skips compilation entirely
        from cosyvoice2_eu_tpu.runtime.warmup import warmup_main

        return warmup_main(argv[1:])
    parser = argparse.ArgumentParser(
        description="CosyVoice2-EU TPU inference (cross-lingual cloning)"
    )
    parser.add_argument("--text", type=str, required=True)
    parser.add_argument("--prompt", type=str, required=True, help="path to a 16 kHz prompt wav")
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument(
        "--model-dir", type=str, default=os.path.expanduser("~/.cache/cosyvoice2-eu")
    )
    parser.add_argument("--setting", type=str, default="llm_flow_hifigan")
    parser.add_argument("--llm-run-id", type=str, default=None)
    parser.add_argument("--flow-run-id", type=str, default=None)
    parser.add_argument("--hifigan-run-id", type=str, default=None)
    parser.add_argument("--final", action="store_true")
    parser.add_argument("--stream", action="store_true")
    parser.add_argument("--speed", type=float, default=1.0)
    parser.add_argument("--text-frontend", action="store_true")
    parser.add_argument("--prompt-text", type=str, default="")
    parser.add_argument("--mode", type=str, default="cross_lingual",
                        choices=["cross_lingual", "zero_shot"])
    parser.add_argument(
        "--backbone", type=str, default=None,
        help="blanken | hf:<id-or-path> | local:<path> (reference cli.py:64); "
        "non-BlankEN backbones decode via the bistream fill-token protocol",
    )
    parser.add_argument("--clear-cache", action="store_true")
    args = parser.parse_args(argv)

    if args.clear_cache:
        global _cached_model, _cached_key
        _cached_model, _cached_key = None, None

    model = get_or_load_model(
        model_dir=args.model_dir,
        setting=args.setting,
        llm_run_id=args.llm_run_id,
        flow_run_id=args.flow_run_id,
        hifigan_run_id=args.hifigan_run_id,
        final=args.final or None,
        backbone=args.backbone,
    )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    if args.stream:
        chunks = [
            c[0]
            for c in model.stream(
                args.text, args.prompt, prompt_text=args.prompt_text,
                speed=args.speed, text_frontend=args.text_frontend, mode=args.mode,
            )
        ]
        audio = np.concatenate(chunks)
    else:
        wav, _ = model.tts(
            args.text, args.prompt, prompt_text=args.prompt_text,
            speed=args.speed, text_frontend=args.text_frontend, mode=args.mode,
        )
        audio = wav[0]
    save_wav(args.out, audio, model.sample_rate)
    print(f"wrote {args.out}: {len(audio) / model.sample_rate:.2f}s at {model.sample_rate} Hz")


if __name__ == "__main__":
    main()
