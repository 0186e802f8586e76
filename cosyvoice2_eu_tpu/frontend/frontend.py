"""Prompt-side frontend: text tokens + prompt features for zero-shot cloning.

TPU-native re-design of the reference CosyVoiceFrontEnd
(reference: cosy_repo/cosyvoice/cli/frontend.py:173).  Text normalization and
tokenization are host-side; prompt feature extraction (24 kHz mel, whisper
128-mel, FSQ speech tokens, CAM++ x-vector) runs on device through the JAX
models.  The FSQ tokenizer and CAM++ ports (models/speech_tokenizer.py,
models/campplus.py) fill the roles of speech_tokenizer_v2.onnx and
campplus.onnx; until their weights are converted, precomputed prompt
artifacts can be passed directly.
"""

from __future__ import annotations

import io
import wave
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from cosyvoice2_eu_tpu.config import TTSConfig
from cosyvoice2_eu_tpu.frontend.text import text_normalize
from cosyvoice2_eu_tpu.frontend.tokenizer import get_tokenizer
from cosyvoice2_eu_tpu.runtime.model import PromptInputs


def load_wav(path: str, target_sr: int) -> np.ndarray:
    """Read a (PCM) wav file to mono float32 at target_sr (host-side)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return resample(data, sr, target_sr)


def resample(x: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    if sr == target_sr:
        return x
    from scipy.signal import resample_poly
    from math import gcd

    g = gcd(sr, target_sr)
    return resample_poly(x, target_sr // g, sr // g).astype(np.float32)


class Frontend:
    def __init__(
        self,
        cfg: TTSConfig,
        tokenizer=None,
        speech_tokenizer_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        spk_embedding_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        mel_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ):
        """speech_tokenizer_fn: 16 kHz wav -> (T_tok,) FSQ codes;
        spk_embedding_fn: 16 kHz wav -> (192,) x-vector;
        mel_fn: 24 kHz wav (1, T) -> (T_mel, 80) mel."""
        self.cfg = cfg
        self.tokenizer = tokenizer or get_tokenizer("")
        self.speech_tokenizer_fn = speech_tokenizer_fn
        self.spk_embedding_fn = spk_embedding_fn
        if mel_fn is None:
            import jax.numpy as jnp

            from cosyvoice2_eu_tpu.ops.mel import mel_spectrogram

            m = cfg.mel

            def mel_fn(wav_24k: np.ndarray) -> np.ndarray:
                mel = mel_spectrogram(
                    jnp.asarray(wav_24k[None]),
                    n_fft=m.n_fft, num_mels=m.num_mels, sampling_rate=m.sampling_rate,
                    hop_size=m.hop_size, win_size=m.win_size, fmin=m.fmin, fmax=m.fmax,
                    center=m.center,
                )
                return np.asarray(mel)[0].T  # (T_mel, 80)

        self.mel_fn = mel_fn
        # cached zero-shot speaker store (reference spk2info.pt, frontend.py:199)
        self.spk_info: dict[str, dict] = {}

    # -- text ---------------------------------------------------------------

    def normalize_text(self, text: str, split: bool = True, lang: str | None = None):
        return text_normalize(text, lambda s: len(self.tokenizer.encode(s)), split=split, lang=lang)

    def text_tokens(self, text: str) -> np.ndarray:
        return np.asarray(self.tokenizer.encode(text), np.int32)

    # -- prompt -------------------------------------------------------------

    def extract_prompt(
        self,
        prompt_wav_16k: np.ndarray,
        prompt_text: str = "",
        precomputed_speech_tokens: Optional[np.ndarray] = None,
        precomputed_embedding: Optional[np.ndarray] = None,
    ) -> dict:
        """Compute prompt-side artifacts (mirrors frontend_zero_shot,
        frontend.py:491: mel/token 2:1 alignment enforced)."""
        cfg = self.cfg
        max_samples = int(cfg.frontend.max_prompt_seconds * cfg.frontend.prompt_sr)
        assert len(prompt_wav_16k) <= max_samples, "prompt must be <= 30 s"

        wav_24k = resample(prompt_wav_16k, cfg.frontend.prompt_sr, cfg.frontend.target_sr)
        feat = self.mel_fn(wav_24k)  # (T_mel, 80)

        if precomputed_speech_tokens is not None:
            speech_tokens = np.asarray(precomputed_speech_tokens, np.int32)
        elif self.speech_tokenizer_fn is not None:
            speech_tokens = np.asarray(self.speech_tokenizer_fn(prompt_wav_16k), np.int32)
        else:
            raise ValueError("no speech tokenizer available; pass precomputed_speech_tokens")

        if precomputed_embedding is not None:
            embedding = np.asarray(precomputed_embedding, np.float32)
        elif self.spk_embedding_fn is not None:
            embedding = np.asarray(self.spk_embedding_fn(prompt_wav_16k), np.float32)
        else:
            raise ValueError("no speaker embedding model; pass precomputed_embedding")

        # enforce feat == 2 * tokens (frontend.py:498-502); the reference
        # gates this on resample_rate == 24000 — the v1 22.05 kHz config
        # carries token_mel_ratio == 0 meaning "no alignment trim"
        ratio = cfg.token_mel_ratio
        if ratio:
            token_len = min(feat.shape[0] // ratio, len(speech_tokens))
            feat = feat[: ratio * token_len]
            speech_tokens = speech_tokens[:token_len]
        return {
            "prompt_feat": feat.astype(np.float32),
            "speech_tokens": speech_tokens,
            "embedding": embedding,
            "prompt_text": prompt_text,
        }

    def frontend_zero_shot(self, text: str, prompt: dict) -> PromptInputs:
        """Zero-shot: prompt transcription conditions the LM."""
        return PromptInputs(
            text_tokens=self.text_tokens(text),
            prompt_text_tokens=self.text_tokens(prompt.get("prompt_text", "") or ""),
            llm_prompt_speech_tokens=prompt["speech_tokens"],
            flow_prompt_speech_tokens=prompt["speech_tokens"],
            prompt_feat=prompt["prompt_feat"],
            embedding=prompt["embedding"],
        )

    def frontend_cross_lingual(self, text: str, prompt: dict) -> PromptInputs:
        """Cross-lingual: drop prompt text AND the LM's prompt speech tokens
        (reference frontend.py:515-522); the flow keeps them for timbre."""
        return PromptInputs(
            text_tokens=self.text_tokens(text),
            prompt_text_tokens=np.zeros((0,), np.int32),
            llm_prompt_speech_tokens=np.zeros((0,), np.int32),
            flow_prompt_speech_tokens=prompt["speech_tokens"],
            prompt_feat=prompt["prompt_feat"],
            embedding=prompt["embedding"],
        )

    def frontend_instruct2(self, text: str, instruct_text: str, prompt: dict) -> PromptInputs:
        """Instruct2: instruction text + <|endofprompt|> as the prompt text
        (reference frontend.py frontend_instruct2)."""
        return PromptInputs(
            text_tokens=self.text_tokens(text),
            prompt_text_tokens=self.text_tokens(instruct_text + "<|endofprompt|>"),
            llm_prompt_speech_tokens=np.zeros((0,), np.int32),
            flow_prompt_speech_tokens=prompt["speech_tokens"],
            prompt_feat=prompt["prompt_feat"],
            embedding=prompt["embedding"],
        )

    # -- cached speakers (add_zero_shot_spk, cosyvoice.py:70) ----------------

    def add_zero_shot_spk(self, spk_id: str, prompt: dict) -> bool:
        self.spk_info[spk_id] = prompt
        return True

    def get_spk(self, spk_id: str) -> dict:
        return self.spk_info[spk_id]

    def save_spk_info(self, path: str) -> None:
        """Persist the speaker store (reference spk2info.pt, frontend.py:199)."""
        flat = {}
        for spk, art in self.spk_info.items():
            for k, v in art.items():
                if isinstance(v, np.ndarray):
                    flat[f"{spk}::{k}"] = v
                else:
                    flat[f"{spk}::{k}::str"] = np.asarray(str(v))
        np.savez(path, **flat)

    def load_spk_info(self, path: str) -> None:
        """Load a speaker store: our .npz format or the reference's
        spk2info.pt (torch dict of per-speaker artifact dicts,
        frontend.py:199-202)."""
        if path.endswith(".pt"):
            import torch

            data = torch.load(path, map_location="cpu", weights_only=False)
            for spk, art in data.items():
                out = {}
                for k, v in art.items():
                    arr = v.numpy() if hasattr(v, "numpy") else v
                    # reference keys -> our artifact names
                    key = {
                        "speech_feat": "prompt_feat",
                        "speech_token": "speech_tokens",
                        "llm_embedding": "embedding",
                        "flow_embedding": "embedding",
                    }.get(k, k)
                    if hasattr(arr, "squeeze") and getattr(arr, "ndim", 0) > 1 and key in (
                        "speech_tokens", "embedding",
                    ):
                        arr = arr.squeeze(0) if arr.shape[0] == 1 else arr
                    if key == "prompt_feat" and getattr(arr, "ndim", 0) == 3:
                        arr = arr[0]
                    out[key] = arr
                out.setdefault("prompt_text", "")
                self.spk_info[spk] = out
            return
        data = np.load(path, allow_pickle=False)
        for key in data.files:
            parts = key.split("::")
            spk, k = parts[0], parts[1]
            art = self.spk_info.setdefault(spk, {})
            art[k] = str(data[key]) if len(parts) == 3 else data[key]


def make_speech_tokenizer_fn(params, cfg=None):
    """16 kHz wav -> FSQ codes via the JAX tokenizer port
    (replaces the speech_tokenizer_v2.onnx session, frontend.py:262-274)."""
    import jax
    import jax.numpy as jnp

    from cosyvoice2_eu_tpu.models import speech_tokenizer as st
    from cosyvoice2_eu_tpu.ops.mel import whisper_log_mel

    cfg = cfg or st.SpeechTokenizerConfig()
    encode = jax.jit(lambda mel, n: st.encode(params, cfg, mel, n))

    def fn(wav_16k: np.ndarray) -> np.ndarray:
        assert len(wav_16k) <= 30 * 16000, "prompt must be <= 30 s"
        mel = whisper_log_mel(jnp.asarray(wav_16k[None]), n_mels=cfg.n_mels)
        ds = cfg.downsample
        t = mel.shape[-1] - mel.shape[-1] % ds  # downsample alignment
        codes, code_len = encode(mel[:, :, :t], jnp.asarray([t]))
        return np.asarray(codes)[0, : int(code_len[0])]

    return fn


def make_spk_embedding_fn(params, cfg=None):
    """16 kHz wav -> 192-d x-vector via the CAM++ port
    (replaces the campplus.onnx session, frontend.py:276-283)."""
    import jax
    import jax.numpy as jnp

    from cosyvoice2_eu_tpu.models import campplus as cam

    cfg = cfg or cam.CAMPPlusConfig()
    forward = jax.jit(lambda fb: cam.campplus_forward(params, cfg, fb))

    def fn(wav_16k: np.ndarray) -> np.ndarray:
        fbank = cam.kaldi_fbank_cmn(jnp.asarray(wav_16k[None]), cfg.feat_dim)
        return np.asarray(forward(fbank))[0]

    return fn
