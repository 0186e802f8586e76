"""Reference-compatible API shim.

Exposes a ``CosyVoice2`` class with the reference's constructor signature and
``inference_*`` generator methods (reference: cosy_repo/cosyvoice/cli/
cosyvoice.py:142-294) so the reference evaluation pipeline
(evaluation/cosyvoice_synthesizer.py:65-77 calls
``CosyVoice2(model_dir, setting=..., final=..., ...)`` then
``inference_cross_lingual(text, prompt_wav, stream=..., speed=...)``)
runs unchanged against the TPU backend.

Outputs are dicts {'tts_speech': torch.Tensor (1, T)} like the reference —
torch CPU tensors so downstream torchaudio-style consumers work.
"""

from __future__ import annotations

import logging
import time
from typing import Generator, Optional

import numpy as np

import cosyvoice2_eu_tpu as cosy


class CosyVoice2:
    def __init__(
        self,
        model_dir: str,
        load_jit: bool = False,
        load_trt: bool = False,
        load_vllm: bool = False,
        fp16: bool = False,
        setting: str = "llm_flow_hifigan",
        llm_run_id: Optional[str] = None,
        flow_run_id: Optional[str] = None,
        hifigan_run_id: Optional[str] = None,
        final: bool = True,
        backbone: str = "blanken",
        **_: dict,
    ):
        # jit/trt/vllm flags are GPU-engine options in the reference; the TPU
        # backend always runs XLA-compiled — accepted and ignored.
        self._api = cosy.load(
            model_dir=model_dir,
            setting=setting,
            llm_run_id=llm_run_id,
            flow_run_id=flow_run_id,
            hifigan_run_id=hifigan_run_id,
            final=final,
            backbone=backbone,
        )
        self.sample_rate = self._api.sample_rate
        self.frontend = self._api._frontend
        self.model_dir = model_dir

    def save_spkinfo(self):
        """Persist cached zero-shot speakers next to the checkpoints
        (reference cli/cosyvoice.py:78-79, inherited by CosyVoice2)."""
        import os

        if not self.model_dir:
            raise ValueError(
                "save_spkinfo() needs a model_dir to write spk2info.npz to; "
                "call frontend.save_spk_info(path) with an explicit path"
            )
        self.frontend.save_spk_info(os.path.join(self.model_dir, "spk2info.npz"))

    # -- helpers -------------------------------------------------------------

    def _as_numpy_prompt(self, prompt_speech_16k):
        if hasattr(prompt_speech_16k, "numpy"):  # torch tensor
            arr = prompt_speech_16k.numpy()
        else:
            arr = np.asarray(prompt_speech_16k)
        return arr.reshape(-1).astype(np.float32)

    def _run(self, mode, tts_text, prompt, prompt_text="", stream=False, speed=1.0,
             text_frontend=True):
        start = time.time()
        gen = (
            self._api.stream(tts_text, prompt, prompt_text=prompt_text, speed=speed,
                             text_frontend=text_frontend, mode=mode)
            if stream
            else iter(
                [self._api.tts(tts_text, prompt, prompt_text=prompt_text, speed=speed,
                               text_frontend=text_frontend, mode=mode)[0]]
            )
        )
        import torch

        for chunk in gen:
            speech_len = chunk.shape[1] / self.sample_rate
            logging.info(
                "yield speech len %s, rtf %s", speech_len, (time.time() - start) / max(speech_len, 1e-6)
            )
            yield {"tts_speech": torch.from_numpy(np.asarray(chunk))}
            start = time.time()

    # -- reference API -------------------------------------------------------

    def list_available_spks(self):
        return list(self.frontend.spk_info)

    def add_zero_shot_spk(self, prompt_text, prompt_speech_16k, zero_shot_spk_id) -> bool:
        prompt = self._as_numpy_prompt(prompt_speech_16k)
        return self._api.add_zero_shot_spk(prompt_text, prompt, zero_shot_spk_id)

    def inference_zero_shot(self, tts_text, prompt_text, prompt_speech_16k,
                            zero_shot_spk_id="", stream=False, speed=1.0,
                            text_frontend=True) -> Generator[dict, None, None]:
        # the reference normalizes the prompt transcription before it reaches
        # the LM prompt tokens (cli/cosyvoice.py:93, split=False), gated on
        # text_frontend like the synthesis text
        if text_frontend:
            prompt_text = self.frontend.normalize_text(prompt_text, split=False)
        prompt = (
            self.frontend.get_spk(zero_shot_spk_id)
            if zero_shot_spk_id
            else self._as_numpy_prompt(prompt_speech_16k)
        )
        yield from self._run("zero_shot", tts_text, prompt, prompt_text, stream, speed,
                             text_frontend)

    def inference_cross_lingual(self, tts_text, prompt_speech_16k, zero_shot_spk_id="",
                                stream=False, speed=1.0, text_frontend=True):
        prompt = (
            self.frontend.get_spk(zero_shot_spk_id)
            if zero_shot_spk_id
            else self._as_numpy_prompt(prompt_speech_16k)
        )
        yield from self._run("cross_lingual", tts_text, prompt, "", stream, speed,
                             text_frontend)

    def inference_instruct2(self, tts_text, instruct_text, prompt_speech_16k,
                            zero_shot_spk_id="", stream=False, speed=1.0,
                            text_frontend=True):
        prompt_art = self._api._prepare(self._as_numpy_prompt(prompt_speech_16k))
        segments = (
            self.frontend.normalize_text(tts_text, split=True)
            if text_frontend
            else [tts_text]
        )
        import torch

        for seg in segments:
            inputs = self.frontend.frontend_instruct2(seg, instruct_text, prompt_art)
            for chunk in self._api._model.tts(inputs, stream=stream, speed=speed):
                yield {"tts_speech": torch.from_numpy(np.asarray(chunk))[None]}

    def inference_sft(self, tts_text, spk_id, stream=False, speed=1.0, text_frontend=True):
        prompt = self.frontend.get_spk(spk_id)
        yield from self._run("zero_shot", tts_text, prompt,
                             prompt.get("prompt_text", ""), stream, speed, text_frontend)

    def inference_instruct(self, *args, **kwargs):
        raise NotImplementedError("inference_instruct is not implemented for CosyVoice2!")


class CosyVoice:
    """v1 (CosyVoice-300M family) reference-compatible surface.

    Mirrors cli/cosyvoice.py:27-141: constructor flags, spk2info store,
    and the five generator methods.  jit/trt/fp16 are GPU-engine knobs in
    the reference and are accepted-and-ignored (XLA always compiles).
    ``config=``/``params=``/``seed=`` extend the surface for injected tiny
    configs and bring-your-own-weights, like ``load()`` does for v2.
    """

    def __init__(
        self,
        model_dir: Optional[str] = None,
        load_jit: bool = False,
        load_trt: bool = False,
        fp16: bool = False,
        trt_concurrent: int = 1,
        config=None,
        params=None,
        seed: int = 0,
    ):
        # reference: instruct capability keyed off the model-dir name
        # (cli/cosyvoice.py:30)
        self.instruct = "-Instruct" in (model_dir or "")
        self.model_dir = model_dir
        self.model, self.frontend, self._cfg = cosy.load_v1(
            model_dir=model_dir, config=config, params=params, seed=seed
        )
        self.sample_rate = self._cfg.sample_rate

    # -- helpers -------------------------------------------------------------

    def _extract(self, prompt_speech_16k, prompt_text: str = "") -> dict:
        wav = _as_numpy_wav(prompt_speech_16k)
        return self.frontend.extract_prompt(wav, prompt_text)

    def _segments(self, tts_text: str, text_frontend: bool):
        return (
            self.frontend.normalize_text(tts_text, split=True)
            if text_frontend
            else [tts_text]
        )

    def _emit(self, gen):
        import torch

        start = time.time()
        for chunk in gen:
            speech_len = chunk.shape[0] / self.sample_rate
            logging.info(
                "yield speech len %s, rtf %s",
                speech_len, (time.time() - start) / max(speech_len, 1e-6),
            )
            yield {"tts_speech": torch.from_numpy(np.asarray(chunk))[None]}
            start = time.time()

    def _empty_prompt(self):
        mels = self._cfg.flow.output_size
        return (np.zeros((0,), np.int32), np.zeros((0, mels), np.float32))

    # -- reference API ---------------------------------------------------------

    def list_available_spks(self):
        return list(self.frontend.spk_info)

    def add_zero_shot_spk(self, prompt_text, prompt_speech_16k, zero_shot_spk_id) -> bool:
        assert zero_shot_spk_id != "", "do not use empty zero_shot_spk_id"
        art = self._extract(prompt_speech_16k, prompt_text)
        return self.frontend.add_zero_shot_spk(zero_shot_spk_id, art)

    def save_spkinfo(self):
        import os

        if not self.model_dir:
            raise ValueError(
                "save_spkinfo() needs a model_dir to write spk2info.npz to; "
                "this instance was built from config=/params= without one — "
                "call frontend.save_spk_info(path) with an explicit path"
            )
        self.frontend.save_spk_info(os.path.join(self.model_dir, "spk2info.npz"))

    def inference_sft(self, tts_text, spk_id, stream=False, speed=1.0,
                      text_frontend=True):
        """SFT: speaker embedding only — no prompt text/tokens/feats
        (frontend.py:485 frontend_sft)."""
        art = self.frontend.get_spk(spk_id)
        empty_tok, empty_feat = self._empty_prompt()
        for seg in self._segments(tts_text, text_frontend):
            yield from self._emit(self.model.tts(
                self.frontend.text_tokens(seg), empty_tok, empty_tok,
                empty_feat, np.asarray(art["embedding"], np.float32),
                stream=stream, speed=speed,
            ))

    def inference_zero_shot(self, tts_text, prompt_text, prompt_speech_16k,
                            zero_shot_spk_id="", stream=False, speed=1.0,
                            text_frontend=True):
        # reference normalizes the prompt transcription too
        # (cli/cosyvoice.py:93, split=False), gated on text_frontend
        if text_frontend:
            prompt_text = self.frontend.normalize_text(prompt_text, split=False)
        art = (
            self.frontend.get_spk(zero_shot_spk_id)
            if zero_shot_spk_id
            else self._extract(prompt_speech_16k, prompt_text)
        )
        ptext = art.get("prompt_text", prompt_text) or ""
        for seg in self._segments(tts_text, text_frontend):
            if len(seg) < 0.5 * len(ptext):
                logging.warning(
                    "synthesis text %s too short than prompt text %s, "
                    "this may lead to bad performance", seg, ptext,
                )
            yield from self._emit(self.model.tts(
                self.frontend.text_tokens(seg),
                self.frontend.text_tokens(ptext),
                np.asarray(art["speech_tokens"], np.int32),
                np.asarray(art["prompt_feat"], np.float32),
                np.asarray(art["embedding"], np.float32),
                stream=stream, speed=speed,
            ))

    def inference_cross_lingual(self, tts_text, prompt_speech_16k,
                                zero_shot_spk_id="", stream=False, speed=1.0,
                                text_frontend=True):
        """Cross-lingual: LM sees neither prompt text nor prompt speech
        tokens (frontend.py:515-522); the flow keeps them for timbre."""
        art = (
            self.frontend.get_spk(zero_shot_spk_id)
            if zero_shot_spk_id
            else self._extract(prompt_speech_16k)
        )
        empty_tok, _ = self._empty_prompt()
        for seg in self._segments(tts_text, text_frontend):
            yield from self._emit(self.model.tts(
                self.frontend.text_tokens(seg), empty_tok,
                np.asarray(art["speech_tokens"], np.int32),
                np.asarray(art["prompt_feat"], np.float32),
                np.asarray(art["embedding"], np.float32),
                stream=stream, speed=speed,
                llm_prompt_speech_tokens=empty_tok,
            ))

    def inference_instruct(self, tts_text, spk_id, instruct_text, stream=False,
                           speed=1.0, text_frontend=True):
        """v1 instruct: instruct text becomes the prompt text, the LM spk
        slot is dropped (frontend.py:524-531 deletes llm_embedding)."""
        if self.instruct is False:
            raise ValueError(
                f"{self.model_dir} do not support instruct inference"
            )
        art = self.frontend.get_spk(spk_id)
        instruct_norm = (
            self.frontend.normalize_text(instruct_text, split=False)
            if text_frontend else instruct_text
        )
        if isinstance(instruct_norm, list):
            instruct_norm = " ".join(instruct_norm)
        ptext_tokens = self.frontend.text_tokens(instruct_norm + "<endofprompt>")
        empty_tok, empty_feat = self._empty_prompt()
        for seg in self._segments(tts_text, text_frontend):
            yield from self._emit(self.model.tts(
                self.frontend.text_tokens(seg), ptext_tokens, empty_tok,
                empty_feat, np.asarray(art["embedding"], np.float32),
                stream=stream, speed=speed, llm_embedding=None,
            ))

    def inference_vc(self, source_speech_16k, prompt_speech_16k, stream=False,
                     speed=1.0):
        """Voice conversion: source speech tokens straight to token2wav
        (cli/cosyvoice.py:133, frontend.py:539)."""
        if self.frontend.speech_tokenizer_fn is None:
            raise ValueError(
                "vc needs the speech tokenizer (speech_tokenizer_v1.onnx in "
                "model_dir) to tokenize the source audio"
            )
        art = self._extract(prompt_speech_16k)
        source_tokens = np.asarray(
            self.frontend.speech_tokenizer_fn(_as_numpy_wav(source_speech_16k)),
            np.int32,
        )
        yield from self._emit(self.model.vc(
            source_tokens,
            np.asarray(art["speech_tokens"], np.int32),
            np.asarray(art["prompt_feat"], np.float32),
            np.asarray(art["embedding"], np.float32),
            stream=stream, speed=speed,
        ))


def _as_numpy_wav(x) -> np.ndarray:
    if hasattr(x, "numpy"):  # torch tensor
        x = x.numpy()
    return np.asarray(x).reshape(-1).astype(np.float32)
