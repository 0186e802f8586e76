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
