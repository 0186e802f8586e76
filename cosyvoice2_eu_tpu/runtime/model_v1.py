"""v1 (CosyVoice-300M family) inference orchestrator.

Reference: cosy_repo/cosyvoice/cli/model.py:29 (CosyVoiceModel) — the v1
token2wav pipeline differs from v2 (runtime/model.py) in three ways:
  * the flow is MaskedDiffWithXvec with a z/mu flow-cache pinned across
    chunks (models/flow_v1.py) instead of v2's KV-cached chunk protocol;
  * chunk boundaries are crossfaded in MEL space with a Hamming window
    (cli/model.py:157-158) before HiFT, in addition to the source-cache
    splice both share;
  * streaming consumes a growing token hop (min 2*fr, max 4*fr tokens,
    cli/model.py:205-226) with a 20-token overlap.

TPU-native shape: the LM decode is ONE jitted lax.while_loop over a static
KV cache (models/llm_v1.py), not a host thread appending to a list; flow
and HiFT programs are cached per chunk geometry (steady-state streaming
reuses a single compiled program per stage).  Streaming here generates
tokens first and then streams token2wav chunks — audio is chunk-for-chunk
identical to the reference scheduler; only time-to-first-audio differs
(the EU-path v2 orchestrator is the latency-optimized surface).
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice2_eu_tpu.config import TTSV1Config
from cosyvoice2_eu_tpu.models.flow_v1 import flow_v1_inference, mel_len_for_tokens
from cosyvoice2_eu_tpu.models.hift import hift_inference
from cosyvoice2_eu_tpu.models.llm_v1 import lm_v1_decode
from cosyvoice2_eu_tpu.runtime.model import bucket_for

HIFT_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096)
GEN_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def _fade_last_axis(fade_in: np.ndarray, fade_out: np.ndarray,
                    window: np.ndarray) -> np.ndarray:
    """Hamming crossfade over the trailing axis (utils/common.py:142)."""
    ov = window.shape[0] // 2
    out = fade_in.copy()
    out[..., :ov] = fade_in[..., :ov] * window[:ov] + fade_out[..., -ov:] * window[ov:]
    return out


class CosyVoice1Model:
    """llm.pt + flow.pt + hift.pt (v1) -> waveform, streaming or not.

    params: {"llm": ..., "flow": ..., "hift": ...} pytrees from
    runtime/checkpoint_v1.py converters (+ convert_hift for hift.pt).
    """

    def __init__(self, cfg: TTSV1Config, params: dict, seed: int = 0):
        self.cfg = cfg
        self.params = params
        self._rng = jax.random.key(seed)
        self.mel_window = np.hamming(2 * cfg.mel_overlap_len)
        self.speech_window = np.hamming(2 * cfg.source_cache_len)
        # per-INSTANCE jit cache keyed by static geometry: an lru_cache on
        # the bound methods would key on `self` in a class-level cache and
        # pin every discarded instance (and its param buffers) in memory
        self._fn_cache: dict = {}

    # -- jitted stage programs (cached per static geometry) ---------------

    def _cached(self, key, build):
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = self._fn_cache[key] = jax.jit(build())
        return fn

    def _lm_fn(self, tt_bucket: int, ts_bucket: int, max_gen: int,
               use_spk: bool = True):
        def build():
            def fn(params, text, text_len, prompt_text_len, prompt_sp,
                   prompt_sp_len, emb, rng):
                return lm_v1_decode(params, self.cfg.llm, text, text_len,
                                    prompt_text_len, prompt_sp, prompt_sp_len,
                                    emb, rng, max_gen, use_spk=use_spk)

            return fn

        return self._cached(("lm", tt_bucket, ts_bucket, max_gen, use_spk), build)

    def _flow_fn(self, t1: int, t2: int, mel1: int, cache_t: int):
        def build():
            def fn(params, token, prompt_token, prompt_feat, emb, rng, flow_cache):
                return flow_v1_inference(
                    params, self.cfg.flow, token, prompt_token, prompt_feat,
                    emb, rng, flow_cache=flow_cache if cache_t else None,
                )

            return fn

        return self._cached(("flow", t1, t2, mel1, cache_t), build)

    def _hift_fn(self, mel_bucket: int):
        def build():
            def fn(params, mel, rng, cache_source, cache_len):
                return hift_inference(params, self.cfg.hift, mel, rng,
                                      cache_source=cache_source,
                                      cache_len=cache_len)

            return fn

        return self._cached(("hift", mel_bucket), build)

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # -- stages ------------------------------------------------------------

    def lm_decode(self, text_tokens: np.ndarray, prompt_text_tokens: np.ndarray,
                  prompt_speech_tokens: np.ndarray,
                  embedding: Optional[np.ndarray],
                  max_gen: int = 0) -> np.ndarray:
        """Autoregressive speech tokens for prompt_text ++ text (llm.py:267).
        embedding=None drops the LM speaker slot (v1 instruct mode)."""
        cfg = self.cfg.llm
        use_spk = embedding is not None
        if embedding is None:
            embedding = np.zeros(cfg.spk_embed_dim, np.float32)
        text = np.concatenate([prompt_text_tokens, text_tokens]).astype(np.int32)
        tt, ts = len(text), len(prompt_speech_tokens)
        if not max_gen:
            max_gen = min(int(len(text_tokens) * cfg.max_token_text_ratio) + 1, 2048)
        # the compiled program is bucketed in max_gen (the true per-text cap is
        # enforced inside lm_v1_decode via max_token_text_ratio and below via
        # the host-side trim), so decode reuses one program per bucket triple
        gen_b = bucket_for(max_gen, buckets=GEN_BUCKETS)
        tt_b, ts_b = bucket_for(tt), bucket_for(max(ts, 1))
        text_arr = np.zeros((1, tt_b), np.int32)
        text_arr[0, :tt] = text
        sp_arr = np.zeros((1, ts_b), np.int32)
        sp_arr[0, :ts] = prompt_speech_tokens
        tokens, lengths = self._lm_fn(tt_b, ts_b, gen_b, use_spk)(
            self.params["llm"], jnp.asarray(text_arr), jnp.asarray([tt]),
            jnp.asarray([len(prompt_text_tokens)], jnp.int32),
            jnp.asarray(sp_arr), jnp.asarray([ts], jnp.int32),
            jnp.asarray(embedding[None], jnp.float32), self._next_rng(),
        )
        return np.asarray(tokens)[0, : min(int(lengths[0]), max_gen)]

    def token2wav(self, token: np.ndarray, prompt_token: np.ndarray,
                  prompt_feat: np.ndarray, embedding: np.ndarray,
                  session: dict, finalize: bool = False,
                  speed: float = 1.0) -> np.ndarray:
        """One flow+hift chunk (cli/model.py:145-185).  session carries
        flow_cache / mel_overlap / hift_cache between chunks."""
        cfg = self.cfg
        t1, t2 = len(prompt_token), len(token)
        mel1 = prompt_feat.shape[0]
        cache = session.get("flow_cache")
        cache_t = 0 if cache is None else cache.shape[2]
        flow_fn = self._flow_fn(t1, t2, mel1, cache_t)
        mel, new_cache = flow_fn(
            self.params["flow"],
            jnp.asarray(token[None].astype(np.int32)),
            jnp.asarray(prompt_token[None].astype(np.int32)),
            jnp.asarray(prompt_feat[None], jnp.float32),
            jnp.asarray(embedding[None], jnp.float32),
            self._next_rng(),
            jnp.zeros((1, cfg.flow.output_size, 0, 2), jnp.float32)
            if cache is None else jnp.asarray(cache),
        )
        tts_mel = np.asarray(mel, np.float32)  # (1, 80, mel_len2)
        session["flow_cache"] = np.asarray(new_cache, np.float32)

        # mel-space crossfade with the previous chunk tail (cli/model.py:157)
        overlap = session.get("mel_overlap")
        if overlap is not None and overlap.shape[2]:
            tts_mel = _fade_last_axis(tts_mel, overlap, self.mel_window)

        hift_cache = session.get("hift_cache")
        if hift_cache is not None:
            tts_mel = np.concatenate([hift_cache["mel"], tts_mel], axis=2)
            cache_source = hift_cache["source"]
        else:
            cache_source = np.zeros((1, 1, 0), np.float32)

        if not finalize:
            session["mel_overlap"] = tts_mel[:, :, -cfg.mel_overlap_len:]
            tts_mel = tts_mel[:, :, : -cfg.mel_overlap_len]
        elif speed != 1.0:
            if hift_cache is not None:
                raise ValueError("speed change only supports non-stream mode")
            T = tts_mel.shape[2]
            xq = np.linspace(0, T - 1, int(T / speed))
            xp = np.arange(T)
            tts_mel = np.stack(
                [np.stack([np.interp(xq, xp, row) for row in ch]) for ch in tts_mel]
            ).astype(np.float32)

        # hift on an edge-replicated mel bucket (static program per bucket)
        T_mel = tts_mel.shape[2]
        h_bucket = bucket_for(T_mel, buckets=HIFT_BUCKETS)
        mel_in = np.concatenate(
            [tts_mel, np.repeat(tts_mel[:, :, -1:], h_bucket - T_mel, axis=2)],
            axis=2,
        )
        c_len = cache_source.shape[2]
        cache_buf = np.zeros((1, 1, cfg.source_cache_len), np.float32)
        cache_buf[:, :, :c_len] = cache_source
        audio, source = self._hift_fn(h_bucket)(
            self.params["hift"], jnp.asarray(mel_in), self._next_rng(),
            jnp.asarray(cache_buf), jnp.asarray(c_len),
        )
        n = T_mel * cfg.hift.upsample_scale
        audio = np.asarray(audio, np.float32)[0, :n]
        source = np.asarray(source, np.float32)[:, :, :n]

        if not finalize:
            if hift_cache is not None:
                audio = _fade_last_axis(audio, hift_cache["speech"], self.speech_window)
            session["hift_cache"] = {
                "mel": tts_mel[:, :, -cfg.mel_cache_len:],
                "source": source[:, :, -cfg.source_cache_len:],
                "speech": audio[-cfg.source_cache_len:],
            }
            audio = audio[: -cfg.source_cache_len]
        elif hift_cache is not None:
            audio = _fade_last_axis(audio, hift_cache["speech"], self.speech_window)
        return audio

    # -- public API ----------------------------------------------------------

    def _chunks(self, speech_tokens: np.ndarray, prompt_token: np.ndarray,
                prompt_feat: np.ndarray, embedding: np.ndarray,
                speed: float) -> Iterator[np.ndarray]:
        """The reference streaming scheduler (cli/model.py:205-226): growing
        hop, 20-token lookahead overlap, one finalize tail."""
        cfg = self.cfg
        session: dict = {}
        hop = cfg.token_min_hop_len
        pos = 0
        remaining = len(speech_tokens)
        while remaining - pos >= hop + cfg.token_overlap_len:
            chunk = speech_tokens[pos: pos + hop + cfg.token_overlap_len]
            yield self.token2wav(chunk, prompt_token, prompt_feat, embedding,
                                 session, finalize=False)
            pos += hop
            hop = min(cfg.token_max_hop_len, int(hop * cfg.stream_scale_factor))
        yield self.token2wav(speech_tokens[pos:], prompt_token, prompt_feat,
                             embedding, session, finalize=True, speed=speed)

    def tts(self, text_tokens: np.ndarray,
            prompt_text_tokens: np.ndarray,
            prompt_speech_tokens: np.ndarray,
            prompt_feat: np.ndarray,
            embedding: np.ndarray,
            stream: bool = False,
            speed: float = 1.0,
            max_gen: int = 0,
            *,
            llm_prompt_speech_tokens: Optional[np.ndarray] = None,
            llm_embedding="shared"):
        """cli/model.py:186 CosyVoiceModel.tts.  Returns an iterator of
        waveform chunks (one element when stream=False).

        Mode plumbing mirrors the reference model_input dicts:
        ``llm_prompt_speech_tokens`` overrides the LM-side prompt tokens
        (cross-lingual passes an empty array while the flow keeps them,
        frontend.py:520); ``llm_embedding`` is the LM speaker embedding —
        the default "shared" reuses ``embedding``, ``None`` drops the spk
        slot entirely (instruct mode, frontend.py:527)."""
        lm_emb = embedding if isinstance(llm_embedding, str) else llm_embedding
        lm_prompt = (prompt_speech_tokens if llm_prompt_speech_tokens is None
                     else llm_prompt_speech_tokens)
        speech_tokens = self.lm_decode(text_tokens, prompt_text_tokens,
                                       lm_prompt, lm_emb, max_gen)

        def gen():
            if stream:
                yield from self._chunks(speech_tokens, prompt_speech_tokens,
                                        prompt_feat, embedding, speed)
            else:
                yield self.token2wav(speech_tokens, prompt_speech_tokens,
                                     prompt_feat, embedding, {},
                                     finalize=True, speed=speed)

        return gen()

    def vc(self, source_speech_tokens: np.ndarray,
           prompt_speech_tokens: np.ndarray, prompt_feat: np.ndarray,
           embedding: np.ndarray, stream: bool = False, speed: float = 1.0):
        """Voice conversion: source tokens straight to token2wav
        (cli/model.py:141 vc_job)."""

        def gen():
            if stream:
                yield from self._chunks(source_speech_tokens,
                                        prompt_speech_tokens, prompt_feat,
                                        embedding, speed)
            else:
                yield self.token2wav(source_speech_tokens, prompt_speech_tokens,
                                     prompt_feat, embedding, {},
                                     finalize=True, speed=speed)

        return gen()
