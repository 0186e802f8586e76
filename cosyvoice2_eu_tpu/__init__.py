"""cosyvoice2_eu_tpu — TPU-native (JAX/XLA/Pallas) CosyVoice2-EU framework.

Public API mirrors the reference PyPI package
(reference: standalone_infer/src/cosyvoice2_eu/__init__.py:33-129):

    import cosyvoice2_eu_tpu as cosy
    model = cosy.load(model_dir=...)            # reference .pt checkpoints
    wav, sr = model.tts("Bonjour !", "prompt.wav")
    for chunk in model.stream("Bonjour !", "prompt.wav"):
        ...
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

from cosyvoice2_eu_tpu.config import TTSConfig

__version__ = "0.1.0"
__all__ = ["load", "Cosy2EU", "TTSConfig", "resolve_checkpoint_files", "__version__"]


def resolve_checkpoint_files(
    model_dir: str,
    setting: str = "llm_flow_hifigan",
    llm_run_id: Optional[str] = None,
    flow_run_id: Optional[str] = None,
    hifigan_run_id: Optional[str] = None,
    final: bool = True,
) -> dict:
    """Checkpoint-selection matrix: setting x run_id x final -> file paths.

    Reproduces cosy_repo/cosyvoice/cli/cosyvoice.py:239-268 semantics:
    ``final`` loads {llm,flow,hift}.pt; otherwise components named in
    ``setting`` with a run_id load ``{key}-{run_id}.pt`` and the rest load
    ``{key}-original.pt``.

    Beyond the reference: when the ``.pt`` file is absent but a native
    checkpoint directory of the same stem exists (orbax pytree written by
    ``tools/extract_for_inference.py`` from this framework's own training
    runs), that directory is resolved instead — the train->serve loop closes
    without ever round-tripping through torch.
    """
    if final:
        tokens = {"llm", "flow", "hifigan"}
    elif setting == "original":
        tokens = set()
    else:
        tokens = set(setting.split("_"))
        allowed = {"llm", "flow", "hifigan"}
        if tokens - allowed:
            raise ValueError(
                'setting must be "original" or underscore-joined subset of '
                f'{{llm,flow,hifigan}}, got {setting!r}'
            )
    chosen = {}
    for key, run_id in (("llm", llm_run_id), ("flow", flow_run_id), ("hift", hifigan_run_id)):
        token = "hifigan" if key == "hift" else key
        if final or (token in tokens and run_id is not None):
            suffix = "" if final else f"-{run_id}"
        else:
            suffix = "-original"
        path = os.path.join(model_dir, f"{key}{suffix}.pt")
        if not os.path.exists(path) and os.path.isdir(path[: -len(".pt")]):
            path = path[: -len(".pt")]  # native checkpoint dir
        chosen[key] = path
    return chosen


class Cosy2EU:
    """High-level inference wrapper (tts / stream / modes)."""

    def __init__(self, model, frontend, cfg: TTSConfig):
        self._model = model
        self._frontend = frontend
        self._cfg = cfg
        self._prompt_cache: dict = {}

    @property
    def sample_rate(self) -> int:
        return self._cfg.sample_rate

    def _prepare(self, prompt, prompt_text: str = "", **precomputed):
        if isinstance(prompt, str):
            key = (prompt, prompt_text)
            if key not in self._prompt_cache:
                from cosyvoice2_eu_tpu.frontend.frontend import load_wav

                wav = load_wav(prompt, self._cfg.frontend.prompt_sr)
                self._prompt_cache[key] = self._frontend.extract_prompt(
                    wav, prompt_text, **precomputed
                )
            return self._prompt_cache[key]
        if isinstance(prompt, dict):
            missing = {"prompt_feat", "speech_tokens", "embedding"} - prompt.keys()
            if missing:
                raise ValueError(
                    f"prompt dict is missing {sorted(missing)}; expected the "
                    "artifact keys prompt_feat, speech_tokens, embedding "
                    "(and optionally prompt_text) as produced by "
                    "Frontend.extract_prompt"
                )
            return prompt
        return self._frontend.extract_prompt(np.asarray(prompt), prompt_text, **precomputed)

    def tts(
        self,
        text: str,
        prompt,
        *,
        prompt_text: str = "",
        speed: float = 1.0,
        text_frontend: bool = False,
        mode: str = "cross_lingual",
        instruct_text: str = "",
        **precomputed,
    ) -> Tuple[np.ndarray, int]:
        """Synthesize; returns (waveform (1, T) float32, sample_rate)."""
        chunks = list(
            self._generate(text, prompt, prompt_text, False, speed, text_frontend, mode,
                           instruct_text=instruct_text, **precomputed)
        )
        return np.concatenate(chunks)[None], self.sample_rate

    def stream(
        self,
        text: str,
        prompt,
        *,
        prompt_text: str = "",
        speed: float = 1.0,
        text_frontend: bool = False,
        mode: str = "cross_lingual",
        instruct_text: str = "",
        **precomputed,
    ) -> Iterator[np.ndarray]:
        """Yield waveform chunks (1, t) for streaming playback."""
        for chunk in self._generate(
            text, prompt, prompt_text, True, speed, text_frontend, mode,
            instruct_text=instruct_text, **precomputed
        ):
            yield chunk[None]

    def _generate(self, text, prompt, prompt_text, stream, speed, text_frontend, mode,
                  instruct_text: str = "", **precomputed):
        prompt_art = self._prepare(prompt, prompt_text, **precomputed)
        segments = (
            self._frontend.normalize_text(text, split=True) if text_frontend else [text]
        )
        if mode == "instruct2":
            build = lambda seg, art: self._frontend.frontend_instruct2(
                seg, instruct_text, art
            )
        else:
            build = {
                "zero_shot": self._frontend.frontend_zero_shot,
                "cross_lingual": self._frontend.frontend_cross_lingual,
            }[mode]
        for seg in segments:
            inputs = build(seg, prompt_art)
            yield from self._model.tts(inputs, stream=stream, speed=speed)

    def add_zero_shot_spk(self, prompt_text: str, prompt, spk_id: str) -> bool:
        art = self._prepare(prompt, prompt_text)
        return self._frontend.add_zero_shot_spk(spk_id, art)

    def warmup(self, stream: bool = True, prompt_seconds: float = 6.0) -> float:
        """Compile the standard shape buckets before serving traffic.

        Runs one short synthesis (non-streaming, and streaming when asked)
        over a synthetic prompt so every stage program lands in the
        persistent compile cache; returns wall seconds spent."""
        import time

        import numpy as np

        rng = np.random.default_rng(0)
        n_sp = int(prompt_seconds * self._cfg.flow.input_frame_rate)
        prompt = {
            "prompt_feat": (rng.standard_normal(
                (n_sp * self._cfg.token_mel_ratio, self._cfg.flow.output_size)
            ) * 0.5 - 4.0).astype(np.float32),
            "speech_tokens": rng.integers(
                0, self._cfg.llm.speech_token_size, n_sp
            ).astype(np.int32),
            "embedding": rng.standard_normal(
                self._cfg.frontend.spk_embed_dim
            ).astype(np.float32),
            "prompt_text": "",
        }
        t0 = time.time()
        self.tts("Bonjour, ceci est un échauffement du serveur.", prompt)
        if stream:
            # twice: pass 1 takes the hybrid cold path (and primes the
            # prompt), pass 2 compiles the fused warm-path first emission
            for _ in self.stream("Hallo, dies ist ein Aufwärmen.", prompt):
                pass
            for _ in self.stream("Hallo, dies ist ein Aufwärmen.", prompt):
                pass
        self._model._primed_cache.clear()  # drop the synthetic prompt's state
        return time.time() - t0

    def stream_text(
        self,
        text_iter,
        prompt,
        *,
        prompt_text: str = "",
        speed: float = 1.0,
        **precomputed,
    ) -> Iterator[np.ndarray]:
        """Streaming TEXT input -> streaming audio output.

        Consumes text pieces as they arrive (e.g. from an upstream LLM) and
        yields waveform chunks; drives the LM's bistream fill-token protocol
        (the reference's streaming-text mode, llm/llm.py:721-834)."""
        prompt_art = self._prepare(prompt, prompt_text, **precomputed)
        inputs = self._frontend.frontend_zero_shot("", prompt_art)

        def chunks():
            for piece in text_iter:
                toks = self._frontend.text_tokens(piece)
                if len(toks):
                    yield toks

        for chunk in self._model.tts_stream_text(chunks(), inputs, speed=speed):
            yield chunk[None]


def resolve_backbone(backbone: Optional[str], model_dir: Optional[str]):
    """Parse the reference's --backbone surface (cosyvoice.py:183-224).

    Returns (backbone_config | None, tokenizer_dir | None, use_bistream):
    blanken/None keep the default Qwen2-0.5B BlankEN backbone (unistream);
    'hf:<id-or-path>' / 'local:<path>' / a bare path select an alternative HF
    backbone — the LM then decodes through the bistream fill-token protocol
    exactly as the reference routes non-BlankEN backbones (llm.py:575-609).
    """
    if backbone in (None, "blanken"):
        return None, None, False
    path = backbone.split(":", 1)[1] if backbone.startswith(("hf:", "local:")) else backbone
    cfg_json = os.path.join(path, "config.json")
    if os.path.exists(cfg_json):
        import json

        from cosyvoice2_eu_tpu.config import Qwen2Config

        with open(cfg_json) as f:
            hf = json.load(f)
        heads = hf.get("num_attention_heads", 14)
        bb = Qwen2Config(
            vocab_size=hf.get("vocab_size", 151936),
            hidden_size=hf.get("hidden_size", 896),
            intermediate_size=hf.get("intermediate_size", 4864),
            num_layers=hf.get("num_hidden_layers", 24),
            num_heads=heads,
            num_kv_heads=hf.get("num_key_value_heads", heads),
            head_dim=hf.get("head_dim", hf.get("hidden_size", 896) // heads),
            rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
            rope_theta=hf.get("rope_theta", 1_000_000.0),
            use_qk_norm=hf.get("model_type", "qwen2") == "qwen3",
            attention_bias=hf.get(
                "attention_bias", hf.get("model_type", "qwen2") == "qwen2"
            ),
        )
        return bb, path, True
    if "qwen3" in path.lower().replace("-", "").replace("_", ""):
        from cosyvoice2_eu_tpu.config import qwen3_0_6b_config

        # well-known config for the reference's hf:Qwen/Qwen3-0.6B option
        # (no egress in this environment to fetch config.json)
        return qwen3_0_6b_config(), None, True
    raise ValueError(
        f"cannot resolve backbone {backbone!r}: no config.json at {path} "
        "(zero-egress environment needs a local checkout)"
    )


def _snapshot_download(repo_id: str, required: bool = False) -> Optional[str]:
    """HF snapshot into ~/.cache/cosyvoice2-eu (reference standalone
    __init__.py:96-129).  Returns the local dir, or None when the hub client
    or network is unavailable and the download was only opportunistic."""
    target = os.path.expanduser(
        os.environ.get("COSY2EU_CACHE", "~/.cache/cosyvoice2-eu")
    )
    try:
        from huggingface_hub import snapshot_download  # type: ignore
    except ImportError:
        if required:
            raise ImportError(
                "load(download=True) needs huggingface_hub; pass model_dir= "
                "with a local checkout instead"
            )
        return None
    try:
        snapshot_download(repo_id=repo_id, local_dir=target, etag_timeout=10)
        return target
    except Exception:
        if required:
            raise
        # opportunistic path (no network / partial cache): a previously
        # downloaded snapshot still works offline
        if os.path.exists(os.path.join(target, "llm.pt")) or os.path.isdir(
            os.path.join(target, "original")
        ):
            return target
        import logging

        logging.getLogger(__name__).warning(
            "snapshot_download(%s) failed and no cached copy at %s; "
            "building a random-initialized model (pass model_dir= for real "
            "weights)", repo_id, target,
        )
        return None


def load(
    *,
    model_dir: Optional[str] = None,
    repo_id: str = "hi-paris/CosyVoice2-0.5B-EU",
    download: Optional[bool] = None,
    setting: str = "llm_flow_hifigan",
    llm_run_id: Optional[str] = None,
    flow_run_id: Optional[str] = None,
    hifigan_run_id: Optional[str] = None,
    final: Optional[bool] = None,
    config: Optional[TTSConfig] = None,
    backbone: Optional[str] = None,
    seed: int = 0,
    compute_dtype="bfloat16",
    lm_quant: Optional[str] = None,
    params: Optional[dict] = None,
    tp: int = 0,
) -> Cosy2EU:
    """Load the model once and reuse for multiple in-memory calls.

    Published install-and-run contract (reference standalone
    __init__.py:96-129): with no model_dir and no config, the HF snapshot
    ``repo_id`` is downloaded to ``~/.cache/cosyvoice2-eu`` (requires
    ``huggingface_hub`` + network; ``download=False`` skips, a path in
    ``model_dir`` skips).  model_dir must contain the reference checkpoints
    (llm.pt/flow.pt/hift.pt naming matrix) plus the Qwen tokenizer files.
    With config= and no model_dir a random-initialized model is built
    (smoke tests / benchmarking shapes).  backbone selects the LM backbone
    (blanken | hf:<id> | local:<path>), mirroring the reference CLI
    (standalone_infer cli.py:64).  tp=N shards the LM weights
    tensor-parallel over the first N devices for multi-chip serving
    (parallel/tp.py).  params= injects an already-converted
    {"llm","flow","hift"} pytree (host numpy or device arrays) directly —
    the bring-your-own-weights path (e.g. loaded from a pickle/orbax dump);
    it skips both checkpoint conversion and random init.
    """
    import dataclasses

    import jax

    from cosyvoice2_eu_tpu.frontend.frontend import Frontend
    from cosyvoice2_eu_tpu.frontend.tokenizer import get_tokenizer
    from cosyvoice2_eu_tpu.runtime.model import TTSModel

    if (model_dir is None and config is None and params is None
            and download is not False):
        model_dir = _snapshot_download(repo_id, required=download is True)

    if model_dir is not None and os.path.isdir(os.path.join(model_dir, "aot_store")):
        # shipped AOT executable store (cosy2-eu warmup --export-store):
        # first audio on a fresh machine without tracing/compiling
        from cosyvoice2_eu_tpu.runtime import aot_cache

        aot_cache.set_cache_dir(os.path.join(model_dir, "aot_store"))

    # persistent XLA compile cache: a warm cache cuts the cold-start compile
    # from minutes to seconds across processes (the role TRT/JIT artifacts
    # play in the reference, cli/model.py:100-116,285-287).
    # COSY_COMPILE_CACHE=none keeps it OFF even when the current value is
    # None (the CPU test suite relies on this: XLA:CPU executable
    # (de)serialization is brittle — see tests/conftest.py).  The CPU
    # backend is also skipped by default: XLA:CPU AOT entries embed host
    # CPU-feature profiles and mis-load even on the same machine; set
    # COSY_COMPILE_CACHE explicitly to force it on anyway.
    cache_dir = os.environ.get("COSY_COMPILE_CACHE", "")
    if not cache_dir and jax.default_backend() != "cpu":
        cache_dir = "/tmp/jax_cache_cosyvoice2_eu_tpu"
    if jax.config.jax_compilation_cache_dir is None and \
            cache_dir.lower() not in ("none", "off", "0", ""):
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    cfg = config or TTSConfig()
    bb_cfg, bb_tokenizer_dir, use_bistream = resolve_backbone(backbone, model_dir)
    if bb_cfg is not None:
        cfg = dataclasses.replace(cfg, llm=dataclasses.replace(cfg.llm, backbone=bb_cfg))
    if bb_tokenizer_dir is not None and not any(
        os.path.exists(os.path.join(bb_tokenizer_dir, f))
        for f in ("tokenizer.json", "vocab.json")
    ):
        bb_tokenizer_dir = None  # backbone checkout without tokenizer files
    if params is not None:
        # bring-your-own-weights: device_put is a pure transfer (no per-array
        # compile dispatch), which keeps fresh-cache cold starts fast
        params = jax.device_put(params)
        tokenizer = get_tokenizer(bb_tokenizer_dir or (model_dir or ""))
    elif model_dir is not None:
        from cosyvoice2_eu_tpu.runtime.checkpoint import (
            convert_flow,
            convert_hift,
            convert_llm,
            load_torch_state,
        )

        files = resolve_checkpoint_files(
            model_dir, setting, llm_run_id, flow_run_id, hifigan_run_id,
            final=(True if final is None else final),
        )

        def _component(key, convert, sub_cfg):
            path = files[key]
            if os.path.isdir(path):  # native pytree (already in our layout)
                from cosyvoice2_eu_tpu.runtime.checkpoint import load_pytree

                return load_pytree(path)
            return convert(load_torch_state(path), sub_cfg)

        params = {
            "llm": _component("llm", convert_llm, cfg.llm),
            "flow": _component("flow", convert_flow, cfg.flow),
            "hift": _component("hift", convert_hift, cfg.hift),
        }
        tokenizer = get_tokenizer(bb_tokenizer_dir or model_dir)
    else:
        import jax

        from cosyvoice2_eu_tpu.models.flow import init_flow
        from cosyvoice2_eu_tpu.models.hift import init_hift
        from cosyvoice2_eu_tpu.models.llm import init_lm

        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        params = {
            "llm": init_lm(k1, cfg.llm),
            "flow": init_flow(k2, cfg.flow),
            "hift": init_hift(k3, cfg.hift),
        }
        tokenizer = get_tokenizer(bb_tokenizer_dir or "")

    # frontend aux models: converted from the reference's ONNX binaries when
    # present in model_dir (speech_tokenizer_v2.onnx / campplus.onnx,
    # reference cli/frontend.py:190-197)
    speech_tokenizer_fn = spk_embedding_fn = None
    if model_dir is not None:
        from cosyvoice2_eu_tpu.runtime.onnx_fallback import load_frontend_fns

        # structural ONNX->JAX conversion first; numpy graph-executor
        # fallback when an unfamiliar export topology defeats it
        speech_tokenizer_fn, spk_embedding_fn = load_frontend_fns(
            os.path.join(model_dir, "speech_tokenizer_v2.onnx"),
            os.path.join(model_dir, "campplus.onnx"),
        )

    if isinstance(compute_dtype, str):
        import jax.numpy as jnp

        compute_dtype = None if compute_dtype in ("float32", "none") else getattr(jnp, compute_dtype)
    model = TTSModel(
        cfg, params, seed=seed, compute_dtype=compute_dtype, lm_quant=lm_quant,
        use_bistream=use_bistream, tp=tp,
    )
    frontend = Frontend(
        cfg,
        tokenizer=tokenizer,
        speech_tokenizer_fn=speech_tokenizer_fn,
        spk_embedding_fn=spk_embedding_fn,
    )
    if model_dir is not None:
        # cached-speaker store (reference spk2info.pt, frontend.py:199-202)
        for name in ("spk2info.pt", "spk2info.npz"):
            spk_path = os.path.join(model_dir, name)
            if os.path.exists(spk_path):
                try:
                    frontend.load_spk_info(spk_path)
                except Exception:
                    import logging

                    logging.exception("failed to load %s", spk_path)
                break
    return Cosy2EU(model, frontend, cfg)


def load_v1(
    *,
    model_dir: Optional[str] = None,
    config=None,
    params: Optional[dict] = None,
    seed: int = 0,
):
    """Load a v1 (CosyVoice-300M family) bundle.

    Mirrors the reference ``CosyVoice`` loader (cli/cosyvoice.py:27-65):
    ``model_dir`` holds ``llm.pt``/``flow.pt``/``hift.pt`` (converted via
    runtime/checkpoint_v1.py), ``speech_tokenizer_v1.onnx``/``campplus.onnx``
    (structural-or-executor ONNX path) and optionally ``spk2info.pt``.  With
    ``config=`` and no model_dir a random-initialized bundle is built; with
    ``params=`` an already-converted {"llm","flow","hift"} pytree is used
    directly.  The reference's v1 tokenizer is whisper-tiktoken; a
    ``*.tiktoken`` ranks asset in model_dir selects the native
    ``frontend/legacy_tokenizer.py`` port (token-exact vs tiktoken), with
    HF tokenizer files as the fallback.

    Returns ``(CosyVoice1Model, Frontend, TTSV1Config)``.
    """
    import jax

    from cosyvoice2_eu_tpu.config import TTSV1Config
    from cosyvoice2_eu_tpu.frontend.frontend import Frontend
    from cosyvoice2_eu_tpu.frontend.tokenizer import get_tokenizer
    from cosyvoice2_eu_tpu.runtime.model_v1 import CosyVoice1Model

    cfg = config or TTSV1Config()
    if params is not None:
        params = jax.device_put(params)
    elif model_dir is not None:
        from cosyvoice2_eu_tpu.runtime.checkpoint import (
            convert_hift,
            load_torch_state,
        )
        from cosyvoice2_eu_tpu.runtime.checkpoint_v1 import (
            convert_flow_v1,
            convert_llm_v1,
        )

        params = {
            "llm": convert_llm_v1(
                load_torch_state(os.path.join(model_dir, "llm.pt")), cfg.llm
            ),
            "flow": convert_flow_v1(
                load_torch_state(os.path.join(model_dir, "flow.pt")), cfg.flow
            ),
            "hift": convert_hift(
                load_torch_state(os.path.join(model_dir, "hift.pt")), cfg.hift
            ),
        }
    else:
        from cosyvoice2_eu_tpu.models.flow_v1 import init_flow_v1
        from cosyvoice2_eu_tpu.models.hift import init_hift
        from cosyvoice2_eu_tpu.models.llm_v1 import init_lm_v1

        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        params = {
            "llm": init_lm_v1(k1, cfg.llm),
            "flow": init_flow_v1(k2, cfg.flow),
            "hift": init_hift(k3, cfg.hift),
        }

    speech_tokenizer_fn = spk_embedding_fn = None
    if model_dir is not None:
        from cosyvoice2_eu_tpu.runtime.onnx_fallback import load_frontend_fns

        speech_tokenizer_fn, spk_embedding_fn = load_frontend_fns(
            os.path.join(model_dir, "speech_tokenizer_v1.onnx"),
            os.path.join(model_dir, "campplus.onnx"),
        )

    model = CosyVoice1Model(cfg, params, seed=seed)
    frontend = Frontend(
        cfg,
        tokenizer=get_tokenizer(model_dir or ""),
        speech_tokenizer_fn=speech_tokenizer_fn,
        spk_embedding_fn=spk_embedding_fn,
    )
    if model_dir is not None:
        for name in ("spk2info.pt", "spk2info.npz"):
            spk_path = os.path.join(model_dir, name)
            if os.path.exists(spk_path):
                try:
                    frontend.load_spk_info(spk_path)
                except Exception:
                    import logging

                    logging.exception("failed to load %s", spk_path)
                break
    return model, frontend, cfg
