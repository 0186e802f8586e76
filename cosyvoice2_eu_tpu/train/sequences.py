"""LM training sequence construction (host-side numpy).

Mirrors Qwen2LM.prepare_lm_input_target (reference:
cosy_repo/cosyvoice/llm/llm.py:437-477): each example becomes a packed
(ids, src, target) triple, where src selects the embedding table
(models/llm.py SRC_*).  Unistream lays out
[sos, text..., task, speech...] -> targets [IGNORE..., speech..., eos];
bistream interleaves mix_ratio text/speech chunks with the FILL token
protocol for streaming text input.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from cosyvoice2_eu_tpu.config import LMConfig
from cosyvoice2_eu_tpu.models.llm import SRC_SPECIAL, SRC_SPEECH, SRC_TEXT

IGNORE_ID = -1


def build_unistream(text: np.ndarray, speech: np.ndarray, cfg: LMConfig):
    nt, ns = len(text), len(speech)
    ids = np.concatenate(
        [[cfg.sos_eos], text, [cfg.task_id], speech]
    ).astype(np.int32)
    src = np.concatenate(
        [[SRC_SPECIAL], [SRC_TEXT] * nt, [SRC_SPECIAL], [SRC_SPEECH] * ns]
    ).astype(np.int32)
    target = np.concatenate(
        [[IGNORE_ID] * (1 + nt), speech, [cfg.eos_token]]
    ).astype(np.int32)
    return ids, src, target


def build_bistream(text: np.ndarray, speech: np.ndarray, cfg: LMConfig):
    """FILL-token interleave (llm.py:444-466)."""
    mt, ms = cfg.mix_ratio
    fill = cfg.speech_token_size + 2
    ids: List[int] = [cfg.sos_eos]
    src: List[int] = [SRC_SPECIAL]
    target: List[int] = [IGNORE_ID]
    n_chunks = int(np.ceil((len(text) + 1) / mt))
    for j in range(n_chunks):
        t_chunk = text[j * mt : (j + 1) * mt]
        s_chunk = speech[j * ms : (j + 1) * ms]
        if len(t_chunk) == mt:
            assert len(s_chunk) == ms, "bistream requires speech/text ratio >= ms/mt"
            target += [IGNORE_ID] * (mt - 1) + list(s_chunk) + [fill]
            ids += list(t_chunk) + list(s_chunk)
            src += [SRC_TEXT] * mt + [SRC_SPEECH] * ms
        else:
            rest_s = speech[j * ms :]
            target += [IGNORE_ID] * len(t_chunk) + list(rest_s) + [cfg.eos_token]
            ids += list(t_chunk) + [cfg.task_id] + list(rest_s)
            src += [SRC_TEXT] * len(t_chunk) + [SRC_SPECIAL] + [SRC_SPEECH] * len(rest_s)
    return (
        np.asarray(ids, np.int32),
        np.asarray(src, np.int32),
        np.asarray(target, np.int32),
    )


def build_lm_batch(
    texts: Sequence[np.ndarray],
    speeches: Sequence[np.ndarray],
    cfg: LMConfig,
    rng: np.random.Generator,
    bistream_prob: float = 0.5,
    pad_to: int | None = None,
) -> dict:
    """Pack a batch; bistream is sampled per-row when the speech/text ratio
    allows (llm.py:445)."""
    rows = []
    for text, speech in zip(texts, speeches):
        can_bistream = len(speech) / max(len(text), 1) > cfg.mix_ratio[1] / cfg.mix_ratio[0]
        if can_bistream and rng.random() < bistream_prob:
            rows.append(build_bistream(text, speech, cfg))
        else:
            rows.append(build_unistream(text, speech, cfg))
    max_len = max(len(r[0]) for r in rows)
    if pad_to is not None:
        assert pad_to >= max_len, f"pad_to={pad_to} < longest sequence {max_len}"
        max_len = pad_to
    b = len(rows)
    ids = np.zeros((b, max_len), np.int32)
    src = np.zeros((b, max_len), np.int32)
    target = np.full((b, max_len), IGNORE_ID, np.int32)
    lengths = np.zeros((b,), np.int32)
    for i, (i_, s_, t_) in enumerate(rows):
        n = len(i_)
        ids[i, :n], src[i, :n], target[i, :n], lengths[i] = i_, s_, t_, n
    return {"ids": ids, "src": src, "target": target, "lengths": lengths}
