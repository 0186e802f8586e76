"""Streaming training data pipeline: parquet shards -> padded device batches.

Re-expression of the reference pipeline (reference:
cosy_repo/cosyvoice/dataset/dataset.py:26-151 DataList/Processor and
cosy_repo/cosyvoice/dataset/processor.py stages): an iterator chain where each
stage is a generator transform, shards are split by (rank, worker), and
batches are dynamic (frame-budget) with sorted padding.  Host-side numpy only;
device placement happens in the training loop.
"""

from __future__ import annotations

import random
from typing import Callable, Iterable, Iterator, List, Sequence

import numpy as np


def shard_list(items: Sequence, rank: int, world_size: int, epoch: int = 0,
               shuffle: bool = True, seed: int = 0) -> List:
    """Partition shard paths by data-parallel rank (dataset.py:51-104)."""
    items = list(items)
    if shuffle:
        rng = random.Random(seed + epoch)
        rng.shuffle(items)
    return items[rank::world_size]


def parquet_opener(paths: Iterable[str], batch_rows: int = 64) -> Iterator[dict]:
    """Yield per-utterance dicts from parquet shards (processor.py:29).

    List columns (waveforms, token ids, embeddings) decode via Arrow
    offsets + one zero-copy values buffer per record batch — ``to_pydict``
    materialized every waveform as a 100k-element Python list (tens of ms
    per row, the bulk of the old pipeline's cost)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for path in paths:
        table = pq.ParquetFile(path)
        for batch in table.iter_batches(batch_size=batch_rows):
            n = batch.num_rows
            cols = {}
            for name, col in zip(batch.schema.names, batch.columns):
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                    values = col.values.to_numpy(zero_copy_only=False)
                    offs = np.asarray(col.offsets)  # absolute into values
                    cols[name] = [
                        values[offs[i] : offs[i + 1]] for i in range(n)
                    ]
                else:
                    cols[name] = col.to_pylist()
            for i in range(n):
                yield {k: v[i] for k, v in cols.items()}


def tokenize(samples: Iterator[dict], tokenizer) -> Iterator[dict]:
    for s in samples:
        s["text_token"] = np.asarray(tokenizer.encode(s["text"]), np.int32)
        yield s


def filter_samples(
    samples: Iterator[dict],
    max_length: int = 40960,
    min_length: int = 100,
    token_max_length: int = 512,
    token_min_length: int = 1,
) -> Iterator[dict]:
    """Length bounds in 10 ms frames / text tokens (processor.py:57)."""
    for s in samples:
        frames = len(s["speech"]) / s["sample_rate"] * 100
        if not (min_length < frames < max_length):
            continue
        if not (token_min_length <= len(s["text_token"]) <= token_max_length):
            continue
        if "speech_token" in s and len(s["speech_token"]) == 0:
            continue
        yield s


def resample(samples: Iterator[dict], target_sr: int = 24000) -> Iterator[dict]:
    from cosyvoice2_eu_tpu.frontend.frontend import resample as _resample

    for s in samples:
        sr = s["sample_rate"]
        if sr != target_sr:
            s["speech"] = _resample(np.asarray(s["speech"], np.float32), sr, target_sr)
            s["sample_rate"] = target_sr
        speech = np.asarray(s["speech"], np.float32)
        peak = np.abs(speech).max()
        if peak > 0.95:  # peak normalization guard (processor.py:111)
            speech = speech / peak * 0.95
        s["speech"] = speech
        yield s


def truncate(samples: Iterator[dict], truncate_length: int = 24480) -> Iterator[dict]:
    """GAN training fixed-length crops (processor.py:139)."""
    for s in samples:
        speech = s["speech"]
        if len(speech) >= truncate_length:
            start = random.randint(0, len(speech) - truncate_length)
            s["speech"] = speech[start : start + truncate_length]
        else:
            s["speech"] = np.pad(speech, (0, truncate_length - len(speech)))
        yield s


def compute_fbank(samples: Iterator[dict], mel_fn: Callable, token_mel_ratio: int = 2) -> Iterator[dict]:
    """24 kHz mel, trimmed to token_mel_ratio alignment (processor.py:160)."""
    for s in samples:
        feat = mel_fn(np.asarray(s["speech"], np.float32))  # (T_mel, 80)
        if "speech_token" in s:
            token_len = min(feat.shape[0] // token_mel_ratio, len(s["speech_token"]))
            feat = feat[: token_mel_ratio * token_len]
            s["speech_token"] = np.asarray(s["speech_token"][:token_len], np.int32)
        s["speech_feat"] = feat.astype(np.float32)
        yield s


def compute_f0(samples: Iterator[dict], sample_rate: int = 24000, hop_size: int = 480) -> Iterator[dict]:
    """F0 for GAN training via autocorrelation (pyworld-free; processor.py:188
    uses WORLD harvest — we use a YIN-style estimator on host)."""
    from cosyvoice2_eu_tpu.train.pitch import estimate_f0

    for s in samples:
        f0 = estimate_f0(np.asarray(s["speech"], np.float32), sample_rate, hop_size)
        n = s["speech_feat"].shape[0]
        if len(f0) < n:
            f0 = np.pad(f0, (0, n - len(f0)))
        s["pitch_feat"] = f0[:n].astype(np.float32)
        yield s


def parse_embedding(samples: Iterator[dict], normalize: bool = True) -> Iterator[dict]:
    for s in samples:
        for key in ("utt_embedding", "spk_embedding"):
            if key in s:
                e = np.asarray(s[key], np.float32)
                if normalize:
                    e = e / max(np.linalg.norm(e), 1e-12)
                s[key] = e
        yield s


def shuffle(samples: Iterator[dict], shuffle_size: int = 1000) -> Iterator[dict]:
    buf: List[dict] = []
    for s in samples:
        buf.append(s)
        if len(buf) >= shuffle_size:
            random.shuffle(buf)
            yield from buf[: shuffle_size // 2]
            buf = buf[shuffle_size // 2 :]
    random.shuffle(buf)
    yield from buf


def sort_by_length(samples: Iterator[dict], sort_size: int = 500) -> Iterator[dict]:
    buf: List[dict] = []
    for s in samples:
        buf.append(s)
        if len(buf) >= sort_size:
            buf.sort(key=lambda x: x["speech_feat"].shape[0])
            yield from buf
            buf = []
    buf.sort(key=lambda x: x["speech_feat"].shape[0])
    yield from buf


def dynamic_batch(samples: Iterator[dict], max_frames_in_batch: int = 3000) -> Iterator[List[dict]]:
    """Frame-budget batching (processor.py:349)."""
    buf: List[dict] = []
    longest = 0
    for s in samples:
        frames = s["speech_feat"].shape[0]
        longest = max(longest, frames)
        if buf and longest * (len(buf) + 1) > max_frames_in_batch:
            yield buf
            buf = [s]
            longest = frames
        else:
            buf.append(s)
    if buf:
        yield buf


def static_batch(samples: Iterator[dict], batch_size: int) -> Iterator[List[dict]]:
    buf: List[dict] = []
    for s in samples:
        buf.append(s)
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf:
        yield buf


def _pad2(arrs: List[np.ndarray], pad_to: int | None = None, value=0.0) -> np.ndarray:
    max_len = max(a.shape[0] for a in arrs)
    if pad_to:
        max_len = max(max_len, pad_to)
    out_shape = (len(arrs), max_len) + arrs[0].shape[1:]
    out = np.full(out_shape, value, arrs[0].dtype)
    for i, a in enumerate(arrs):
        out[i, : a.shape[0]] = a
    return out


def padding(batches: Iterator[List[dict]], use_spk_embedding: bool = True,
            pad_multiple: int = 1) -> Iterator[dict]:
    """Pad a sample list into dense arrays (processor.py:360); sort desc by
    feat length like the reference.  pad_multiple rounds lengths up so bucket
    reuse limits recompilation on TPU."""
    for batch in batches:
        batch = sorted(batch, key=lambda s: s["speech_feat"].shape[0], reverse=True)

        def rnd(n):
            return -(-n // pad_multiple) * pad_multiple

        out = {
            "text_token": _pad2([s["text_token"] for s in batch]),
            "text_token_len": np.asarray([len(s["text_token"]) for s in batch], np.int32),
            "speech_feat": _pad2(
                [s["speech_feat"] for s in batch],
                pad_to=rnd(batch[0]["speech_feat"].shape[0]),
            ),
            "speech_feat_len": np.asarray(
                [s["speech_feat"].shape[0] for s in batch], np.int32
            ),
        }
        if "speech_token" in batch[0]:
            out["speech_token"] = _pad2(
                [s["speech_token"] for s in batch],
                pad_to=rnd(batch[0]["speech_token"].shape[0]),
            )
            out["speech_token_len"] = np.asarray(
                [len(s["speech_token"]) for s in batch], np.int32
            )
        if "reject_speech_token" in batch[0]:
            # DPO pairs: the rejected continuation rides beside the chosen
            # tokens (reference processor.py:360 dpo padding)
            out["reject_speech_token"] = _pad2(
                [np.asarray(s["reject_speech_token"], np.int32) for s in batch]
            )
            out["reject_speech_token_len"] = np.asarray(
                [len(s["reject_speech_token"]) for s in batch], np.int32
            )
        if "pitch_feat" in batch[0]:
            out["pitch_feat"] = _pad2([s["pitch_feat"] for s in batch])
        if "speech" in batch[0]:
            out["speech"] = _pad2([np.asarray(s["speech"], np.float32) for s in batch])
        emb_key = "spk_embedding" if use_spk_embedding else "utt_embedding"
        if emb_key in batch[0]:
            out["embedding"] = np.stack([s[emb_key] for s in batch])
        if "utt" in batch[0]:
            out["utts"] = [s["utt"] for s in batch]
        yield out


def prefetch(samples: Iterator, depth: int = 4) -> Iterator:
    """Run the upstream iterator chain in a background thread with a bounded
    queue: host featurization (parquet decode, mel, f0) overlaps the
    consumer's device steps instead of serializing with them — the role of
    the reference's multi-worker DataLoader + prefetch
    (cosy_repo/cosyvoice/utils/train_utils.py:59, dataset/dataset.py:82-104).
    Thread- not process-based: the hot stages are numpy/Arrow (GIL-released),
    and items pass by reference with no pickling."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in samples:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # surface upstream errors to the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def worker_map(samples: Iterator[dict], fn: Callable[[dict], dict],
               num_workers: int = 0, window: int = 8) -> Iterator[dict]:
    """Ordered parallel map over samples with a bounded in-flight window.

    The per-sample featurizers (mel FFT, YIN f0, resample) are numpy/native
    code that releases the GIL, so a thread pool scales them across cores on
    multi-core hosts; num_workers=0 (or 1 CPU) degrades to the plain serial
    map with zero overhead."""
    if num_workers <= 0:
        for s in samples:
            yield fn(s)
        return
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        pending: "deque" = deque()
        for s in samples:
            pending.append(pool.submit(fn, s))
            if len(pending) >= window:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()


def _default_workers() -> int:
    import os

    n = os.cpu_count() or 1
    return max(0, min(n - 1, 8))  # leave one core for the training loop


def build_pipeline(
    paths: Sequence[str],
    tokenizer,
    mel_fn: Callable,
    rank: int = 0,
    world_size: int = 1,
    epoch: int = 0,
    gan: bool = False,
    max_frames_in_batch: int = 3000,
    use_spk_embedding: bool = True,
    shuffle_size: int = 1000,
    sort_size: int = 500,
    num_workers: int | None = None,
    prefetch_depth: int = 4,
) -> Iterator[dict]:
    """The full reference pipeline order (conf/cosyvoice2.yaml data_pipeline).

    num_workers: thread-pool width for the featurize stages (None = cores-1,
    capped at 8); prefetch_depth: batches prepared ahead in a background
    thread (0 disables)."""
    if num_workers is None:
        num_workers = _default_workers()
    it = parquet_opener(shard_list(paths, rank, world_size, epoch))
    it = tokenize(it, tokenizer)
    it = filter_samples(it)

    def featurize(s: dict) -> dict:
        s = next(resample(iter([s])))
        if gan:
            s = next(truncate(iter([s])))
        s = next(compute_fbank(iter([s]), mel_fn))
        if gan:
            s = next(compute_f0(iter([s])))
        return next(parse_embedding(iter([s])))

    it = worker_map(it, featurize, num_workers=num_workers)
    it = shuffle(it, shuffle_size)
    it = sort_by_length(it, sort_size)
    batches = dynamic_batch(it, max_frames_in_batch)
    out = padding(batches, use_spk_embedding)
    if prefetch_depth > 0:
        out = prefetch(out, depth=prefetch_depth)
    return out
