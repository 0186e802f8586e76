"""Training data pipeline over synthetic parquet shards."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cosyvoice2_eu_tpu.frontend.tokenizer import ByteFallbackTokenizer
from cosyvoice2_eu_tpu.train import dataset as ds


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("parquet")
    paths = []
    for s in range(2):
        rows = {
            "utt": [], "spk": [], "text": [], "speech": [], "sample_rate": [],
            "speech_token": [], "utt_embedding": [], "spk_embedding": [],
        }
        for i in range(12):
            n = rng.integers(24000, 72000)
            rows["utt"].append(f"utt_{s}_{i}")
            rows["spk"].append(f"spk_{i % 3}")
            rows["text"].append("bonjour le monde " * rng.integers(1, 4))
            rows["speech"].append((rng.standard_normal(n) * 0.1).astype(np.float32).tolist())
            rows["sample_rate"].append(24000)
            rows["speech_token"].append(
                rng.integers(0, 81, n // 960).astype(np.int32).tolist()
            )
            rows["utt_embedding"].append(rng.standard_normal(16).astype(np.float32).tolist())
            rows["spk_embedding"].append(rng.standard_normal(16).astype(np.float32).tolist())
        p = root / f"shard_{s}.parquet"
        pq.write_table(pa.table(rows), str(p))
        paths.append(str(p))
    return paths


def _mel_fn(wav):
    # cheap fake mel at the real 480-hop rate
    n = len(wav) // 480
    return np.tile(wav[: n * 480].reshape(n, 480).mean(axis=1, keepdims=True), (1, 80)).astype(np.float32)


def test_pipeline_end_to_end(shards):
    batches = list(
        ds.build_pipeline(
            shards, ByteFallbackTokenizer(), _mel_fn,
            rank=0, world_size=1, epoch=0, max_frames_in_batch=400,
            shuffle_size=8, sort_size=4,
        )
    )
    assert batches
    for b in batches:
        B, T = b["speech_token"].shape
        assert b["speech_feat"].shape[0] == B
        # mel/token 2:1 alignment per row
        for i in range(B):
            assert b["speech_feat_len"][i] == 2 * b["speech_token_len"][i]
        assert b["embedding"].shape == (B, 16)
        # frame budget respected
        assert b["speech_feat"].shape[1] * B <= 400 + b["speech_feat"].shape[1]


def test_rank_sharding():
    items = [f"shard_{i}" for i in range(8)]
    a = ds.shard_list(items, rank=0, world_size=2, epoch=0, seed=1)
    b = ds.shard_list(items, rank=1, world_size=2, epoch=0, seed=1)
    assert len(a) + len(b) == 8
    assert not (set(a) & set(b))
    # different epoch -> different shuffle order
    a2 = ds.shard_list(items, rank=0, world_size=2, epoch=1, seed=1)
    assert set(a) != set(a2) or a != a2


def test_pipeline_rank_disjointness(shards):
    """Per-rank utterance disjointness through the real pipeline path the
    train CLI uses (rank/world now wired from init_distributed)."""

    def utts(rank):
        out = set()
        for b in ds.build_pipeline(
            shards, ByteFallbackTokenizer(), _mel_fn,
            rank=rank, world_size=2, epoch=0, max_frames_in_batch=400,
            shuffle_size=8, sort_size=4,
        ):
            out.update(b["utts"])
        return out

    a, b = utts(0), utts(1)
    assert a and b
    assert not (a & b)


def test_gan_pipeline_has_pitch(shards):
    batches = list(
        ds.build_pipeline(
            shards, ByteFallbackTokenizer(), _mel_fn,
            rank=0, world_size=1, epoch=0, gan=True, max_frames_in_batch=200,
            shuffle_size=8, sort_size=4,
        )
    )
    assert batches
    b = batches[0]
    assert "pitch_feat" in b and "speech" in b
    assert b["pitch_feat"].shape == b["speech_feat"].shape[:2]
    # GAN crops are fixed length (truncate_length 24480 -> 51 mel frames)
    assert b["speech"].shape[1] == 24480


def test_prefetch_preserves_order_and_raises():
    from cosyvoice2_eu_tpu.train.dataset import prefetch

    assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))

    def boom():
        yield 1
        raise ValueError("upstream died")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="upstream died"):
        next(it)


def test_worker_map_ordered():
    from cosyvoice2_eu_tpu.train.dataset import worker_map

    items = [{"i": i} for i in range(37)]
    fn = lambda s: {"i": s["i"] * 2}
    serial = [s["i"] for s in worker_map(iter(items), fn, num_workers=0)]
    pooled = [s["i"] for s in worker_map(iter(items), fn, num_workers=4)]
    assert serial == pooled == [2 * i for i in range(37)]
