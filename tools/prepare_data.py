"""Dataset preparation: wav/text lists -> training parquet shards.

Re-expression of the reference tooling chain
(reference: cosy_repo/tools/extract_embedding.py, tools/extract_speech_token.py,
tools/make_parquet_list.py and examples/libritts/cosyvoice2/run.sh stages 1-4):
given kaldi-style ``wav.scp`` + ``text`` files, extracts FSQ speech tokens and
CAM++ x-vectors with the JAX ports and writes parquet shards with the columns
the training pipeline consumes (utt, speech, sample_rate, text, speech_token,
utt_embedding, spk_embedding).

Usage:
  python tools/prepare_data.py --wav_scp data/wav.scp --text data/text \
      --utt2spk data/utt2spk --out_dir data/parquet --num_utts_per_parquet 1000
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def read_kv(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if len(parts) == 2:
                out[parts[0]] = parts[1]
    return out


def main(argv=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    import cosyvoice2_eu_tpu  # noqa: F401 (path setup)
    from cosyvoice2_eu_tpu.frontend.frontend import load_wav

    parser = argparse.ArgumentParser()
    parser.add_argument("--wav_scp", required=True)
    parser.add_argument("--text", required=True)
    parser.add_argument("--utt2spk", default=None)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--num_utts_per_parquet", type=int, default=1000)
    parser.add_argument("--tokenizer_params", default=None,
                        help="orbax pytree for the FSQ speech tokenizer")
    parser.add_argument("--campplus_params", default=None,
                        help="orbax pytree for the CAM++ x-vector model")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    wavs = read_kv(args.wav_scp)
    texts = read_kv(args.text)
    utt2spk = read_kv(args.utt2spk) if args.utt2spk else {u: u for u in wavs}

    tokenize_fn = embed_fn = None
    if args.tokenizer_params:
        from cosyvoice2_eu_tpu.frontend.frontend import make_speech_tokenizer_fn
        from cosyvoice2_eu_tpu.runtime.checkpoint import load_pytree

        tokenize_fn = make_speech_tokenizer_fn(load_pytree(args.tokenizer_params))
    if args.campplus_params:
        from cosyvoice2_eu_tpu.frontend.frontend import make_spk_embedding_fn
        from cosyvoice2_eu_tpu.runtime.checkpoint import load_pytree

        embed_fn = make_spk_embedding_fn(load_pytree(args.campplus_params))

    os.makedirs(args.out_dir, exist_ok=True)
    utts = [u for u in wavs if u in texts]
    spk_embs: dict[str, list] = {}
    shard_rows, shard_idx, shard_paths = [], 0, []

    def flush():
        nonlocal shard_rows, shard_idx
        if not shard_rows:
            return
        cols = {k: [r[k] for r in shard_rows] for k in shard_rows[0]}
        path = os.path.join(args.out_dir, f"parquet_{shard_idx:09d}.tar.parquet")
        pq.write_table(pa.table(cols), path)
        shard_paths.append(path)
        logging.info("wrote %s (%d utts)", path, len(shard_rows))
        shard_rows, shard_idx = [], shard_idx + 1

    for utt in utts:
        try:
            wav24 = load_wav(wavs[utt], 24000)
            wav16 = load_wav(wavs[utt], 16000)
        except Exception as e:
            logging.warning("skip %s: %s", utt, e)
            continue
        row = {
            "utt": utt,
            "spk": utt2spk.get(utt, utt),
            "text": texts[utt],
            "speech": wav24.tolist(),
            "sample_rate": 24000,
        }
        if tokenize_fn is not None:
            row["speech_token"] = tokenize_fn(wav16).tolist()
        if embed_fn is not None:
            emb = embed_fn(wav16)
            row["utt_embedding"] = emb.tolist()
            spk_embs.setdefault(row["spk"], []).append(emb)
        shard_rows.append(row)
        if len(shard_rows) >= args.num_utts_per_parquet:
            flush()
    flush()

    # second pass: spk embedding = mean of utt embeddings (extract_embedding.py)
    if embed_fn is not None:
        spk_mean = {s: np.mean(e, axis=0).tolist() for s, e in spk_embs.items()}
        for path in shard_paths:
            table = pq.read_table(path)
            spk_col = [spk_mean[s] for s in table.column("spk").to_pylist()]
            table = table.append_column("spk_embedding", pa.array(spk_col))
            pq.write_table(table, path)

    with open(os.path.join(args.out_dir, "data.list"), "w") as f:
        f.write("\n".join(shard_paths) + "\n")
    logging.info("done: %d shards", len(shard_paths))


if __name__ == "__main__":
    main()
