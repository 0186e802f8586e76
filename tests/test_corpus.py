"""Corpus curation tooling over a synthetic split/speaker tree."""

import csv
import os
import wave

import numpy as np
import pytest

from cosyvoice2_eu_tpu.data import corpus


def _write_wav(path, seconds, sr=16000):
    n = int(seconds * sr)
    pcm = (np.sin(np.linspace(0, 100, n)) * 20000).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    specs = [
        ("train", "mls_fr_0001", 8),
        ("train", "mls_fr_0002", 6),
        ("train", "mls_de_0003", 10),
        ("dev", "mls_fr_0001", 2),
    ]
    for split, spk, n in specs:
        d = root / split / spk
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            utt = f"{spk}_{i:04d}"
            _write_wav(d / f"{utt}.wav", float(rng.uniform(1.0, 9.0)))
            (d / f"{utt}.normalized.txt").write_text(f"phrase {i} de {spk}")
    # one broken pair: wav without transcript
    _write_wav(root / "train" / "mls_fr_0001" / "orphan.wav", 2.0)
    return root


def test_scan_and_summarize(tree):
    utts = corpus.scan_corpus(str(tree))
    assert len(utts) == 27  # 26 good + 1 orphan
    bad = [u for u in utts if not u.ok]
    assert len(bad) == 1 and bad[0].wav.endswith("orphan.wav")
    assert {u.lang for u in utts} == {"mls_fr", "mls_de"}
    s = corpus.summarize(utts)
    assert s["total"]["n"] == 27 and s["total"]["bad"] == 1
    assert s["per_split"]["train"]["n"] == 25
    assert s["per_lang"]["mls_de"]["n"] == 10
    assert s["total"]["hours"] > 0


def test_budget_subset_balanced(tree):
    utts = corpus.scan_corpus(str(tree), splits=["train"])
    hours = sum(u.duration for u in utts if u.ok) / 3600
    sel = corpus.budget_subset(
        utts, hours * 0.5, lang_ratios={"mls_fr": 0.5, "mls_de": 0.5}, seed=1
    )
    assert sel and all(u.ok for u in sel)
    per_lang = {}
    for u in sel:
        per_lang[u.lang] = per_lang.get(u.lang, 0.0) + u.duration
    # both languages present with roughly comparable budgets
    assert set(per_lang) == {"mls_fr", "mls_de"}
    ratio = per_lang["mls_fr"] / per_lang["mls_de"]
    assert 0.4 < ratio < 2.5
    # deterministic under the seed
    sel2 = corpus.budget_subset(
        utts, hours * 0.5, lang_ratios={"mls_fr": 0.5, "mls_de": 0.5}, seed=1
    )
    assert [u.wav for u in sel] == [u.wav for u in sel2]


def test_file_list_roundtrip_and_materialize(tree, tmp_path):
    utts = [u for u in corpus.scan_corpus(str(tree), splits=["dev"]) if u.ok]
    lst = tmp_path / "sel.jsonl"
    corpus.write_file_list(utts, str(lst))
    back = corpus.read_file_list(str(lst))
    assert [u.wav for u in back] == [u.wav for u in utts]
    out = tmp_path / "subset"
    n = corpus.materialize_subset(utts, str(tree), str(out))
    assert n == 2 * len(utts)
    again = corpus.scan_corpus(str(out))
    assert len(again) == len(utts) and all(u.ok for u in again)


def test_merge_tree(tree, tmp_path):
    dst = tmp_path / "merged"
    counts = corpus.merge_tree(str(tree), str(dst), speaker_prefix="extra_")
    assert counts["train"] > 0 and counts["dev"] > 0
    merged = corpus.scan_corpus(str(dst))
    assert all(u.speaker.startswith("extra_") for u in merged)
    # idempotent: second merge adds nothing
    assert corpus.merge_tree(str(tree), str(dst), speaker_prefix="extra_") == {}


def test_build_ood_testset(tree, tmp_path):
    dst = tmp_path / "ood"
    n = corpus.build_ood_testset(str(tree), str(dst), per_speaker=3, seed=2)
    got = corpus.scan_corpus(str(dst))
    assert n == len(got) and n > 0
    per_spk = {}
    for u in got:
        per_spk[u.speaker] = per_spk.get(u.speaker, 0) + 1
    assert all(v <= 3 for v in per_spk.values())
    assert all(u.split == "test" and u.ok for u in got)


def test_filter_metadata_csv(tmp_path):
    src = tmp_path / "meta.csv"
    with open(src, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["file", "text"])
        w.writeheader()
        w.writerows(
            [
                {"file": "a.wav", "text": "bonjour le monde"},
                {"file": "", "text": "missing file"},
                {"file": "b.wav", "text": "x"},  # too short
                {"file": "c.wav", "text": "guten tag"},
            ]
        )
    kept, dropped = corpus.filter_metadata_csv(str(src), str(src))
    assert (kept, dropped) == (2, 2)
    assert os.path.exists(str(src) + ".bak")
    with open(src) as f:
        rows = list(csv.DictReader(f))
    assert [r["file"] for r in rows] == ["a.wav", "c.wav"]


def test_plot_durations(tree, tmp_path):
    utts = corpus.scan_corpus(str(tree))
    png = tmp_path / "hist.png"
    if corpus.plot_durations(utts, str(png)):
        assert png.stat().st_size > 0


def test_upload_weights_dry_run(tmp_path):
    """tools/upload_weights.py best-checkpoint resolution + dry-run listing
    (reference bin/upload_weights.py)."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import upload_weights

    exp = tmp_path / "exp"
    llm = exp / "llm"
    llm.mkdir(parents=True)
    # two sidecar-described checkpoints; lower cv_loss must win
    (llm / "epoch_1").mkdir()
    (llm / "epoch_2").mkdir()
    (llm / "epoch_1.json").write_text(json.dumps(
        {"tag": "epoch_1", "cv_loss": 3.2, "epoch": 1, "step": 10}))
    (llm / "epoch_2.json").write_text(json.dumps(
        {"tag": "epoch_2", "cv_loss": 2.9, "epoch": 2, "step": 20}))
    (exp / "config.json").write_text("{}")

    uploads = upload_weights.main([
        "--exp_dir", str(exp), "--hf_repo_id", "x/y", "--dry-run",
    ])
    assert uploads["llm"].endswith("epoch_2")
    assert "config.json" in uploads

    # averaged artifact takes precedence when present
    (llm / "llm_averaged").mkdir()
    uploads = upload_weights.main([
        "--exp_dir", str(exp), "--hf_repo_id", "x/y", "--dry-run",
    ])
    assert uploads["llm"].endswith("llm_averaged")
