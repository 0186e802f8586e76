"""Legacy whisper-tiktoken tokenizer: BPE correctness + parity vs tiktoken."""

import os

import pytest

from cosyvoice2_eu_tpu.frontend.legacy_tokenizer import (
    LegacyTokenizer,
    _bpe_encode,
    get_legacy_tokenizer,
    special_token_list,
)

REF_RANKS = (
    "/root/reference/cosy_repo/cosyvoice/tokenizer/assets/"
    "multilingual_zh_ja_yue_char_del.tiktoken"
)


def test_bpe_merge_order_toy_ranks():
    """Greedy lowest-rank merging on a hand-checkable toy vocabulary."""
    ranks = {bytes([b]): b for b in range(256)}
    n = 256
    for tok in (b"ab", b"abc", b"bc"):
        ranks[tok] = n
        n += 1
    # "abc" is a full token
    assert _bpe_encode(ranks, b"abc") == [ranks[b"abc"]]
    # "abcd": merge ab (rank 256) first, then abc (257), d stays
    assert _bpe_encode(ranks, b"abcd") == [ranks[b"abc"], ranks[b"d"]]
    # "bcd": bc merges, d single
    assert _bpe_encode(ranks, b"bcd") == [ranks[b"bc"], ranks[b"d"]]
    # no merges available
    assert _bpe_encode(ranks, b"xyz") == [ord("x"), ord("y"), ord("z")]


def _toy_tokenizer():
    ranks = {bytes([b]): b for b in range(256)}
    extra = [b" he", b"llo", b" hello", b"ll"]
    for i, tok in enumerate(extra):
        ranks[tok] = 256 + i
    return LegacyTokenizer(ranks, num_languages=3)


def test_specials_split_and_roundtrip():
    tok = _toy_tokenizer()
    text = "<|startoftranscript|><|en|> hello<|endoftext|>"
    ids = tok.encode(text, allowed_special="all")
    assert ids[0] == tok.sot and ids[-1] == tok.eot
    assert tok.special_tokens["<|en|>"] in ids
    assert tok.decode(ids) == text
    # arbitrary unicode roundtrip (byte-level fallback)
    s = "héllo wörld ÷ 测试 🚀"
    assert tok.decode(tok.encode(s)) == s


def test_disallowed_special_raises():
    tok = _toy_tokenizer()
    with pytest.raises(ValueError):
        tok.encode("x <|endoftext|> y", allowed_special=())
    # allowed subset passes
    ids = tok.encode("x <|endoftext|>", allowed_special={"<|endoftext|>"})
    assert ids[-1] == tok.eot


def test_special_token_ids_match_reference_layout():
    """Timestamp count, reserved specials, and ordering (tokenizer.py:182-198)."""
    specials = special_token_list(99)
    assert specials[0] == "<|endoftext|>"
    assert specials[1] == "<|startoftranscript|>"
    assert specials[2] == "<|en|>"
    assert "<|SPECIAL_TOKEN_30|>" in specials
    assert specials[-1] == "<|30.00|>"
    assert specials.count("<|0.00|>") == 1
    assert len([s for s in specials if s.startswith("<|TTS/")]) == 20


@pytest.mark.skipif(not os.path.exists(REF_RANKS), reason="ranks asset absent")
def test_parity_vs_tiktoken_reference_encoding():
    """Token-exact parity against tiktoken.Encoding built exactly like the
    reference get_encoding (tokenizer.py:172-210) over the real ranks asset."""
    tiktoken = pytest.importorskip("tiktoken")

    ours = get_legacy_tokenizer(REF_RANKS, language="fr")
    enc = tiktoken.Encoding(
        name="ref",
        explicit_n_vocab=ours.n_vocab,
        pat_str=(
            r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
            r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
        ),
        mergeable_ranks=ours.ranks,
        special_tokens=ours.special_tokens,
    )
    texts = [
        "Bonjour tout le monde, il est 14h30.",
        "Der schnelle braune Fuchs springt über den faulen Hund!",
        "Hello world — it's a test; don't panic.",
        "你好世界，这是一个测试。",
        "<|startoftranscript|><|fr|><|transcribe|>Salut<|endoftext|>",
        "mixed 混合 text with  spaces\n\nand\tlines 123,456.78",
        "<|0.00|>word<|1.02|>",
        "<|HAPPY|><|Laughter|>haha<|/Laughter|>",
    ]
    for t in texts:
        want = enc.encode(t, allowed_special="all")
        got = ours.encode(t, allowed_special="all")
        assert got == want, t
        assert ours.decode(got) == enc.decode(want)
    assert ours.sot_sequence == (
        ours.sot, ours.special_tokens["<|fr|>"], ours.transcribe
    )


def test_get_tokenizer_resolves_tiktoken_dir(tmp_path):
    """A model dir holding a ranks asset (and no HF files) selects the
    legacy whisper-tiktoken tokenizer."""
    import base64

    from cosyvoice2_eu_tpu.frontend.legacy_tokenizer import LegacyTokenizer
    from cosyvoice2_eu_tpu.frontend.tokenizer import get_tokenizer

    lines = [
        base64.b64encode(bytes([b])).decode() + f" {b}" for b in range(256)
    ]
    (tmp_path / "multilingual.tiktoken").write_text("\n".join(lines))
    tok = get_tokenizer(str(tmp_path))
    assert isinstance(tok, LegacyTokenizer)
    assert tok.decode(tok.encode("abc")) == "abc"
