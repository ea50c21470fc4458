"""Native C++ WordPiece: parity with the Python reference implementation."""

import numpy as np
import pytest

from opensearch_sparse_model_tuning_sample_tpu.models.tokenizer import (
    WordPieceTokenizer,
)

CASES = [
    "hello world",
    "Punctuation, splitting; works! (yes) [brackets] {braces}",
    "don't stop believin' — ascii apostrophes",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "x" * 150,  # UNK via max_chars_per_word
    "UPPER lower MiXeD CaSe",
    "numbers 12345 and 3.14159 and $1,000",
    "  leading and   multiple   spaces\tand\ttabs ",
    "naïve café résumé — unicode fallback path",
    "日本語のテキスト mixed 中文",
    "email@example.com https://foo.bar/baz?q=1",
]


@pytest.fixture(scope="module")
def tok_native():
    tok = WordPieceTokenizer.from_pretrained(None)
    if not tok.try_attach_native():
        pytest.skip("native tokenizer unavailable (no g++?)")
    return tok


@pytest.fixture(scope="module")
def tok_py():
    return WordPieceTokenizer.from_pretrained(None)


@pytest.mark.parametrize("text", CASES)
def test_native_matches_python(tok_native, tok_py, text):
    native = tok_native._native.encode_batch([text], 64)[0]
    python = tok_py.encode_ids(text, 64)
    assert native == python


def test_batch_mixed_ascii_unicode(tok_native, tok_py):
    out = tok_native._native.encode_batch(CASES, 32)
    for got, text in zip(out, CASES):
        assert got == tok_py.encode_ids(text, 32)


def test_bucketed_encode_uses_native(tok_native, tok_py):
    a = tok_native.encode_bucketed(CASES, 64, [16, 32, 64])
    b = tok_py.encode_bucketed(CASES, 64, [16, 32, 64])
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
    np.testing.assert_array_equal(a["attention_mask"], b["attention_mask"])


def test_truncation_parity(tok_native, tok_py):
    long = " ".join(["retrieval"] * 300)
    assert tok_native._native.encode_batch([long], 16)[0] == tok_py.encode_ids(long, 16)


def test_special_token_literal_parity(tok_native, tok_py):
    """Whitespace-delimited literal specials ("[SEP]") are never-split in
    the Python path; texts containing '[' or ASCII control chars must take
    the Python path so both agree (wordpiece.cpp would split them)."""
    cases = [
        "first segment [SEP] second segment",
        "[CLS] already marked [SEP]",
        "control\x01char mid\x02word",
    ]
    for t in cases:
        got = tok_native._native.encode_batch([t], 32)[0]
        assert got == tok_py.encode_ids(t, 32), t
    assert tok_py.sep_id in tok_native._native.encode_batch(
        ["a [SEP] b"], 32)[0]


def test_cased_tokenizer_refuses_native():
    """wordpiece.cpp lowercases unconditionally — attaching it to a cased
    tokenizer would silently encode ASCII texts in the wrong id space."""
    cased = WordPieceTokenizer.from_pretrained(None, do_lower_case=False)
    assert cased.try_attach_native() is False
    assert cased._native is None


@pytest.mark.parametrize("max_len", [1, 2, 3])
def test_degenerate_max_length_parity(tok_native, tok_py, max_len):
    """max_length < 2 must not negative-slice (Python) or overflow the
    caller's row buffer (C++); both emit ([CLS]+body+[SEP])[:max_length]."""
    text = "hello brave new world"
    native = tok_native._native.encode_batch([text], max_len)[0]
    python = tok_py.encode_ids(text, max_len)
    assert native == python
    assert len(python) <= max_len
    # max_length=0: python yields [], and the guard keeps it bounded
    assert tok_py.encode_ids(text, 0) == []
