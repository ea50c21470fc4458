"""WordPiece tokenizer parity vs the HF BertTokenizer oracle (loaded from a
local vocab file — no network)."""

import os

import numpy as np
import pytest

from opensearch_sparse_model_tuning_sample_tpu.models.tokenizer import (
    TextPreProcessors,
    WordPieceTokenizer,
)

CASES = [
    "Hello WorldABC, affordable framework!",
    "naïve café résumé — ünïcödé",
    "The 2,456.7 km² area costs $1,234.56!!!",
    "日本語のテキスト and mixed 中文 text",
    "don't stop believin' — it's AC/DC",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "   multiple   spaces\tand\nnewlines  ",
    "ALLCAPS MiXeD lowercase",
    "email@example.com https://foo.bar/baz?q=1",
    "",
    "[CLS] special tokens inline [SEP] [MASK]",
    "x" * 150,  # exceeds max_input_chars_per_word -> [UNK]
]


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer.from_pretrained(None)


@pytest.fixture(scope="module")
def hf_tok(tok, tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    d = tmp_path_factory.mktemp("vocab")
    tok.save_pretrained(str(d))
    return transformers.BertTokenizer(
        vocab_file=os.path.join(str(d), "vocab.txt"), do_lower_case=True
    )


def test_vocab_size(tok):
    assert tok.vocab_size == 30522
    assert tok.pad_id == 0 and tok.cls_id == 101 and tok.sep_id == 102


@pytest.mark.parametrize("text", CASES)
def test_tokenize_parity(tok, hf_tok, text):
    assert tok.tokenize(text) == hf_tok.tokenize(text)


@pytest.mark.parametrize("text", CASES)
def test_encode_parity(tok, hf_tok, text):
    ours = tok.encode_ids(text, 32)
    theirs = hf_tok.encode(text, truncation=True, max_length=32)
    assert ours == theirs


def test_batch_padding(tok):
    out = tok(["short", "a much longer sentence with several tokens"], max_length=64)
    assert out["input_ids"].shape == out["attention_mask"].shape
    assert out["input_ids"].dtype == np.int32
    # row 0 padded with pad_id where mask == 0
    pad_region = out["input_ids"][0][out["attention_mask"][0] == 0]
    assert (pad_region == tok.pad_id).all()


def test_bucket_padding(tok):
    out = tok(["short"], max_length=64, pad_to=64)
    assert out["input_ids"].shape == (1, 64)


def test_preprocessors():
    assert TextPreProcessors.to_lower(["AbC"]) == ["abc"]
    assert TextPreProcessors.blank_prefix(["x"]) == [" x"]
    assert TextPreProcessors.blank_prefix_lower(["X Y"]) == [" x y"]


def test_truncation_is_hf_style(tok, hf_tok):
    long_text = " ".join(["retrieval"] * 100)
    ours = tok.encode_ids(long_text, 16)
    assert len(ours) == 16
    assert ours[0] == tok.cls_id and ours[-1] == tok.sep_id


def test_tokenizer_json_wordpiece_parity(tok, tmp_path):
    """A dir shipping ONLY a fast-format tokenizer.json (common hub dump
    layout) must load natively and match the vocab.txt-built tokenizer."""
    import json

    from opensearch_sparse_model_tuning_sample_tpu.models.tokenizer import (
        load_tokenizer,
    )

    d = tmp_path / "fastonly"
    d.mkdir()
    blob = {
        "normalizer": {"type": "BertNormalizer", "lowercase": True},
        "model": {
            "type": "WordPiece",
            "continuing_subword_prefix": "##",
            "vocab": tok.vocab,
        },
    }
    (d / "tokenizer.json").write_text(json.dumps(blob))
    t2 = load_tokenizer(str(d))
    assert isinstance(t2, WordPieceTokenizer)
    assert t2.do_lower_case
    for s in CASES:
        assert t2.encode_ids(s, 64) == tok.encode_ids(s, 64)


def test_tokenizer_json_unsupported_type_raises(tmp_path):
    import json

    from opensearch_sparse_model_tuning_sample_tpu.models.tokenizer import (
        load_tokenizer,
    )

    d = tmp_path / "unigram"
    d.mkdir()
    (d / "tokenizer.json").write_text(json.dumps({"model": {"type": "Unigram"}}))
    with pytest.raises(ValueError, match="Unigram"):
        load_tokenizer(str(d))


def test_save_load_roundtrip_preserves_casing(tmp_path):
    """save_pretrained writes do_lower_case to tokenizer_config.json;
    from_pretrained must read it back — a cased vocab loaded as
    lowercasing encodes every id wrong with no error."""
    from opensearch_sparse_model_tuning_sample_tpu.models.tokenizer import (
        WordPieceTokenizer,
    )

    base = WordPieceTokenizer.from_pretrained(None, do_lower_case=False)
    out = str(tmp_path / "cased")
    base.save_pretrained(out)
    loaded = WordPieceTokenizer.from_pretrained(out)
    assert loaded.do_lower_case is False
    assert loaded.encode_ids("Apple Pie", 16) == base.encode_ids("Apple Pie", 16)
    # explicit kwarg still wins over the config file
    forced = WordPieceTokenizer.from_pretrained(out, do_lower_case=True)
    assert forced.do_lower_case is True
