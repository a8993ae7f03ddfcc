"""Tokenizer tests: BPE correctness on a constructed vocab + fallback."""

import json

import numpy as np

from cfgpp_tpu.weights.tokenizer import CLIPTokenizer, HashTokenizer, load_tokenizer


def _mini_tokenizer(tmp_path, pad_token_id=None):
    # Tiny byte-level BPE vocab: single chars + a few merges.
    base = ["h", "e", "l", "o", "w", "r", "d", "a", "t", "c",
            "h</w>", "e</w>", "l</w>", "o</w>", "w</w>", "r</w>", "d</w>",
            "a</w>", "t</w>", "c</w>"]
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("o</w>", ""),  # unused dummy
              ("hell", "o</w>")]
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>")]
    vocab = {}
    for tok in base:
        vocab[tok] = len(vocab)
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))
    return CLIPTokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"),
                         pad_token_id=pad_token_id), vocab


def test_bpe_merges_word(tmp_path):
    tok, vocab = _mini_tokenizer(tmp_path)
    ids = tok.encode("hello")
    assert ids == [vocab["hello</w>"]]


def test_bpe_unmerged_chars(tmp_path):
    tok, vocab = _mini_tokenizer(tmp_path)
    # "wat" has no merges: w, a, t</w>
    assert tok.encode("wat") == [vocab["w"], vocab["a"], vocab["t</w>"]]


def test_padding_and_special_tokens(tmp_path):
    tok, vocab = _mini_tokenizer(tmp_path)
    out = tok(["hello hello", ""])
    assert out.shape == (2, 77)
    bos, eos = vocab["<|startoftext|>"], vocab["<|endoftext|>"]
    assert list(out[0][:4]) == [bos, vocab["hello</w>"], vocab["hello</w>"], eos]
    assert (out[0][4:] == eos).all()          # SD pads with EOS
    assert list(out[1][:2]) == [bos, eos]


def test_custom_pad_token(tmp_path):
    tok, vocab = _mini_tokenizer(tmp_path, pad_token_id=0)
    out = tok(["hello"])
    assert (out[0][3:] == 0).all()            # SDXL tokenizer_2 pads with "!"


def test_whitespace_and_case(tmp_path):
    tok, _ = _mini_tokenizer(tmp_path)
    assert tok.encode("  HELLO \n hello ") == tok.encode("hello hello")


def test_hash_fallback_deterministic():
    tok = HashTokenizer(vocab_size=1000, eos_token_id=999)
    a = tok(["a cat sat"])
    b = tok(["a cat sat"])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (1, 77)
    assert a[0, 0] == 998          # bos
    assert (a[0] < 1000).all()


def test_load_tokenizer_fallback_without_files(tmp_path, monkeypatch):
    monkeypatch.delenv("CFGPP_TOKENIZER_DIR", raising=False)
    tok = load_tokenizer(None, vocab_size=1000, eos_token_id=999)
    assert isinstance(tok, HashTokenizer)
    tok2 = load_tokenizer(str(tmp_path))      # dir without vocab files
    assert isinstance(tok2, HashTokenizer)
