"""Tokenizer oracle parity vs the transformers slow tokenizers.

The reference tokenizes through hub packages (OpenCLIP tokenizer for
retrieval text features, the SDXL CLIP tokenizers inside diffusers, BERT
WordPiece for GIT). Our pure-Python implementations must match them
token-for-token; transformers' slow tokenizers (installed) are the oracle,
loaded from vocab files written by the test so no downloads are needed.
"""

import json

import numpy as np
import pytest

from eeg_image_decode_tpu.data.tokenizers import (
    CLIPBPETokenizer,
    WordPieceTokenizer,
    bytes_to_unicode,
)

CLIP_MERGES = [
    ("h", "e</w>"), ("t", "he</w>"), ("l", "l"), ("ll", "o</w>"),
    ("h", "e"), ("he", "ll"), ("hell", "o</w>"), ("w", "o"), ("r", "l"),
    ("wo", "rl"), ("worl", "d</w>"), ("i", "s</w>"), ("a", "n</w>"),
    ("t", "h"), ("th", "is</w>"), ("c", "a"), ("ca", "t</w>"),
    ("1", "2"), ("'", "s</w>"), (".", "."), ("..", ".</w>"),
]


def _write_clip_vocab(tmp_path):
    chars = list(bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    for a, b in CLIP_MERGES:
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vocab_file = tmp_path / "vocab.json"
    merges_file = tmp_path / "merges.txt"
    vocab_file.write_text(json.dumps(vocab))
    merges_file.write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in CLIP_MERGES)
    )
    return str(vocab_file), str(merges_file)


CLIP_BATTERY = [
    "",
    "hello world",
    "This picture is a cat",
    "  Multiple   spaces\tand\nnewlines  ",
    "it's the cat's hello",
    "punctuation!!! ... (brackets) [ok]",
    "MiXeD CaSe HELLO",
    "numbers 123 45",
    "hyphen-ated co-operate",
    "a" * 200,  # truncation past context_length
    "ünïcödé ça va",
    "emoji 🌍 test",
]


@pytest.fixture(scope="module")
def clip_files(tmp_path_factory):
    return _write_clip_vocab(tmp_path_factory.mktemp("clipvocab"))


def test_clip_bpe_matches_transformers(clip_files):
    from transformers import CLIPTokenizer

    vocab_file, merges_file = clip_files
    hf = CLIPTokenizer(vocab_file, merges_file)
    ours = CLIPBPETokenizer.from_files(vocab_file, merges_file)
    for text in CLIP_BATTERY:
        ref = hf(text, padding="max_length", truncation=True,
                 max_length=77)["input_ids"]
        got = ours([text])[0].tolist()
        assert got == ref, f"mismatch on {text!r}:\n{got}\n{ref}"


def test_clip_bpe_sdxl_tokenizer2_padding(clip_files):
    """SDXL's tokenizer_2 pads with '!' (id of the '!' byte token)."""
    from transformers import CLIPTokenizer

    vocab_file, merges_file = clip_files
    hf = CLIPTokenizer(vocab_file, merges_file, pad_token="!")
    ours = CLIPBPETokenizer.from_files(vocab_file, merges_file, pad_token="!")
    for text in ("", "hello world", "cat"):
        ref = hf(text, padding="max_length", truncation=True,
                 max_length=77)["input_ids"]
        got = ours([text])[0].tolist()
        assert got == ref
    assert ours.pad_id == ours.encoder["!"]


def test_clip_bpe_decode_roundtrip(clip_files):
    vocab_file, merges_file = clip_files
    ours = CLIPBPETokenizer.from_files(vocab_file, merges_file)
    ids = ours(["hello world"])[0]
    assert ours.decode(ids) == "hello world"


def test_clip_bpe_empty_prompt_shape(clip_files):
    """'' → [BOS, EOS, pad...]; this is what SDXL encode_prompt('') sees."""
    vocab_file, merges_file = clip_files
    ours = CLIPBPETokenizer.from_files(vocab_file, merges_file)
    ids = ours([""])
    assert ids.shape == (1, 77)
    assert ids[0, 0] == ours.bos_id and ids[0, 1] == ours.eos_id
    assert (ids[0, 2:] == ours.pad_id).all()


WP_VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "a", "an", "the", "cat", "dog", "picture", "photo", "of", "this", "is",
    "run", "##ning", "##s", "walk", "##ed", "hello", "world", "un", "##want",
    "##ed", ",", ".", "!", "?", "'", "12", "##3", "co", "##op",
]


@pytest.fixture(scope="module")
def wp_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("wpvocab") / "vocab.txt"
    p.write_text("\n".join(WP_VOCAB) + "\n")
    return str(p)


WP_BATTERY = [
    "",
    "a photo of a cat",
    "hello world!",
    "running walked unwanted",
    "The Cat, the DOG.",
    "123 cooop",
    "outofvocab words here",
    "accénted café",
    "a " * 60,  # truncation
]


def test_wordpiece_matches_transformers(wp_file):
    from transformers import BertTokenizer

    hf = BertTokenizer(wp_file)
    ours = WordPieceTokenizer.from_file(wp_file)
    for text in WP_BATTERY:
        ref = hf(text, padding="max_length", truncation=True,
                 max_length=16)["input_ids"]
        got = ours([text], max_length=16)[0].tolist()
        assert got == ref, f"mismatch on {text!r}:\n{got}\n{ref}"


def test_wordpiece_decode(wp_file):
    ours = WordPieceTokenizer.from_file(wp_file)
    ids = ours(["running hello"], max_length=16)[0]
    assert ours.decode(ids) == "running hello"


def test_wordpiece_outputs_int32(wp_file):
    ours = WordPieceTokenizer.from_file(wp_file)
    out = ours(["a cat", "dog"], max_length=8)
    assert out.dtype == np.int32 and out.shape == (2, 8)
