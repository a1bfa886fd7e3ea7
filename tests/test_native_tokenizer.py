"""Parity of the native C++ CLIP BPE tokenizer against transformers
CLIPTokenizer, using a synthetic vocab/merges pair (the real CLIP vocab is
not shipped in this image)."""

import json
import os
import subprocess

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def toy_tokenizer_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    # byte-level alphabet plus merged subwords with </w> end-of-word marks
    words = ["a", "b", "c", "d", "e", "h", "l", "o", "r", "t", "w", "1", "2", "!", ","]
    vocab = {}
    i = 0
    for ch in words:
        vocab[ch] = i; i += 1
        vocab[ch + "</w>"] = i; i += 1
    merges = []
    for pair, merged in [
        (("h", "e"), "he"), (("l", "l"), "ll"), (("he", "ll"), "hell"),
        (("hell", "o</w>"), "hello</w>"), (("w", "o"), "wo"),
        (("r", "l"), "rl"), (("wo", "rl"), "worl"), (("worl", "d</w>"), "world</w>"),
        (("c", "a"), "ca"), (("ca", "t</w>"), "cat</w>"),
    ]:
        merges.append(f"{pair[0]} {pair[1]}")
        vocab[merged] = i; i += 1
    bos, eos = i, i + 1
    vocab["<|startoftext|>"] = bos
    vocab["<|endoftext|>"] = eos
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    return str(d), bos, eos


def test_native_bpe_matches_transformers(toy_tokenizer_files):
    d, bos, eos = toy_tokenizer_files
    hf = transformers.CLIPTokenizer(
        os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt")
    )
    from pcm_tpu.data.native_tokenizer import NativeCLIPTokenizer

    native = NativeCLIPTokenizer(
        os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt"),
        max_length=16, bos_id=bos, eos_id=eos,
    )

    texts = [
        "hello world",
        "Hello, Cat!",
        "a cat 12",
        "",
        "woooo hell hello hello",
    ]
    ours = native(texts)
    ref = hf(
        texts, padding="max_length", max_length=16, truncation=True, return_tensors="np"
    )["input_ids"]
    np.testing.assert_array_equal(ours, ref)


def test_resolve_tokenizers_routing(toy_tokenizer_files):
    """CLI tokenizer resolution (round-3 VERDICT #8): CLIP towers pick the
    native C++ BPE when vocab.json+merges.txt exist, the T5 tower stays on
    transformers, and the hash fallback is opt-in with per-tower vocab bounds
    (T5 ids must stay < 32128 or the embedding gather goes out of bounds)."""
    import pytest

    from pcm_tpu.data.native_tokenizer import NativeCLIPTokenizer
    from pcm_tpu.data.tokenizer import HashTokenizer, resolve_tokenizers

    d, bos, eos = toy_tokenizer_files
    toks = resolve_tokenizers(d, ["input_ids", "input_ids_2"], max_length=16)
    assert all(isinstance(t, NativeCLIPTokenizer) for t in toks.values())

    with pytest.raises(FileNotFoundError):
        resolve_tokenizers(None, ["input_ids"])

    hashed = resolve_tokenizers(None, ["input_ids", "input_ids_3"], allow_hash=True)
    assert isinstance(hashed["input_ids"], HashTokenizer)
    ids3 = hashed["input_ids_3"](["a photo of a cat wearing a tiny hat"])
    assert int(ids3.max()) < 32128
    ids1 = hashed["input_ids"](["a photo of a cat wearing a tiny hat"])
    assert int(ids1.max()) < 49408
