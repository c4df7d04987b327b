"""Exercise the REAL HF tokenizer branch of `data.loader.Tokenizer`.

Every other test runs offline and therefore hits the crc32 hash fallback
(`loader.py::Tokenizer._fallback`). Real-data parity (EgoMCQ within 0.5% of
the reference, BASELINE.md) hinges on exact roberta-base tokenization
(`/root/reference/EgoVLPv2/trainer/trainer_egoclip.py:120` tokenizes with
`RobertaTokenizer.from_pretrained("roberta-base")`), so the HF branch —
`local_files_only` resolution, the real `__call__` encode with
padding/truncation, int32 casts, and `vocab_cap` remapping over real
tokenizer output — needs coverage too.

The actual roberta-base vocab is not fetchable offline; instead we write a
miniature tokenizer in RoBERTa's own on-disk format (byte-level BPE
vocab.json + merges.txt + tokenizer_config.json) and point the adapter at
the directory. Same transformers code path, tiny vocab.
"""

import json

import numpy as np
import pytest

from egovlpv2_tpu.data.loader import Tokenizer

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def mini_roberta_dir(tmp_path_factory):
    """A complete on-disk RoBERTa-format tokenizer with a byte-level vocab."""
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    d = tmp_path_factory.mktemp("mini_roberta")
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for ch in bytes_to_unicode().values():  # the 256 byte-level symbols
        if ch not in vocab:
            vocab[ch] = len(vocab)
    # a couple of real merges so the BPE loop runs
    merges = ["#version: 0.2", "t h", "th e", "Ġ t", "Ġt h", "Ġth e"]
    for tok in ("th", "the", "Ġt", "Ġth", "Ġthe"):
        vocab[tok] = len(vocab)
    vocab["<mask>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("\n".join(merges) + "\n")
    (d / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "RobertaTokenizer", "model_max_length": 512}))
    return str(d)


def test_real_hf_branch_loads_and_encodes(mini_roberta_dir):
    tok = Tokenizer(mini_roberta_dir, max_len=15, allow_fallback=False)
    assert tok._tok is not None, "fixture must take the real HF branch"

    out = tok(["the cat", "the the the"])
    ids, mask = out["text_ids"], out["text_mask"]
    assert ids.shape == (2, 15) and mask.shape == (2, 15)
    assert ids.dtype == np.int32 and mask.dtype == np.int32
    # RoBERTa framing: <s> ... </s> then <pad> to max_len, mask marks non-pad
    assert (ids[:, 0] == 0).all()
    for r in range(2):
        n = int(mask[r].sum())
        assert ids[r, n - 1] == 2  # </s> closes the real tokens
        assert (ids[r, n:] == 1).all()  # <pad> after
        assert (mask[r, :n] == 1).all()
    # "the" merged to a single id by the BPE merges => both rows differ
    assert not np.array_equal(ids[0], ids[1])


def test_real_hf_branch_truncates(mini_roberta_dir):
    tok = Tokenizer(mini_roberta_dir, max_len=6, allow_fallback=False)
    out = tok(["the " * 50])
    assert out["text_ids"].shape == (1, 6)
    assert int(out["text_mask"].sum()) == 6  # fully used, truncated


def test_vocab_cap_remaps_real_ids(mini_roberta_dir):
    cap = 8
    tok = Tokenizer(mini_roberta_dir, max_len=15, allow_fallback=False,
                    vocab_cap=cap)
    out = tok(["the quick brown fox", "zzzz"])
    ids = out["text_ids"]
    assert ids.max() < cap
    # special ids below the cap survive untouched
    assert (ids[:, 0] == 0).all()
    assert (ids == 1).any()  # padding intact
    # remapped ids avoid the special range (>= 4)
    specials = {0, 1, 2, 3}
    real = set(np.unique(ids).tolist()) - specials
    assert real and all(4 <= i < cap for i in real)


def test_contract_matches_fallback(mini_roberta_dir):
    """Real branch and offline fallback expose identical batch contracts."""
    real = Tokenizer(mini_roberta_dir, max_len=15, allow_fallback=False)
    fb = Tokenizer("definitely-not-a-model-xyz", max_len=15)
    assert fb._tok is None
    a, b = real(["the cat"]), fb(["the cat"])
    assert set(a) == set(b)
    for k in a:
        assert a[k].shape == b[k].shape and a[k].dtype == b[k].dtype
