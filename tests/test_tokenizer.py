"""CLIP BPE tokenizer golden tests vs the reference implementation.

The reference's method/simple_tokenizer.py imports ftfy, which is not in
this image — a no-op stand-in is registered so the reference module loads;
our tokenizer skips ftfy the same way when it is unimportable, so both
stacks apply identical cleaning and the comparison is exact.
"""

import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "method")),
    reason="reference source tree not available")

SAMPLES = [
    "a man is talking to a woman",
    "The QUICK brown fox; jumped over 12 lazy dogs!!",
    "it's   whitespace\t\tmess\n\nhere",
    "don't stop believin' — hold on to that feelin'",
    "numbers 1234567890 and punctuation #$%^&*()",
    "café naïve résumé über",
    "日本語のテキスト",
    "emoji \U0001f600\U0001f680 mixed with text",
    "HTML entities &amp;amp; &lt;tag&gt;",
    "hyphen-ated words and under_scores",
    "a",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "query with <|endoftext|> special marker",
    "  leading and trailing   ",
]


@pytest.fixture(scope="module")
def tokenizers():
    installed_stub = False
    if "ftfy" not in sys.modules:
        import importlib.machinery

        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda t, **kw: t
        # a real ModuleSpec so other packages probing availability via
        # importlib.util.find_spec don't crash on the stub
        stub.__spec__ = importlib.machinery.ModuleSpec("ftfy", loader=None)
        sys.modules["ftfy"] = stub
        installed_stub = True
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from method.simple_tokenizer import SimpleTokenizer

    from dldkd_tpu.tools.clip_tokenizer import ClipTokenizer

    yield ClipTokenizer(), SimpleTokenizer()
    if installed_stub:
        sys.modules.pop("ftfy", None)


def test_vocab_matches_reference(tokenizers):
    ours, ref = tokenizers
    assert ours.encoder == ref.encoder
    assert ours.sot_id == ref.encoder["<|startoftext|>"] == 49406
    assert ours.eot_id == ref.encoder["<|endoftext|>"] == 49407


@pytest.mark.parametrize("text", SAMPLES)
def test_encode_matches_reference(tokenizers, text):
    ours, ref = tokenizers
    assert ours.encode(text) == ref.encode(text)


@pytest.mark.parametrize("text", SAMPLES)
def test_decode_matches_reference(tokenizers, text):
    ours, ref = tokenizers
    ids = ref.encode(text)
    assert ours.decode(ids) == ref.decode(ids)


def test_tokenize_batch_contract(tokenizers):
    """The fixed-length model-input layout used by extract_teacher:
    <sot> ids <eot>, eot-padded, mask over real tokens; truncation keeps
    the trailing eot; CLIP's argmax-id pooling position is the first eot."""
    ours, ref = tokenizers
    texts = ["a man is talking", "x " * 200]  # second one must truncate
    out = ours.tokenize(texts, context_length=77)
    ids, mask = out["input_ids"], out["attention_mask"]
    assert ids.shape == mask.shape == (2, 77)

    body = ref.encode(texts[0])
    row = [49406] + body + [49407]
    assert list(ids[0, :len(row)]) == row
    assert (ids[0, len(row):] == 49407).all()
    assert mask[0].sum() == len(row)
    # argmax finds the REAL eot even under eot-padding
    assert int(np.argmax(ids[0])) == len(row) - 1

    assert mask[1].sum() == 77
    assert ids[1, 0] == 49406 and ids[1, 76] == 49407
    assert (ids[1, 1:76] == np.asarray(ref.encode(texts[1]))[:75]).all()


def test_build_tokenize_fn():
    from dldkd_tpu.tools.extract_teacher import build_tokenize_fn

    fn = build_tokenize_fn()
    out = fn(["two captions", "about a video"])
    assert out["input_ids"].shape == (2, 77)
    assert out["attention_mask"].dtype == np.int32
