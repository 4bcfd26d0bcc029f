"""Native (C++) BPE merge loop vs the pure-Python reference algorithm."""

import numpy as np
import pytest

from egm_unet_tpu.models.clip.tokenizer import SimpleTokenizer
from egm_unet_tpu.native import load_library

MERGES = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
          ("w", "o"), ("r", "l"), ("d", "</w>"), ("wo", "rl"),
          ("e", "l"), ("el", "l"), ("a", "b"), ("ab", "ab")]


@pytest.fixture(scope="module")
def toks():
    native = SimpleTokenizer(merges=MERGES, native=True)
    python = SimpleTokenizer(merges=MERGES, native=False)
    if native._native is None:
        pytest.skip("native toolchain unavailable")
    return native, python


def test_library_builds():
    assert load_library("bpe") is not None


def test_native_matches_python_on_words(toks):
    native, python = toks
    for text in ["hello", "world", "hello world", "abab", "ababab",
                 "a", "zzz", "hell", "ello", "llll", "hello, world!"]:
        assert native.encode(text) == python.encode(text), text


def test_native_matches_python_random(toks, rng):
    native, python = toks
    alphabet = "helowrdab "
    for _ in range(200):
        n = int(rng.integers(1, 20))
        text = "".join(alphabet[i] for i in rng.integers(0, len(alphabet), n))
        assert native.encode(text) == python.encode(text), repr(text)


def test_decode_roundtrip(toks):
    native, _ = toks
    ids = native.encode("hello world")
    assert native.decode(ids).strip() == "hello world"
