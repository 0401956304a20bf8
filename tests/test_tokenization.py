"""TinyTokenizer invariants the rest of the framework relies on."""

import random
import string

import pytest

from icl_speech_text_llm_tpu.utils.tokenization import TinyTokenizer, get_tokenizer


@pytest.fixture(scope="module")
def tok():
    return TinyTokenizer()


def test_round_trip_ascii(tok):
    texts = [
        "Hello, world!",
        "You are a sentiment analysis expert.\nOutput:",
        "<Speech><SpeechHere></Speech>",
        "tabs\tand  double  spaces",
        "",
    ]
    for t in texts:
        assert tok.decode(tok.encode(t)) == t


def test_round_trip_unicode(tok):
    t = "café → αβγ"
    assert tok.decode(tok.encode(t)) == t


def test_special_tokens(tok):
    ids = tok.encode("hi", add_special_tokens=True)
    assert ids[0] == tok.bos_token_id
    assert tok.decode(ids) == "hi"
    assert tok.decode(ids, skip_special_tokens=False).startswith("<s>")


def test_two_token_symbol_property(tok):
    """Every 4-5 char lowercase word must be exactly 2 tokens and round-trip —
    the symbol adapter depends on this (ref: symbol_manager.py:126-159)."""
    rng = random.Random(0)
    for _ in range(200):
        word = "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.choice([4, 5])))
        ids = tok.encode(word, add_special_tokens=False)
        assert len(ids) == 2, (word, ids)
        assert tok.decode(ids) == word


def test_determinism_across_instances():
    a, b = TinyTokenizer(), TinyTokenizer()
    text = "The quick brown fox jumps over the lazy dog 0123!"
    assert a.encode(text) == b.encode(text)
    assert a.vocab_size == b.vocab_size


def test_get_tokenizer_default():
    tok = get_tokenizer()
    assert isinstance(tok, TinyTokenizer)
    assert tok.vocab_size > 30000


def test_vocab_ids_in_range(tok):
    ids = tok.encode("Some text with CAPS and punct?!")
    assert all(0 <= i < tok.vocab_size for i in ids)
