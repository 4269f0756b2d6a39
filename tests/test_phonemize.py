"""Phonemization logic tests with a fake IPA backend (espeak/epitran are
optional host deps not present in CI; the punctuation re-insertion weave is
pure Python and fully testable)."""

import pytest

from multilingual_text_to_speech_tpu.config import HParams
from multilingual_text_to_speech_tpu.text import phonemize as ph


@pytest.fixture
def fake_backend(monkeypatch):
    """Deterministic fake: word -> '<WORD' + trailing separator space
    (the real backend returns a trailing separator that callers strip)."""
    calls = []

    def fake(text, language):
        calls.append((text, language))
        return f"<{text.upper()}> "

    monkeypatch.setattr(ph, "phonemize_word", fake)
    return calls


def test_to_phoneme_plain_words(fake_backend):
    hp = HParams()
    out = ph.to_phoneme("hallo welt", False, "de", hp)
    assert out == "<HALLO> <WELT>"


def test_to_phoneme_preserves_punctuation(fake_backend):
    hp = HParams()
    out = ph.to_phoneme("hallo, welt!", False, "de", hp)
    assert out == "<HALLO>, <WELT>!"


def test_to_phoneme_in_word_punctuation_dropped(fake_backend):
    # punctuations_in ('-) inside a word are consumed by the phonemizer
    hp = HParams()
    out = ph.to_phoneme("jean-paul ok", False, "fr", hp)
    assert out == "<JEANPAUL> <OK>"


def test_to_phoneme_uses_dictionary_cache(fake_backend):
    hp = HParams()
    cache = {"hallo": "[HALLO]"}
    out = ph.to_phoneme("hallo welt", False, "de", hp, cache)
    assert out == "[HALLO] <WELT>"
    # only the uncached word hit the backend
    assert [c[0] for c in fake_backend] == ["welt"]


def test_to_phoneme_ignore_punctuation(fake_backend):
    hp = HParams()
    out = ph.to_phoneme("hallo, welt!", True, "de", hp)
    # whole cleaned text goes through in one call, trailing char stripped
    assert out == "<HALLO WELT>"
    assert fake_backend == [("hallo welt", "de")]


def test_build_phoneme_dicts(fake_backend):
    hp = HParams()
    pairs = [("hallo welt", "de"), ("welt und mehr", "de"),
             ("bonjour", "fr")]
    dicts = ph.build_phoneme_dicts(pairs, hp)
    assert set(dicts) == {"de", "fr"}
    assert set(dicts["de"]) == {"hallo", "welt", "und", "mehr"}
    assert dicts["de"]["welt"] == "<WELT>"
    assert dicts["fr"]["bonjour"] == "<BONJOUR>"
    # each unique (word, lang) phonemized exactly once
    assert len(fake_backend) == 5


def test_missing_backend_raises():
    # with neither phonemizer nor epitran installed the call must raise a
    # clear error (both are absent in this environment)
    if ph._HAS_PHONEMIZER or ph._HAS_EPITRAN:
        pytest.skip("a real phonemization backend is installed")
    with pytest.raises(RuntimeError, match="No phonemization backend"):
        ph.phonemize_word("hello", "en-us")
