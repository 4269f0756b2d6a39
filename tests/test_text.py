"""Text frontend tests: symbol tables, cleaning, sequence round-trip."""

import pytest

from multilingual_text_to_speech_tpu.config import HParams
from multilingual_text_to_speech_tpu.text import (
    EOS_ID,
    PAD_ID,
    UNK_ID,
    SymbolTable,
    clean_text,
    remove_odd_whitespaces,
    remove_punctuation,
    to_sequence,
    to_text,
)


def test_special_ids():
    hp = HParams()
    table = SymbolTable(hp)
    assert table.symbol_to_id["_"] == PAD_ID == 0
    assert table.symbol_to_id["~"] == EOS_ID == 1
    assert table.symbol_to_id["@"] == UNK_ID == 2


def test_table_size_matches_hp():
    hp = HParams()
    assert len(SymbolTable(hp)) == hp.total_symbols()
    hp.use_phonemes = True
    assert len(SymbolTable(hp)) == hp.total_symbols()


def test_sequence_appends_eos_and_maps_unknown():
    hp = HParams()
    seq = to_sequence("Hi€", hp)
    assert seq[-1] == EOS_ID
    assert seq[-2] == UNK_ID  # € not in alphabet
    assert len(seq) == 4


def test_roundtrip():
    hp = HParams()
    text = "Hello, world! it's a test."
    seq = to_sequence(text, hp)
    assert to_text(seq, hp) == text


def test_decode_stops_at_eos():
    hp = HParams()
    seq = to_sequence("abc", hp) + to_sequence("xyz", hp)
    assert to_text(seq, hp) == "abc"


def test_ordering_matches_reference_layout():
    # [PAD, EOS, UNK] + punctuations_in + punctuations_out + alphabet
    hp = HParams()
    table = SymbolTable(hp)
    n_special = 3
    n_in = len(hp.punctuations_in)
    assert table.symbols[n_special : n_special + n_in] == list(hp.punctuations_in)
    assert table.symbols[n_special + n_in : n_special + n_in + len(hp.punctuations_out)] == list(
        hp.punctuations_out
    )
    assert "".join(table.symbols[n_special + n_in + len(hp.punctuations_out):]) == hp.characters


def test_remove_punctuation():
    hp = HParams()
    assert remove_punctuation("a,b.c-d'e!", hp) == "abcde"


def test_remove_odd_whitespaces():
    assert remove_odd_whitespaces("  a   b \t c  ") == "a b c"


def test_clean_text_pipeline():
    hp = HParams()
    hp.case_sensitive = False
    hp.use_punctuation = False
    assert clean_text("  Hello,   World!  ", hp) == "hello world"


def test_clean_text_preserves_punct_when_enabled():
    hp = HParams()
    assert clean_text("Hello,  World!", hp) == "Hello, World!"
