"""Text frontend: symbol tables, cleaning, grapheme/phoneme sequences.

Feature-parity rebuild of ``/root/reference/utils/text.py`` — pure host-side
Python (sequences are produced once per utterance during data prep; the
device only ever sees integer ID arrays).
"""

from multilingual_text_to_speech_tpu.text.symbols import (
    PAD,
    EOS,
    UNK,
    PAD_ID,
    EOS_ID,
    UNK_ID,
    SymbolTable,
    to_sequence,
    to_text,
)
from multilingual_text_to_speech_tpu.text.cleaners import (
    to_lower,
    remove_odd_whitespaces,
    remove_punctuation,
    clean_text,
)
from multilingual_text_to_speech_tpu.text.phonemize import (
    phonemize_word,
    to_phoneme,
    build_phoneme_dicts,
)

__all__ = [
    "PAD", "EOS", "UNK", "PAD_ID", "EOS_ID", "UNK_ID",
    "SymbolTable", "to_sequence", "to_text",
    "to_lower", "remove_odd_whitespaces", "remove_punctuation", "clean_text",
    "phonemize_word", "to_phoneme", "build_phoneme_dicts",
]
