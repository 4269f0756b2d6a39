"""Symbol tables and text<->ID sequence conversion.

Matches the reference contract (``/root/reference/utils/text.py:11-17,115-131``):
the ID space is ``[PAD, EOS, UNK] + punctuations_in + punctuations_out +
(characters | phonemes)``, unknown symbols map to UNK, and an EOS is appended
to every sequence.  PAD is ID 0 so padded batches embed to the zero row of a
``padding_idx``-style embedding.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

PAD = "_"   # padding (ID 0)
EOS = "~"   # end of sequence; characters after it are invalid
UNK = "@"   # substitute for out-of-alphabet symbols

PAD_ID = 0
EOS_ID = 1
UNK_ID = 2


class SymbolTable:
    """Bidirectional symbol<->ID mapping derived from hyper-parameters."""

    def __init__(self, hp, use_phonemes: bool | None = None):
        if use_phonemes is None:
            use_phonemes = hp.use_phonemes
        alphabet = hp.phonemes if use_phonemes else hp.characters
        specials: List[str] = [PAD, EOS, UNK]
        specials += list(hp.punctuations_in) + list(hp.punctuations_out)
        self.symbols: List[str] = specials + list(alphabet)
        self.symbol_to_id: Dict[str, int] = {
            s: i for i, s in enumerate(self.symbols)
        }

    def __len__(self) -> int:
        return len(self.symbols)

    def encode(self, text: str) -> List[int]:
        """Text -> IDs with a trailing EOS; unknown symbols become UNK."""
        seq = [self.symbol_to_id.get(c, UNK_ID) for c in text]
        seq.append(EOS_ID)
        return seq

    def encode_array(self, text: str, dtype=np.int32) -> np.ndarray:
        return np.asarray(self.encode(text), dtype=dtype)

    def decode(self, sequence: Sequence[int]) -> str:
        """IDs -> text, stopping at the first EOS; unknown IDs are skipped."""
        out = []
        for sid in sequence:
            if 0 <= int(sid) < len(self.symbols):
                s = self.symbols[int(sid)]
                if s == EOS:
                    break
                out.append(s)
        return "".join(out)


def to_sequence(text: str, hp, use_phonemes: bool = False) -> List[int]:
    """Reference-compatible helper (utils/text.py:115-120)."""
    return SymbolTable(hp, use_phonemes).encode(text)


def to_text(sequence: Sequence[int], hp, use_phonemes: bool = False) -> str:
    """Reference-compatible helper (utils/text.py:123-131)."""
    return SymbolTable(hp, use_phonemes).decode(sequence)
