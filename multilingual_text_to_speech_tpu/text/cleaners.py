"""Text cleaning operations (reference: /root/reference/utils/text.py:99-112)."""

from __future__ import annotations

import re


def to_lower(text: str) -> str:
    return text.lower()


def remove_odd_whitespaces(text: str) -> str:
    """Collapse runs of whitespace and strip leading/trailing whitespace."""
    return " ".join(text.split())


def remove_punctuation(text: str, hp) -> str:
    """Strip every character listed in hp.punctuations_{out,in}."""
    chars = hp.punctuations_out + hp.punctuations_in
    pattern = "[" + re.escape(chars) + "]"
    return re.sub(pattern, "", text)


def clean_text(text: str, hp) -> str:
    """Apply the hp-controlled cleaning pipeline used by the dataset layer
    and synthesis CLI (reference: dataset/dataset.py:103-116,
    synthesize.py:46-51)."""
    if not hp.use_punctuation:
        text = remove_punctuation(text, hp)
    if not hp.case_sensitive:
        text = to_lower(text)
    if hp.remove_multiple_wspaces:
        text = remove_odd_whitespaces(text)
    return text
