"""Language-agnostic text normalization for WER evaluation.

Behavioral parity target: reference ``whisper/normalizers/basic.py`` —
lowercase, strip bracketed/parenthesized asides, replace markers/symbols/
punctuation with spaces, optionally drop diacritics (NFKD + a manual table of
non-decomposing letters), optionally split into graphemes.
"""

import re
import unicodedata

import regex

# non-ASCII letters whose base form NFKD does not separate
_LETTER_FOLDS = {
    "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O",
    "æ": "ae", "Æ": "AE",
    "ß": "ss", "ẞ": "SS",
    "đ": "d", "Đ": "D",
    "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "th",
    "ł": "l", "Ł": "L",
}


def remove_symbols_and_diacritics(s: str, keep: str = "") -> str:
    """Replace markers/symbols/punctuation with a space and drop diacritics."""

    def fold(c: str) -> str:
        if c in keep:
            return c
        if c in _LETTER_FOLDS:
            return _LETTER_FOLDS[c]
        category = unicodedata.category(c)
        if category == "Mn":  # combining mark: drop
            return ""
        if category[0] in "MSP":  # marks, symbols, punctuation: space out
            return " "
        return c

    return "".join(fold(c) for c in unicodedata.normalize("NFKD", s))


def remove_symbols(s: str) -> str:
    """Replace markers/symbols/punctuation with a space, keeping diacritics."""
    return "".join(
        " " if unicodedata.category(c)[0] in "MSP" else c
        for c in unicodedata.normalize("NFKC", s)
    )


class BasicTextNormalizer:
    def __init__(self, remove_diacritics: bool = False, split_letters: bool = False):
        self.clean = (
            remove_symbols_and_diacritics if remove_diacritics else remove_symbols
        )
        self.split_letters = split_letters

    def __call__(self, s: str) -> str:
        s = s.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)  # drop [bracketed] annotations
        s = re.sub(r"\(([^)]+?)\)", "", s)  # drop (parenthesized) asides
        s = self.clean(s).lower()

        if self.split_letters:
            s = " ".join(regex.findall(r"\X", s, regex.U))

        s = re.sub(r"\s+", " ", s)
        return s
