"""Text cleaning + text metadata — the byte-identity-critical kernels.

``clean_text`` reproduces the reference's whitespace contract exactly
(``/root/reference/src/scraper_app/scraper.py:36-40``): collapse every
Unicode-whitespace run (Python ``re`` ``\\s`` under default Unicode mode,
which includes NBSP ``\\xa0``) to a single ASCII space and strip; the
second blank-line pass in the reference is dead code (no ``\\n`` can
survive pass one) and is preserved here as a documented no-op for parity.

``create_text_metadata`` mirrors utils.py:269-275 — note that after
``clean_text`` no newline survives, so ``paragraph_count`` is 1 for any
non-empty text and 0 for empty: a reference quirk we preserve.
"""

from __future__ import annotations

import re
from typing import Dict

_WS_RUN = re.compile(r"\s+")          # scraper.py:38 — Unicode \s (incl. \xa0)
_BLANK_LINES = re.compile(r"\n\s*\n")  # scraper.py:39 — dead after pass one


def clean_text(text: str) -> str:
    """Whitespace-collapse + strip. Byte-identical to scraper.py:36-40."""
    text = _WS_RUN.sub(" ", text).strip()
    text = _BLANK_LINES.sub("\n", text)  # intentional no-op (parity)
    return text.strip()


def create_text_metadata(text: str) -> Dict[str, int]:
    """{text_length, word_count, paragraph_count}. utils.py:269-275."""
    return {
        "text_length": len(text),
        "word_count": len(text.split()),
        "paragraph_count": len([p for p in text.split("\n") if p.strip()]),
    }
