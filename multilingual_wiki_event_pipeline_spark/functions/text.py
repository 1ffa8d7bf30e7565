"""Deterministic text kernels shared by the Spark pipeline, the corpus
generator, and the pure-Python oracle.

The reference tokenizes with spaCy (reference pilot_utils.py:370-395); our
engine replaces that with a deterministic whitespace tokenizer so that the
oracle and the distributed pipeline agree byte-for-byte. Both sides import
THIS module — tokenization is part of the engine's contract, parity is
checked on the downstream artifacts (mention alignment, SRL triples,
coref clusters, RDF triples).
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"\S+")

TURN_SEPARATOR = "\n"


def tokenize(text: str) -> list[tuple[int, str]]:
    """Maximal non-whitespace runs with char offsets: [(offset, surface)].

    Token ids are 1-based positions in this list (reference NAF wf/term ids
    ``w1../t1..``, xml_utils.py:190-215).
    """
    return [(m.start(), m.group(0)) for m in _TOKEN_RE.finditer(text)]


def assemble_document(turn_texts: list[str]) -> str:
    """Document content = turn texts joined by TURN_SEPARATOR in turn order.

    Turn texts are never rewritten (per-turn byte equality invariant);
    assembly is pure concatenation so every turn is recoverable.
    """
    return TURN_SEPARATOR.join(turn_texts)


def first_section(content: str) -> str:
    """Reference F1 truncation (pilot_utils.py:142):
    ``content.split('==')[0].strip()``."""
    return content.split("==")[0].strip()


YEAR_RANGE_RE = re.compile(r".*[1-2]([0-9]){3}-[1-2]([0-9]){3}.*$")


def check_ref_text(content: str, name: str, min_chars: int = 100, max_chars: int = 10000) -> bool:
    """Reference F2 filter (pilot_utils.py:98-104): length range on content
    plus year-range-title rejection."""
    n = len(content)
    if n < min_chars or n > max_chars:
        return False
    if YEAR_RANGE_RE.match(name):
        return False
    return True


def offset_alignment_maps(tokens: list[tuple[int, str]]) -> tuple[dict[int, int], dict[int, int]]:
    """start-offset -> tid and end-offset -> tid maps (1-based tids).

    Mirrors reference xml_utils.py:237-258 (there wf offsets feed wid->tid;
    our terms are 1:1 with tokens).
    """
    start2tid: dict[int, int] = {}
    end2tid: dict[int, int] = {}
    for i, (off, surface) in enumerate(tokens, start=1):
        start2tid[off] = i
        end2tid[off + len(surface)] = i
    return start2tid, end2tid
