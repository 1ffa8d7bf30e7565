"""Property-based tests (hypothesis) for the pure kernels the engine and
oracle share — these are the contract pieces whose failure would silently
break parity on corpora the fixtures don't cover.

No Spark session: everything here is driver-side Python, so the suite
stays fast and can fuzz broadly.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from multilingual_wiki_event_pipeline_spark.functions.text import (
    TURN_SEPARATOR,
    assemble_document,
    first_section,
    offset_alignment_maps,
    tokenize,
)

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@given(texts)
@settings(max_examples=200)
def test_tokenize_offsets_slice_text(s):
    """Every token's (offset, surface) slices the original text, tokens are
    non-overlapping left-to-right maximal non-whitespace runs."""
    toks = tokenize(s)
    prev_end = -1
    for off, surf in toks:
        assert s[off:off + len(surf)] == surf
        assert surf and not any(c.isspace() for c in surf)
        assert off > prev_end  # separated by >=1 whitespace char
        prev_end = off + len(surf)
    # maximality: concatenating tokens recovers all non-whitespace chars
    assert "".join(surf for _o, surf in toks) == "".join(
        c for c in s if not c.isspace()
    )


@given(texts)
@settings(max_examples=200)
def test_offset_maps_invert_tokens(s):
    toks = tokenize(s)
    start2tid, end2tid = offset_alignment_maps(toks)
    for tid, (off, surf) in enumerate(toks, start=1):
        assert start2tid[off] == tid
        assert end2tid[off + len(surf)] == tid


@given(st.lists(texts, max_size=8))
@settings(max_examples=100)
def test_assemble_document_turns_recoverable(turns):
    """Per-turn byte equality invariant: splitting the assembled document on
    the separator recovers every turn, provided turns are separator-free
    (datagen guarantees this; the property documents the contract)."""
    clean = [t.replace(TURN_SEPARATOR, " ") for t in turns]
    doc = assemble_document(clean)
    if clean:
        assert doc.split(TURN_SEPARATOR) == clean


@given(texts)
@settings(max_examples=200)
def test_first_section_idempotent_and_separator_free(s):
    out = first_section(s)
    assert out == out.strip()
    assert "==" not in out
    assert first_section(out) == out  # idempotent


@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1))
@settings(max_examples=500)
def test_simhash_pigeonhole_blocking_is_lossless(a, b):
    """The blocking scheme in operators/text_dedup.simhash_pairs: any pair
    of 16-bit signatures within Hamming distance h agrees exactly on at
    least one of the h+1 disjoint bit blocks — so the equi-join candidate
    set provably contains every true pair (same bounds arithmetic as the
    Spark plan)."""
    n_bits, max_hamming = 16, 3
    ham = bin(a ^ b).count("1")
    n_blocks = max_hamming + 1
    bounds = [round(i * n_bits / n_blocks) for i in range(n_blocks + 1)]
    blocks_agree = any(
        (a >> bounds[i]) & ((1 << (bounds[i + 1] - bounds[i])) - 1)
        == (b >> bounds[i]) & ((1 << (bounds[i + 1] - bounds[i])) - 1)
        for i in range(n_blocks)
    )
    if ham <= max_hamming:
        assert blocks_agree  # no true pair can be lost by the block join


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 4)), min_size=1, max_size=30
    )
)
@settings(max_examples=200)
def test_longest_match_filter_keeps_maximal_spans(raw):
    """The gazetteer overlap rule (operators/gazetteer.detect_mentions +
    oracle._gazetteer_links): after the containment filter, no kept span is
    strictly contained in another kept span, and every dropped span is
    strictly contained in some KEPT span (drops are justified by a maximal
    witness)."""
    spans = sorted({(b, b + ln) for b, ln in raw})

    def contained(m, c):
        return c[0] <= m[0] and m[1] <= c[1] and (c[1] - c[0]) > (m[1] - m[0])

    kept = [m for m in spans if not any(contained(m, c) for c in spans)]
    for m in kept:
        assert not any(contained(m, c) for c in kept if c != m)
    for m in spans:
        if m not in kept:
            assert any(contained(m, c) for c in kept)
