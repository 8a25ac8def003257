"""Property tests for the round-5 pinned role analyzers (Polish light
stemmer, OpenNLP-role tagger/filter): structural invariants every
index-feeding analyzer must hold regardless of input.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from lucenenet_spark.analysis.opennlp_role import (  # noqa: E402
    make_opennlp_analyzer,
    opennlp_tokens,
)
from lucenenet_spark.analysis.polish import analyze_pl, stem_pl  # noqa: E402

# Polish letters incl. every diacritic + digits/punct/space
_PL_ALPHABET = st.sampled_from(
    list("aąbcćdeęfghijklłmnńoópqrsśtuvwxyzźż .,!?-'0123456789")
)
_ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=200,
)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_PL_ALPHABET, min_size=1, max_size=30))
def test_stem_pl_never_below_min_and_always_prefix(word):
    w = "".join(word.split())  # stem operates on single tokens
    if not w:
        return
    s = stem_pl(w)
    # suffix stripping only: the stem is a prefix of the word
    assert w.startswith(s)
    # alphabetic words never strip below 3 chars (the global guard);
    # non-alphabetic tokens pass through verbatim
    if w.isalpha():
        assert len(s) >= min(len(w), 3)
    else:
        assert s == w


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=_PL_ALPHABET, max_size=200))
def test_analyze_pl_positions_sequential(text):
    toks = analyze_pl(text)
    assert [p for _, p in toks] == list(range(len(toks)))
    assert all(t == t.lower() for t, _ in toks)


@settings(max_examples=200, deadline=None)
@given(_ASCII_TEXT)
def test_opennlp_tokens_structural(text):
    toks = opennlp_tokens(text)
    # every token lowercased, tagged, and nonempty
    for term, tag, eos in toks:
        assert term and term == term.lower()
        assert isinstance(tag, str) and tag
        assert isinstance(eos, bool)
    # EOS count == number of non-empty sentences that produced tokens
    n_eos = sum(1 for _, _, e in toks if e)
    assert n_eos <= len(toks)
    # the final token of a non-empty stream always closes a sentence
    if toks:
        assert toks[-1][2] is True


@settings(max_examples=200, deadline=None)
@given(_ASCII_TEXT)
def test_opennlp_keep_subset_and_gapped(text):
    all_toks = opennlp_tokens(text)
    kept = make_opennlp_analyzer(("NN", "NNP"))(text)
    # kept stream is a position-consistent subsequence of the full one
    assert len(kept) <= len(all_toks)
    for term, pos in kept:
        assert 0 <= pos < len(all_toks)
        assert all_toks[pos][0] == term
        assert all_toks[pos][1] in ("NN", "NNP")
    # positions strictly increasing (gaps allowed, never reordered)
    positions = [p for _, p in kept]
    assert positions == sorted(set(positions))
