"""Snowball German2 variant — implemented from the published variant
algorithm (snowballstem.org german2 variant; public domain).  Fills
the reference's SnowballFilter(name="German2") role
(``Tartarus/Snowball/Ext/German2Stemmer.cs``); validated against the
full published test vocabulary during development.

German2 differs from German only in the prelude: after the u/y
consonant marking, the digraphs ``ae``/``oe``/``ue`` fold to
``ä``/``ö``/``ü`` (a ``qu`` pair is skipped whole, protecting the u),
and ``ß`` folds to ``ss`` in the same scan.  The suffix steps are the
shared German core.
"""

from __future__ import annotations

from lucenenet_spark.analysis.snowball_german import _german_core, _mark_uy


def german2_stem(word: str) -> str:
    if not word:
        return word
    # pass 1: mark u/y between vowels BEFORE the digraph folding
    word = _mark_uy(word)
    # pass 2: single left-to-right scan with qu protection
    out = []
    i = 0
    n = len(word)
    while i < n:
        two = word[i : i + 2]
        ch = word[i]
        if ch == "ß":
            out.append("ss")
            i += 1
        elif two == "ae":
            out.append("ä")
            i += 2
        elif two == "oe":
            out.append("ö")
            i += 2
        elif two == "ue":
            out.append("ü")
            i += 2
        elif two == "qu":
            # 'qu' hops the pair PLUS the next two characters (so a
            # following ae/oe/ue digraph is protected); if fewer than
            # two characters remain, the scan aborts entirely
            if i + 4 > n:
                out.append(word[i:])
                break
            out.append(word[i : i + 4])
            i += 4
        else:
            out.append(ch)
            i += 1
    return _german_core("".join(out))
