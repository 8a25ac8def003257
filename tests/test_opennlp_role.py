"""OpenNLP role (analysis/opennlp_role.py) — pinned rule-based
sentence detection + POS tagging + POS-gated indexing (reference
``src/Lucene.Net.Analysis.OpenNLP``: OpenNLPTokenizer.cs sentence/EOS
contract, OpenNLPPOSFilter.cs TypeAttribute tagging; the trained
maxent models are out of scope, the role is kept).
"""

from __future__ import annotations

from lucenenet_spark.analysis.opennlp_role import (
    make_opennlp_analyzer,
    opennlp_tokens,
    split_sentences,
)


def test_sentence_detection():
    assert split_sentences("One two. Three four! Five?") == [
        "One two.", "Three four!", "Five?"
    ]
    # no terminal punctuation -> one sentence; empty -> none
    assert split_sentences("no break here") == ["no break here"]
    assert split_sentences("") == []
    # pinned: abbreviation handling is a model concern, the rule breaks
    assert len(split_sentences("See Dr. Smith today.")) == 2


def test_pos_tagging_and_eos():
    toks = opennlp_tokens(
        "The search engine indexes documents quickly. It stores postings in memory."
    )
    by_term = {t: tag for t, tag, _ in toks}
    assert by_term["the"] == "DT"
    assert by_term["search"] == "NN"
    assert by_term["quickly"] == "RB"
    assert by_term["it"] == "PRP"
    assert by_term["in"] == "IN"
    # EOS_FLAG_BIT role: exactly the sentence-final tokens are flagged
    assert [t for t, _, eos in toks if eos] == ["quickly", "memory"]


def test_tag_rules_pinned():
    # capitalized non-initial -> NNP; sentence-initial stays lexical
    toks = opennlp_tokens("Today Spark runs. Spark runs today.")
    tags = [(t, tag) for t, tag, _ in toks]
    assert ("spark", "NNP") in tags[:3]      # non-initial occurrence
    assert tags[3] == ("spark", "NN")        # sentence-initial
    # digits -> CD; suffix rules; plural s stripped before suffix check
    by = {t: tag for t, tag, _ in opennlp_tokens(
        "42 compressions are scalable and ranked efficiently"
    )}
    assert by["42"] == "CD"
    assert by["compressions"] == "NN"
    assert by["scalable"] == "JJ"
    assert by["ranked"] == "VB"
    assert by["efficiently"] == "RB"
    assert by["are"] == "MD"


def test_keep_filter_positions_have_gaps():
    an = make_opennlp_analyzer(("NN", "NNP"))
    got = an("The search engine indexes documents quickly.")
    # DT at 0 and RB at 5 removed; kept tokens retain original positions
    assert got == [
        ("search", 1), ("engine", 2), ("indexes", 3), ("documents", 4)
    ]
    assert an("") == []


def test_opennlp_index_end_to_end(spark):
    from lucenenet_spark.index import CorpusSpec, build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [
            (0, "The engine indexes documents. It is very fast."),
            (1, "Documents are stored in memory."),
            (2, "The cluster runs quickly."),
        ],
        "doc_id long, text string",
    )
    idx = build_index(
        spark, docs,
        CorpusSpec(text_col="text", id_col="doc_id",
                   opennlp_keep=("NN", "NNP")),
    ).cache()
    terms = {r["term"] for r in idx.term_stats.collect()}
    # nouns in, function words / adverbs out
    assert {"documents", "memory", "engine", "cluster"} <= terms
    assert "the" not in terms and "quickly" not in terms
    s = IndexSearcher(idx)
    assert {h.docid for h in s.search(TermQuery(term="documents"), 5)} == {0, 1}
    # norms count KEPT tokens: doc 2 keeps 'cluster' + 'runs' (the
    # pinned tagger defaults suffix-less words to NN), not 'the'/
    # 'quickly' -> fl 2 of 4 raw tokens
    fl = {r["docid"]: r["field_length"] for r in idx.docs.collect()}
    assert fl[2] == 2


def test_opennlp_exclusive_with_other_flags(spark):
    import pytest

    from lucenenet_spark.index import CorpusSpec, build_index

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="opennlp_keep"):
        build_index(
            spark, docs,
            CorpusSpec(text_col="text", id_col="doc_id",
                       opennlp_keep=("NN",), stem=True),
        )
