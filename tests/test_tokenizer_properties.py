"""Property-based guarantees for BOTH tokenizer families (hypothesis):
decode∘encode is the identity on ARBITRARY unicode — not just the
curated suites — and the unigram Viterbi never drops or reorders
bytes. Pure Python (no Spark session), so the properties run hundreds
of adversarial cases in seconds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from graphlite_spark.operators.tokenize import (
    BPETokenizer,
    UnigramTokenizer,
    disjoint_digraph_tokenizer,
    disjoint_digraph_unigram,
)

# surrogates are not encodable to UTF-8; everything else is fair game
_TEXT = st.text(
    alphabet=st.characters(exclude_categories=("Cs",)), max_size=300)


@settings(max_examples=300, deadline=None)
@given(_TEXT)
def test_bpe_lossless_on_arbitrary_unicode(s):
    tok = disjoint_digraph_tokenizer()
    assert tok.decode(tok.encode(s)) == s


@settings(max_examples=300, deadline=None)
@given(_TEXT)
def test_unigram_lossless_on_arbitrary_unicode(s):
    tok = disjoint_digraph_unigram()
    assert tok.decode(tok.encode(s)) == s


@settings(max_examples=200, deadline=None)
@given(_TEXT,
       st.lists(st.tuples(
           st.text(alphabet="abcdef ", min_size=1, max_size=4),
           st.floats(min_value=-9.0, max_value=-0.1,
                     allow_nan=False)),
           max_size=12))
def test_unigram_lossless_under_random_vocabularies(s, vocab):
    # byte fallback must keep ANY vocabulary total and bijective
    tok = UnigramTokenizer(vocab)
    pieces = tok.encode_pieces(s)
    assert b"".join(pieces) == s.encode("utf-8")
    assert tok.decode(tok.encode(s)) == s


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdef", max_size=60),
       st.lists(st.tuples(st.sampled_from(["a", "b", "c", "d"]),
                          st.sampled_from(["a", "b", "c", "d"])),
                max_size=8))
def test_bpe_lossless_under_random_merge_tables(s, pairs):
    merges, vocab = [], {bytes([i]) for i in range(256)}
    for a, b in pairs:
        ab, bb = a.encode(), b.encode()
        if ab in vocab and bb in vocab and (ab, bb) not in merges:
            merges.append((ab, bb))
            vocab.add(ab + bb)
    tok = BPETokenizer(merges)
    assert tok.decode(tok.encode(s)) == s
