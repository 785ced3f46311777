"""Unigram-LM (SentencePiece-style) tokenizer suite — mirrors the
BPE suite in test_tokenize.py: encoder parity against an exhaustive
reference, losslessness (incl. CJK/multi-byte), the closed-form
disjoint-digraph oracle identity, trainer determinism + pure-Python
replica parity, and `tokenizer=` threading through the text family.
"""

from __future__ import annotations

import itertools
import math
import random

from graphlite_spark.operators.tokenize import (
    _PRETOKEN_RE,
    UnigramTokenizer,
    disjoint_digraph_unigram,
    learn_unigram,
    train_unigram,
)


def _exhaustive_best(word: bytes, logp: dict[bytes, float]) -> float:
    """Max total log-prob over ALL segmentations (exponential; test
    words are short)."""
    n = len(word)
    if n == 0:
        return 0.0
    best = -math.inf
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pieces, start = [], 0
        for i, c in enumerate(cuts, 1):
            if c:
                pieces.append(word[start:i])
                start = i
        pieces.append(word[start:])
        score = 0.0
        ok = True
        for p in pieces:
            lp = logp.get(p)
            if lp is None:
                ok = False
                break
            score += lp
        if ok and score > best:
            best = score
    return best


def test_viterbi_matches_exhaustive_reference():
    rng = random.Random(11)
    for trial in range(30):
        # random vocab over a-e with random multi-byte pieces
        vocab = [(bytes([b]), rng.uniform(-8.0, -2.0))
                 for b in range(97, 102)]
        for _ in range(8):
            ln = rng.randrange(2, 5)
            piece = bytes(rng.randrange(97, 102) for _ in range(ln))
            vocab.append((piece, rng.uniform(-6.0, -0.5)))
        tok = UnigramTokenizer(vocab)
        for _ in range(25):
            w = bytes(rng.randrange(97, 102)
                      for _ in range(rng.randrange(1, 10)))
            pieces = tok._viterbi_word(w)
            assert b"".join(pieces) == w
            got = sum(tok.logp[p] for p in pieces)
            want = _exhaustive_best(w, tok.logp)
            assert abs(got - want) < 1e-9, (w, pieces, got, want)


def test_tie_break_prefers_longer_piece_and_is_deterministic():
    # 'ab'+'c' and 'a'+'bc' tie exactly; the longer FINAL piece wins
    tok = UnigramTokenizer(
        [("a", -2.0), ("b", -2.0), ("c", -2.0),
         ("ab", -3.0), ("bc", -3.0)])
    assert tok._viterbi_word(b"abc") == (b"a", b"bc")
    # stable across instances (pure function of the vocabulary)
    tok2 = UnigramTokenizer(
        [("bc", -3.0), ("ab", -3.0), ("c", -2.0),
         ("b", -2.0), ("a", -2.0)])
    assert tok2._viterbi_word(b"abc") == (b"a", b"bc")


def test_lossless_roundtrip_unicode():
    tok = disjoint_digraph_unigram()
    for s in ["", "a", "the fast customer", "don't — naïve café ß 中文",
              "  runs   of \t spaces\n", "ther erer eee erin as asas",
              "中文字符测试", "aé" * 7]:
        assert tok.decode(tok.encode(s)) == s
    # byte fallback keeps encoding total for arbitrary vocabularies
    trained = UnigramTokenizer([("the", -1.0), ("中文", -1.5)])
    for s in ["the 中文 the", "völlig unbekannt", "\x00\x7f mixed"]:
        assert trained.decode(trained.encode(s)) == s


def test_disjoint_digraph_closed_form():
    # the oracle identity: tokens = utf8_bytes - sum(digraph occurrences)
    tok = disjoint_digraph_unigram()
    rng = random.Random(5)
    words = ["the", "customer", "window", "join", "fast", "hash", "erin",
             "as", "therin", "a", "merge", "order", "vector", "línea"]
    for _ in range(300):
        s = " ".join(rng.choice(words)
                     for _ in range(rng.randrange(0, 30)))
        nbytes = len(s.encode("utf-8"))
        occ = sum((len(s) - len(s.replace(d, ""))) // 2
                  for d in ("th", "er", "in", "as"))
        assert tok.count(s) == nbytes - occ, s


def test_learn_unigram_deterministic_and_sane():
    wc = {b"the": 9, b"there": 3, b"other": 2, b"batch": 4}
    v1 = learn_unigram(wc, vocab_size=6)
    v2 = learn_unigram(dict(reversed(list(wc.items()))), vocab_size=6)
    assert v1 == v2  # insertion-order independent
    tok = UnigramTokenizer(v1)
    # the dominant word segments as ONE piece
    assert tok._viterbi_word(b"the") == (b"the",)
    # probabilities are a valid distribution over the learned pieces
    assert all(lp < 0 for _p, lp in v1)


def test_train_unigram_pure_python_replica_parity(spark):
    from collections import Counter

    texts = ["the fast the fast customer", "there the other batch",
             "café the naïve café", "batch batch the fast"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string")
    tok = train_unigram(df, vocab_size=8, num_iters=2)
    counts = Counter()
    for t in texts:
        for w in _PRETOKEN_RE.findall(t):
            counts[w.encode("utf-8")] += 1
    replica = UnigramTokenizer(
        learn_unigram(dict(counts), vocab_size=8, num_iters=2))
    assert tok._vocab_arg == replica._vocab_arg
    for t in texts:
        assert tok.encode(t) == replica.encode(t)
        assert tok.decode(tok.encode(t)) == t


def test_spark_token_count_unigram_matches_local(spark):
    from graphlite_spark.operators.text import token_count

    tok = disjoint_digraph_unigram()
    texts = ["the fast customer", "erin as therin", "", "中文 the 文",
             "asas erer thth inin"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string")
    got = {r["doc_id"]: r["n_tokens"]
           for r in token_count(df, tokenizer=tok).collect()}
    assert got == {i: tok.count(t) for i, t in enumerate(texts)}


def test_chunk_documents_unigram_reassembles_and_snaps_cjk(spark):
    from graphlite_spark.operators.text import chunk_documents

    tok = disjoint_digraph_unigram()
    texts = ["中文字符测试", "naïve café ßer — 中the文",
             "aé" * 10, "the fast 中 erin"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string")
    for max_toks, overlap in ((4, 0), (5, 2)):
        rows = chunk_documents(df, max_tokens=max_toks, overlap=overlap,
                               tokenizer=tok).collect()
        for r in rows:
            assert "�" not in r["text"], (max_toks, overlap, r)
            assert r["n_tokens"] <= max_toks
        if overlap == 0:
            recon: dict[int, list] = {}
            for r in rows:
                recon.setdefault(r["doc_id"], []).append(
                    (r["chunk_idx"], r["text"]))
            for did, parts in recon.items():
                assert "".join(t for _, t in sorted(parts)) == texts[did]


def test_pack_and_temperature_thread_unigram(spark):
    from graphlite_spark.operators.sampling import temperature_sample
    from graphlite_spark.operators.text import pack_documents

    tok = disjoint_digraph_unigram()
    rows = [(i, "en" if i % 2 == 0 else "de",
             " ".join(["the fast"] * (1 + i % 5))) for i in range(20)]
    df = spark.createDataFrame(rows,
                               "doc_id: long, lang: string, text: string")
    packed = pack_documents(df, capacity=16, tokenizer=tok).collect()
    counts = {i: tok.count(t) for i, _l, t in rows}
    offset = 0
    expect_bin = {}
    for i in sorted(counts):
        expect_bin[i] = offset // 16
        offset += counts[i]
    for r in packed:
        assert r["bin"] == expect_bin[r["doc_id"]]
        assert r["n_tokens"] == counts[r["doc_id"]]
    t_out = temperature_sample(df, "lang", key_col="doc_id", alpha=1.0,
                               tokenizer=tok)
    assert set(t_out.columns) == {"doc_id", "lang", "text"}
    assert t_out.count() == df.count()


def test_tokenizer_fertility_report(spark):
    from graphlite_spark.operators.tokenize import (
        disjoint_digraph_tokenizer,
        tokenizer_fertility,
    )

    tok = disjoint_digraph_unigram()
    rows = [(1, "en", "the fast the fast"),     # 4 words
            (2, "en", "as in th er"),           # 4 words, all digraphs
            (3, "xx", ""),                      # empty: 0 words
            (4, "zz", "中文 文中")]              # CJK bytes
    df = spark.createDataFrame(rows,
                               "doc_id long, lang string, text string")
    out = {r["lang"]: r for r in
           tokenizer_fertility(df, tok, group_col="lang").collect()}
    # en: tokens = sum of per-doc counts; words = 8
    want_tokens = sum(tok.count(t) for _i, lg, t in rows if lg == "en")
    assert out["en"]["n_words"] == 8
    assert out["en"]["n_tokens"] == want_tokens
    assert out["en"]["fertility"] == round(want_tokens / 8, 6)
    assert out["xx"]["n_words"] == 0 and out["xx"]["fertility"] is None
    assert out["zz"]["n_bytes"] == len("中文 文中".encode())
    # both families ride the same machinery
    bpe = {r["lang"]: r["n_tokens"] for r in tokenizer_fertility(
        df, disjoint_digraph_tokenizer(), group_col="lang").collect()}
    assert bpe["en"] == out["en"]["n_tokens"]  # same digraph counts
