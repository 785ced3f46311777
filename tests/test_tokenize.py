"""Byte-level BPE tokenizer: encoder parity vs an independent naive
reference, losslessness, the disjoint-digraph closed form, trainer
determinism, and the Spark operators (tokenize_bpe / token_count_bpe /
chunk_documents_bpe) plus the tokenizer= threading through
token_count / chunk_documents / pack_documents / mixture_sample."""

from __future__ import annotations

import random
import string

import pytest

from graphlite_spark.operators.tokenize import (
    _PRETOKEN_RE,
    BPETokenizer,
    disjoint_digraph_tokenizer,
    learn_bpe,
)


def _naive_encode(text: str, merges) -> list[bytes]:
    """Independent textbook BPE: per pre-token, repeatedly find the
    lowest-ranked adjacent pair present and merge all its occurrences
    left-to-right. Written deliberately differently from the engine."""
    mb = [(a.encode() if isinstance(a, str) else bytes(a),
           b.encode() if isinstance(b, str) else bytes(b)) for a, b in merges]
    ranks = {p: i for i, p in enumerate(mb)}
    out: list[bytes] = []
    for w in _PRETOKEN_RE.findall(text):
        parts = [bytes([c]) for c in w.encode("utf-8")]
        while True:
            present = [(ranks[p], p) for p in zip(parts, parts[1:])
                       if p in ranks]
            if not present:
                break
            _, (a, b) = min(present)
            res: list[bytes] = []
            j = 0
            while j < len(parts):
                if j < len(parts) - 1 and parts[j] == a and parts[j + 1] == b:
                    res.append(a + b)
                    j += 2
                else:
                    res.append(parts[j])
                    j += 1
            parts = res
        out.extend(parts)
    return out


def test_pretoken_coverage_total():
    # the pre-tokenizer must PARTITION the input: findall concatenation
    # reproduces the string exactly (GPT-2-pattern property)
    rng = random.Random(42)
    alphabet = (string.ascii_letters + string.digits
                + " \t\n.,;:'\"!?-_()[]{}@#$%^&*+=~`|\\/<>éßÆ中文")
    for _ in range(800):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 100)))
        assert "".join(_PRETOKEN_RE.findall(s)) == s, repr(s)
    # letter runs are never split (the closed-form oracle invariant)
    for tok in _PRETOKEN_RE.findall("smith'there naïve_th in2the"):
        pass  # coverage asserted above; spot-check a known split:
    assert _PRETOKEN_RE.findall("'there") == ["'", "there"]


def test_encoder_parity_vs_naive_reference():
    # random cascading merge tables over random strings: the fast
    # engine encoder must match the naive reference token-for-token
    for trial in range(40):
        r = random.Random(trial)
        pieces = [bytes([i]) for i in range(97, 105)]  # a-h
        merges: list[tuple[bytes, bytes]] = []
        for _ in range(14):
            a, b = r.choice(pieces), r.choice(pieces)
            if (a, b) in merges:
                continue
            merges.append((a, b))
            pieces.append(a + b)
        tok = BPETokenizer(merges)
        for _ in range(50):
            s = "".join(r.choice("abcdefgh  .") for _ in range(r.randrange(0, 70)))
            assert tok.encode_pieces(s) == _naive_encode(s, merges), s
            assert tok.decode(tok.encode(s)) == s


def test_lossless_roundtrip_unicode():
    tok = disjoint_digraph_tokenizer()
    for s in ["", "a", "the fast customer", "don't — naïve café ß 中文",
              "  runs   of \t spaces\n", "ther erer eee erin as asas"]:
        assert tok.decode(tok.encode(s)) == s


def test_disjoint_digraph_closed_form():
    # the oracle identity: tokens = utf8_bytes - sum(digraph occurrences)
    tok = disjoint_digraph_tokenizer()
    rng = random.Random(7)
    words = ["the", "customer", "window", "join", "fast", "hash", "erin",
             "as", "therin", "a", "merge", "order", "vector", "línea"]
    for _ in range(300):
        s = " ".join(rng.choice(words)
                     for _ in range(rng.randrange(0, 30)))
        nbytes = len(s.encode("utf-8"))
        occ = sum((len(s) - len(s.replace(d, ""))) // 2
                  for d in ("th", "er", "in", "as"))
        assert tok.count(s) == nbytes - occ, s


def test_merge_table_validation():
    with pytest.raises(ValueError):
        BPETokenizer([("th", "e")])  # 'th' not yet a piece
    # valid bottom-up: t+h first, then th+e
    tok = BPETokenizer([("t", "h"), ("th", "e")])
    assert tok.encode_pieces("the") == [b"the"]
    assert tok.vocab[b"the"] == 257


def test_learn_bpe_deterministic_and_sane():
    wc = {b"the the": 5, b"there": 3, b"other": 2, b"batch": 4}
    m1 = learn_bpe(wc, 5)
    m2 = learn_bpe(dict(reversed(list(wc.items()))), 5)
    assert m1 == m2  # insertion-order independent
    tok = BPETokenizer(m1)
    assert tok.encode_pieces("the") == [b"the"]  # most frequent word fuses


def test_spark_token_count_bpe_matches_local(spark):
    from graphlite_spark.operators.text import token_count
    from graphlite_spark.operators.tokenize import (
        token_count_bpe, tokenize_bpe)

    tok = disjoint_digraph_tokenizer()
    rows = [(i, t) for i, t in enumerate(
        ["the fast customer joins", "erin has a basin", "", None,
         "as the merger ordered", "naïve — café"])]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: r["n_tokens"]
           for r in token_count_bpe(df, tok).collect()}
    for i, t in rows:
        assert got[i] == (0 if t is None else tok.count(t)), (i, t)

    # threading: token_count(tokenizer=) returns the same counts
    got2 = {r["doc_id"]: (r["n_tokens"], r["n_subwords"])
            for r in token_count(df, tokenizer=tok).collect()}
    for i, t in rows:
        expect = 0 if t is None else tok.count(t)
        assert got2[i] == (expect, expect)

    # tokenize_bpe ids decode back to the text
    for r in tokenize_bpe(df, tok).collect():
        if r["text"] is not None:
            assert tok.decode(r["token_ids"]) == r["text"]


def test_spark_chunk_documents_bpe(spark):
    from graphlite_spark.operators.text import chunk_documents

    tok = disjoint_digraph_tokenizer()
    texts = ["the fast customer joins the window erin has a basin today",
             "as the merger ordered further other gather",
             "x", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string")

    out = chunk_documents(df, max_tokens=5, overlap=2, tokenizer=tok)
    rows = sorted([(r["doc_id"], r["chunk_idx"], r["text"], r["n_tokens"])
                   for r in out.collect()])
    by_doc: dict[int, list] = {}
    for did, ci, text, n in rows:
        by_doc.setdefault(did, []).append((ci, text, n))
    assert 3 not in by_doc  # empty doc -> no chunks
    for did, chunks in by_doc.items():
        pieces = tok.encode_pieces(texts[did])
        n = len(pieces)
        stride = 3
        # dense indices, exact window sizes, exact byte slices
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        for ci, text, ntok in chunks:
            window = pieces[ci * stride: ci * stride + 5]
            assert ntok == len(window)
            assert text == b"".join(window).decode("utf-8")
        # full coverage: last chunk reaches the end
        last = chunks[-1]
        assert (len(chunks) - 1) * stride + last[2] == n

    # overlap=0 chunks reassemble the document exactly (losslessness)
    out0 = chunk_documents(df, max_tokens=4, overlap=0, tokenizer=tok)
    recon: dict[int, list] = {}
    for r in out0.collect():
        recon.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["text"]))
    for did, parts in recon.items():
        joined = "".join(t for _, t in sorted(parts))
        assert joined == texts[did]


def test_spark_pack_and_mixture_tokenizer_threading(spark):
    from graphlite_spark.operators.sampling import mixture_sample
    from graphlite_spark.operators.text import pack_documents

    tok = disjoint_digraph_tokenizer()
    rows = [(i, "en" if i % 2 == 0 else "de",
             " ".join(["the fast"] * (1 + i % 5))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")

    packed = pack_documents(df, capacity=16, tokenizer=tok).collect()
    counts = {i: tok.count(t) for i, _l, t in rows}
    # bins follow the running BPE-token offset in doc_id order
    offset = 0
    expect_bin = {}
    for i in sorted(counts):
        expect_bin[i] = offset // 16
        offset += counts[i]
    for r in packed:
        assert r["bin"] == expect_bin[r["doc_id"]]
        assert r["n_tokens"] == counts[r["doc_id"]]

    # mixture_sample measured in BPE tokens: kept-weight shares track
    # the target ratio, and the temp weight column does not leak out
    out = mixture_sample(df, "lang", {"en": 0.5, "de": 0.5},
                         key_col="doc_id", tokenizer=tok)
    assert set(out.columns) == {"doc_id", "lang", "text"}
    kept = out.collect()
    w = {"en": 0, "de": 0}
    for r in kept:
        w[r["lang"]] += counts[r["doc_id"]]
    assert w["en"] > 0 and w["de"] > 0

    # temperature_sample threads the tokenizer the same way; alpha=1
    # with token weights is still the identity and the temp column
    # never leaks out
    from graphlite_spark.operators.sampling import temperature_sample

    t_out = temperature_sample(df, "lang", key_col="doc_id", alpha=1.0,
                               tokenizer=tok)
    assert set(t_out.columns) == {"doc_id", "lang", "text"}
    assert t_out.count() == df.count()
    t_half = temperature_sample(df, "lang", key_col="doc_id",
                                alpha=0.5, tokenizer=tok)
    assert 0 < t_half.count() <= df.count()


def test_streaming_chunk_documents_bpe_matches_batch(spark, tmp_path):
    # chunk_documents_bpe is a plain mapInPandas transformation, so it
    # runs unchanged on a streaming frame: stream == batch
    import json

    from pyspark.sql import functions as F

    from graphlite_spark.operators.text import chunk_documents

    tok = disjoint_digraph_tokenizer()
    d = tmp_path / "docs"
    d.mkdir()
    texts = ["the fast customer joins the window erin has a basin",
             "as the merger ordered further other gather more still",
             "tiny"]
    with open(d / "part.json", "w") as f:
        for i, t in enumerate(texts):
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    schema = "doc_id long, text string"
    batch_df = spark.read.schema(schema).json(str(d))
    batch = chunk_documents(batch_df, max_tokens=6, overlap=2, tokenizer=tok)
    expected = {(r.doc_id, r.chunk_idx, r.text, r.n_tokens)
                for r in batch.collect()}
    assert expected

    stream = spark.readStream.schema(schema).json(str(d))
    q = (
        chunk_documents(stream, max_tokens=6, overlap=2, tokenizer=tok)
        .writeStream.format("memory").queryName("bpe_chunks")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {(r.doc_id, r.chunk_idx, r.text, r.n_tokens)
           for r in spark.table("bpe_chunks").collect()}
    assert got == expected


def test_chunk_documents_bpe_multibyte_boundaries(spark):
    # a token window can end mid-character (byte-level BPE tokens are
    # sub-character on multi-byte text): chunk text must snap to UTF-8
    # character boundaries, never emit U+FFFD, and still reassemble the
    # document exactly at overlap=0
    from graphlite_spark.operators.text import chunk_documents

    tok = disjoint_digraph_tokenizer()
    texts = ["中文字符测试", "naïve café ßer — 中the文",
             "aé" * 10, "the fast 中 erin"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string")
    for max_toks, overlap in ((4, 0), (5, 2), (3, 1)):
        out = chunk_documents(df, max_tokens=max_toks, overlap=overlap,
                              tokenizer=tok)
        rows = out.collect()
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


def test_chunk_documents_bpe_string_ids(spark):
    # the id column keeps its input type (was hardcoded long)
    from graphlite_spark.operators.text import chunk_documents

    tok = disjoint_digraph_tokenizer()
    df = spark.createDataFrame(
        [("doc-a", "the fast customer joins"), ("doc-b", "erin has a basin")],
        "doc_id: string, text: string")
    out = chunk_documents(df, max_tokens=4, overlap=0, tokenizer=tok)
    assert dict(out.dtypes)["doc_id"] == "string"
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {"doc-a", "doc-b"}


def test_mixture_sample_weight_col_not_dropped(spark):
    # regression: an explicit weight_col named like the internal temp
    # column must survive in the output
    from graphlite_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", 10 + i) for i in range(20)],
        "doc_id: long, lang: string, _bpe_tokens: long")
    out = mixture_sample(df, "lang", {"en": 0.5, "de": 0.5}, "doc_id",
                         weight_col="_bpe_tokens")
    assert "_bpe_tokens" in out.columns


def test_train_bpe_unicode_pretokens(spark):
    # the distributed histogram must pre-tokenize exactly like the
    # Python encoder — 'café' stays one pre-token (Java \\w is
    # ASCII-only; the histogram now runs the Python regex)
    from collections import Counter

    from graphlite_spark.operators.tokenize import (
        _PRETOKEN_RE, learn_bpe, train_bpe)

    texts = ["café café naïve", "café au lait", "中文 中文 café"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string")
    tok = train_bpe(df, num_merges=5)
    counts = Counter()
    for t in texts:
        for w in _PRETOKEN_RE.findall(t):
            counts[w.encode("utf-8")] += 1
    assert tok.merges == learn_bpe(dict(counts), 5)
    for t in texts:
        assert tok.decode(tok.encode(t)) == t
