"""Byte-level BPE tokenization for training-data pipelines.

Training pipelines budget text in SUBWORD tokens, not whitespace
words — lengths differ 1.3-2x non-uniformly by language, which shifts
mixture weights, chunk boundaries, and packing bins. This module
provides the tokenizer-true accounting the rest of the text family
(token_count / chunk_documents / pack_documents / mixture_sample)
threads through via ``tokenizer=``.

Design (beyond-reference surface; the reference engine has no text
pipeline — see graphlite/src layout, which stops at the query layer):

- ``BPETokenizer``: byte-level BPE in the GPT-2 style — a pre-token
  regex splits text into words, each word's UTF-8 bytes are merged by
  a ranked pair table (lowest rank first, all occurrences of the
  winning pair left-to-right per round). Ids: 0-255 are raw bytes,
  256+i is merge i. Encoding is LOSSLESS: decode(encode(s)) == s.
  The pre-tokenizer is GPT-2's pattern minus English contraction
  splitting, so maximal letter runs always stay in one pre-token (a
  property the closed-form oracle below relies on).
- ``tokenize_bpe`` / ``token_count_bpe``: Spark operators. The merge
  table is broadcast once per executor (sc.broadcast), encoding runs
  in an Arrow-vectorized pandas UDF with a per-executor word->pieces
  LRU cache — natural-language word frequency is Zipfian, so the
  cache turns the per-word merge loop into a dict hit for the bulk of
  the corpus. Map-side only: no shuffle at any corpus size.
- ``chunk_documents_bpe``: token-window chunking where windows are
  measured in BPE tokens and chunk text is the exact byte slice
  (byte-level BPE is lossless, so chunks reassemble to the document).
- ``learn_bpe`` / ``train_bpe``: merge-table training. The word
  histogram is computed DISTRIBUTED (one map-side-combined groupBy —
  the only corpus-sized stage, scan-bound at 100 TB); the sequential
  merge-learning loop then runs on the compact capped histogram on
  the driver, which is how production tokenizer trainers work (the
  pair-count loop is inherently sequential in num_merges).

Oracle strategy: for a merge table of single-byte pairs whose
character sets are PAIRWISE DISJOINT (e.g. th/er/in/as), merges can
neither overlap nor cascade, so
    n_tokens = octet_length(text) - sum_d occurrences(d, text)
and occurrences(d) = (length(text) - length(replace(text, d, '')))/2
— exactly computable by DuckDB. The engine still runs the full
general BPE algorithm; only the vocabulary is specially chosen.
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2's pre-token pattern with \p{L}->[^\W\d_], \p{N}->\d, and the
# English contraction alternatives ('s|'t|...) REMOVED: contraction
# splitting cuts letter runs ("'there" -> "'t","here"), which would
# break the adjacent-letter-pair invariant the closed-form oracle
# needs. Coverage is total: every char is a letter, digit, whitespace,
# or other (incl. '_'), and each class has an arm.
PRETOKEN_PATTERN = r" ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+"
_PRETOKEN_RE = re.compile(PRETOKEN_PATTERN)

_INF = float("inf")


class BPETokenizer:
    """Byte-level BPE: ranked merge table over UTF-8 bytes.

    ``merges`` is an ordered list of (left, right) pieces (str or
    bytes); rank = list position (lower merges first). Each side must
    be a piece already in the vocabulary when its rule is added (bytes
    0-255 are always present), matching how BPE training emits rules.
    """

    def __init__(self, merges):
        self.merges: list[tuple[bytes, bytes]] = []
        self.vocab: dict[bytes, int] = {bytes([i]): i for i in range(256)}
        for a, b in merges:
            a = a.encode("utf-8") if isinstance(a, str) else bytes(a)
            b = b.encode("utf-8") if isinstance(b, str) else bytes(b)
            if a not in self.vocab or b not in self.vocab:
                raise ValueError(
                    f"merge ({a!r}, {b!r}) references a piece not yet in "
                    "the vocabulary (merges must build bottom-up)")
            self.merges.append((a, b))
            self.vocab.setdefault(a + b, 256 + len(self.merges) - 1)
        self.ranks: dict[tuple[bytes, bytes], int] = {
            pair: i for i, pair in enumerate(self.merges)
        }
        self.id_to_piece: dict[int, bytes] = {}
        for piece, pid in self.vocab.items():
            self.id_to_piece.setdefault(pid, piece)
        # per-instance word cache (Zipfian reuse); bounded so a
        # long-running executor cannot grow it without limit
        self._word_cache = lru_cache(maxsize=65536)(self._bpe_word)

    def __getstate__(self):
        return {"merges": self.merges}

    def __setstate__(self, state):
        self.__init__(state["merges"])

    def __reduce__(self):
        return (BPETokenizer, (self.merges,))

    def content_key(self) -> str:
        import hashlib

        return hashlib.sha256(repr(self.merges).encode()).hexdigest()

    def _bpe_word(self, word: bytes) -> tuple[bytes, ...]:
        """Canonical BPE: repeatedly merge ALL occurrences (left to
        right) of the lowest-ranked adjacent pair present."""
        parts = [bytes([b]) for b in word]
        ranks = self.ranks
        while len(parts) > 1:
            best_rank = _INF
            best = None
            for pair in zip(parts, parts[1:]):
                r = ranks.get(pair, _INF)
                if r < best_rank:
                    best_rank, best = r, pair
            if best is None:
                break
            a, b = best
            out = []
            i = 0
            n = len(parts)
            while i < n:
                if i < n - 1 and parts[i] == a and parts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        return tuple(parts)

    def encode_pieces(self, text: str) -> list[bytes]:
        pieces: list[bytes] = []
        for word in _PRETOKEN_RE.findall(text):
            pieces.extend(self._word_cache(word.encode("utf-8")))
        return pieces

    def encode(self, text: str) -> list[int]:
        return [self.vocab[p] for p in self.encode_pieces(text)]

    def decode(self, ids) -> str:
        return b"".join(self.id_to_piece[int(i)] for i in ids).decode(
            "utf-8", errors="replace")

    def count(self, text: str) -> int:
        return len(self.encode_pieces(text))


# The closed-form demo vocabulary: four single-byte merges whose
# character sets {t,h},{e,r},{i,n},{a,s} are pairwise disjoint, so the
# token count has the exact SQL form documented in the module header.
DISJOINT_DIGRAPH_MERGES = [("t", "h"), ("e", "r"), ("i", "n"), ("a", "s")]


def disjoint_digraph_tokenizer() -> BPETokenizer:
    return BPETokenizer(DISJOINT_DIGRAPH_MERGES)


def learn_bpe(word_counts: dict[bytes, int], num_merges: int,
              min_count: int = 2) -> list[tuple[bytes, bytes]]:
    """Learn a merge table from a word histogram (pure Python, the
    inherently-sequential part of BPE training). Greedy: each round
    merges the globally most frequent adjacent pair; ties break on
    lexicographic pair order for determinism."""
    words: list[tuple[list[bytes], int]] = [
        ([bytes([b]) for b in w], c) for w, c in word_counts.items()
    ]
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(num_merges):
        counts: dict[tuple[bytes, bytes], int] = {}
        for parts, c in words:
            for pair in zip(parts, parts[1:]):
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        # deterministic: highest count, then lexicographically smallest
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        if counts[best] < min_count:
            break
        merges.append(best)
        a, b = best
        for parts, _c in words:
            i = 0
            while i < len(parts) - 1:
                if parts[i] == a and parts[i + 1] == b:
                    parts[i: i + 2] = [a + b]
                else:
                    i += 1
    return merges


def train_bpe(df: DataFrame, num_merges: int, text_col: str = "text",
              max_words: int = 1_000_000) -> BPETokenizer:
    """Train a BPE merge table on a corpus. The word histogram is one
    distributed map-side-combined groupBy (scan-bound at any scale);
    the top ``max_words`` rows by count come to the driver for the
    sequential merge loop — capping the histogram is the standard
    trainer posture (coverage loss is in the Zipf tail)."""
    counts = word_histogram(df, text_col=text_col, max_words=max_words)
    return BPETokenizer(learn_bpe(counts, num_merges))


def word_histogram(df: DataFrame, text_col: str = "text",
                   max_words: int = 1_000_000) -> dict[bytes, int]:
    """The distributed pre-token histogram both trainers (BPE,
    unigram) learn from: one map-side-combined groupBy — the only
    corpus-sized stage, scan-bound at 100 TB — capped at the top
    ``max_words`` pre-tokens by count (the standard trainer posture;
    coverage loss is in the Zipf tail). Deterministic: ties on count
    break lexicographically.

    Pre-tokenizes in PYTHON (Arrow-vectorized), not Java regex:
    java.util.regex reads \\w/\\d/\\s as ASCII-only without
    UNICODE_CHARACTER_CLASS, so regexp_extract_all would split
    'café' differently than the encoder's _PRETOKEN_RE — the
    histogram must see exactly the encoder's pre-tokens.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _pretok(s):
        return s.map(lambda x: [] if x is None else _PRETOKEN_RE.findall(x))

    _pretok.__annotations__ = {"s": pd.Series, "return": pd.Series}
    hist = (
        df.select(F.explode(
            pandas_udf(_pretok, "array<string>")(F.col(text_col))
        ).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
    )
    return {r["w"].encode("utf-8"): int(r["c"]) for r in hist.collect()}


def _broadcast_tokenizer(df: DataFrame, tokenizer):
    """Broadcast the tokenizer; returns (broadcast, content_key).

    Works for ANY tokenizer here (BPETokenizer, UnigramTokenizer) —
    both pickle via __reduce__ into their defining tables and expose
    ``content_key()``. The content key is a driver-side hash of the
    defining table itself — worker-side Broadcast objects expose no
    stable id, and keying the executor cache on id(bc) can silently
    alias two different tokenizers if the first broadcast is
    garbage-collected and a later one reuses the same CPython id
    (ADVICE r6). Content-keying makes aliasing harmless: equal keys
    imply equal tables.
    """
    sc = df.sparkSession.sparkContext
    return sc.broadcast(tokenizer), tokenizer.content_key()


# Executor-side tokenizer instances, keyed by defining-table content
# hash: rebuilt vocab/rank dicts and a COLD word cache per Arrow
# batch would bound the Zipfian cache benefit by batch size instead
# of executor lifetime. The dict lives for the Python worker process.
_TOKENIZER_CACHE: dict = {}


def _tokenizer_from_broadcast(bc, key: str):
    tok = _TOKENIZER_CACHE.get(key)
    if tok is None:
        tok = bc.value
        if len(_TOKENIZER_CACHE) > 8:  # bound worker memory
            _TOKENIZER_CACHE.clear()
        _TOKENIZER_CACHE[key] = tok
    return tok


def tokenize_bpe(df: DataFrame, tokenizer: BPETokenizer,
                 text_col: str = "text",
                 out_col: str = "token_ids") -> DataFrame:
    """Add an array<int> column of BPE token ids. Broadcast merge
    table + Arrow-vectorized pandas UDF (per-executor cached
    tokenizer instance); map-side, zero shuffle."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bc, tkey = _broadcast_tokenizer(df, tokenizer)

    def _enc(s):
        tok = _tokenizer_from_broadcast(bc, tkey)
        return s.map(lambda x: None if x is None else tok.encode(x))

    _enc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return df.withColumn(out_col, pandas_udf(_enc, "array<int>")(F.col(text_col)))


def bpe_token_count_col(df: DataFrame, tokenizer: BPETokenizer,
                        text_col: str):
    """The counting expression alone, for threading into operators
    that take a token/weight column (pack_documents, mixture_sample)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bc, tkey = _broadcast_tokenizer(df, tokenizer)

    def _cnt(s):
        tok = _tokenizer_from_broadcast(bc, tkey)
        return s.map(lambda x: 0 if x is None else tok.count(x))

    _cnt.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_cnt, "long")(F.col(text_col))


def token_count_bpe(df: DataFrame, tokenizer: BPETokenizer,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens) under the given BPE tokenizer. Same distributed
    shape as tokenize_bpe but never materializes the id arrays."""
    return df.select(
        F.col(id_col),
        bpe_token_count_col(df, tokenizer, text_col).alias("n_tokens"),
    )


def chunk_documents_bpe(
    df: DataFrame,
    tokenizer: BPETokenizer,
    max_tokens: int = 512,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer-true sibling of text.chunk_documents: chunk i covers
    BPE tokens [i*stride, i*stride + max_tokens); n_tokens is exactly
    the window size. Chunk TEXT is the window's byte span with its
    ends snapped to UTF-8 character boundaries (a token boundary can
    fall inside a multi-byte character — byte-level BPE tokens are
    sub-character there; the snap moves <= 3 bytes, the start skips
    forward past continuation bytes and the end extends forward to
    complete the character, so adjacent snapped boundaries COINCIDE
    and concatenating chunks at overlap=0 still reconstructs the
    document exactly — pinned by the CJK pytest). Empty documents
    produce no chunks. One Arrow-vectorized mapInPandas — encode once
    per document, emit all chunks from the same piece list; map-side,
    no shuffle. Returns (id, chunk_idx, text, n_tokens); the id
    column keeps the input's type.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"overlap must be in [0, max_tokens), got {overlap}")
    stride = max_tokens - overlap
    bc, tkey = _broadcast_tokenizer(df, tokenizer)
    src = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))

    def gen(batches):
        import pandas as pd

        tok = _tokenizer_from_broadcast(bc, tkey)

        def snap(full: bytes, pos: int) -> int:
            # forward to the next UTF-8 character boundary (skip
            # continuation bytes 0b10xxxxxx); <= 3 steps by encoding
            while pos < len(full) and (full[pos] & 0xC0) == 0x80:
                pos += 1
            return pos

        for pdf in batches:
            ids, idxs, texts, ntoks = [], [], [], []
            for did, text in zip(pdf["_id"], pdf["_text"]):
                if text is None:
                    continue
                pieces = tok.encode_pieces(text)
                n = len(pieces)
                if n == 0:
                    continue
                full = b"".join(pieces)
                # byte offset of each token boundary
                offs = [0]
                for p in pieces:
                    offs.append(offs[-1] + len(p))
                start = 0
                ci = 0
                while True:
                    end = min(start + max_tokens, n)
                    bs = snap(full, offs[start])
                    be = snap(full, offs[end])
                    ids.append(did)
                    idxs.append(ci)
                    texts.append(full[bs:be].decode("utf-8"))
                    ntoks.append(end - start)
                    if start + max_tokens >= n:
                        break
                    start += stride
                    ci += 1
            yield pd.DataFrame({
                "_id": pd.Series(ids, dtype=pdf["_id"].dtype),
                "chunk_idx": pd.Series(idxs, dtype="int64"),
                "text": pd.Series(texts, dtype="object"),
                "n_tokens": pd.Series(ntoks, dtype="int64"),
            })

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType)

    schema = StructType([
        StructField("_id", df.schema[id_col].dataType, True),
        StructField("chunk_idx", LongType(), False),
        StructField("text", StringType(), False),
        StructField("n_tokens", LongType(), False),
    ])
    out = src.mapInPandas(gen, schema)
    return out.select(F.col("_id").alias(id_col), "chunk_idx", "text",
                      "n_tokens")


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer — the Llama/T5 family
# ---------------------------------------------------------------------------

class UnigramTokenizer:
    """Byte-level unigram-LM subword tokenizer (the SentencePiece
    model family: Kudo 2018, "Subword Regularization" — the published
    algorithm; no SentencePiece code is used). A piece vocabulary
    carries log-probabilities; encoding segments each pre-token
    (same _PRETOKEN_RE as BPE, so the two tokenizers see identical
    word boundaries) into the MAXIMUM-LIKELIHOOD piece sequence by
    Viterbi over its UTF-8 bytes.

    Byte fallback: all 256 single bytes are always in the vocabulary
    (missing ones at ``byte_logp``, default min(vocab)-10), so
    encoding is TOTAL and decode(encode(s)) == s for any s — the same
    losslessness contract as BPETokenizer, pinned by the shared
    pytest suite.

    Determinism: Viterbi ties (equal total log-prob) break toward the
    LONGER final piece (the inner loop scans piece lengths ascending
    and accepts on >=), so segmentation is a pure function of the
    vocabulary. Ids: 0-255 are the raw bytes; multi-byte pieces get
    256+i in lexicographic piece order.
    """

    def __init__(self, vocab, byte_logp: "float | None" = None):
        explicit: dict[bytes, float] = {}
        for piece, lp in vocab:
            b = piece.encode("utf-8") if isinstance(piece, str) \
                else bytes(piece)
            if not b:
                raise ValueError("empty piece in unigram vocabulary")
            explicit[b] = float(lp)
        self._vocab_arg = sorted(explicit.items())
        if byte_logp is None:
            byte_logp = (min(explicit.values()) if explicit else 0.0) - 10.0
        self.byte_logp = float(byte_logp)
        self.logp: dict[bytes, float] = dict(explicit)
        for i in range(256):
            self.logp.setdefault(bytes([i]), self.byte_logp)
        self.max_len = max(len(p) for p in self.logp)
        self.vocab: dict[bytes, int] = {bytes([i]): i for i in range(256)}
        for p in sorted(k for k in self.logp if len(k) > 1):
            self.vocab[p] = len(self.vocab)
        self.id_to_piece = {i: p for p, i in self.vocab.items()}
        self._word_cache = lru_cache(maxsize=65536)(self._viterbi_word)

    def __reduce__(self):
        return (UnigramTokenizer, (self._vocab_arg, self.byte_logp))

    def content_key(self) -> str:
        import hashlib

        return hashlib.sha256(
            repr((self._vocab_arg, self.byte_logp)).encode()).hexdigest()

    def _viterbi_word(self, word: bytes) -> tuple[bytes, ...]:
        n = len(word)
        logp = self.logp
        max_len = self.max_len
        best = [-_INF] * (n + 1)
        back = [0] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            bi = -_INF
            bj = i - 1
            lo = max(0, i - max_len)
            # lengths ascending; >= keeps the LONGER piece on ties
            for j in range(i - 1, lo - 1, -1):
                lp = logp.get(word[j:i])
                if lp is None:
                    continue
                score = best[j] + lp
                if score >= bi:
                    bi, bj = score, j
            best[i], back[i] = bi, bj
        pieces: list[bytes] = []
        i = n
        while i > 0:
            j = back[i]
            pieces.append(word[j:i])
            i = j
        pieces.reverse()
        return tuple(pieces)

    def encode_pieces(self, text: str) -> list[bytes]:
        pieces: list[bytes] = []
        for word in _PRETOKEN_RE.findall(text):
            pieces.extend(self._word_cache(word.encode("utf-8")))
        return pieces

    def encode(self, text: str) -> list[int]:
        return [self.vocab[p] for p in self.encode_pieces(text)]

    def decode(self, ids) -> str:
        return b"".join(self.id_to_piece[int(i)] for i in ids).decode(
            "utf-8", errors="replace")

    def count(self, text: str) -> int:
        return len(self.encode_pieces(text))


def disjoint_digraph_unigram() -> UnigramTokenizer:
    """The closed-form unigram vocabulary mirroring
    disjoint_digraph_tokenizer: pieces {th, er, in, as} at log-prob
    -1.0 over a -3.0 byte floor. A digraph (-1.0) always beats its
    two bytes (-6.0), the four character sets are pairwise disjoint
    (occurrences can neither overlap nor interact), and none is
    self-overlapping — so the Viterbi-optimal segmentation uses EVERY
    occurrence and the token count has the exact SQL form
    bytes - sum(occurrences), the same oracle as the BPE twin. The
    engine still runs full Viterbi; only the vocabulary is special.
    """
    return UnigramTokenizer(
        [("th", -1.0), ("er", -1.0), ("in", -1.0), ("as", -1.0)],
        byte_logp=-3.0)


def learn_unigram(
    word_counts: dict[bytes, int],
    vocab_size: int = 8000,
    max_piece_len: int = 8,
    num_iters: int = 3,
    seed_factor: int = 10,
) -> list[tuple[bytes, float]]:
    """Learn a unigram piece vocabulary from a word histogram (pure
    Python — the driver-side half of train_unigram, like learn_bpe
    for BPE). SentencePiece-style:

    1. SEED: every substring (length 2..max_piece_len) of every
       histogram word, weighted by word count; capped to the top
       ``seed_factor * vocab_size`` by (count, piece) — deterministic.
    2. EM (hard/Viterbi variant, ``num_iters`` rounds): E-step
       re-segments the histogram under the current piece log-probs
       (count-weighted); M-step re-estimates p(piece) from the
       segmentation counts; pieces that won zero occurrences drop.
    3. PRUNE to ``vocab_size`` multi-byte pieces by final count
       (ties lexicographic), probabilities renormalized once more.

    Hard-EM instead of forward-backward expected counts is the
    documented deterministic trade: the same argmax the encoder uses,
    so training and encoding can never disagree on a segmentation.
    Returns [(piece, logp)] for UnigramTokenizer.
    """
    import math

    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    # 1. seed candidates
    cand: dict[bytes, int] = {}
    for w, c in word_counts.items():
        n = len(w)
        for i in range(n):
            for ln in range(2, min(max_piece_len, n - i) + 1):
                sub = w[i:i + ln]
                cand[sub] = cand.get(sub, 0) + c
    cap = max(vocab_size * seed_factor, 256)
    seeds = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
    # single bytes always present (fallback floor handled by the
    # tokenizer; here they get their true corpus counts)
    byte_counts: dict[bytes, int] = {}
    for w, c in word_counts.items():
        for b in w:
            k = bytes([b])
            byte_counts[k] = byte_counts.get(k, 0) + c
    counts = dict(seeds)
    counts.update(byte_counts)

    def _logp_table(tbl: dict[bytes, int]) -> dict[bytes, float]:
        total = sum(tbl.values())
        return {p: math.log(c / total) for p, c in tbl.items() if c > 0}

    for _ in range(num_iters):
        tok = UnigramTokenizer(
            [(p, lp) for p, lp in _logp_table(counts).items()])
        new_counts: dict[bytes, int] = {}
        for w, c in word_counts.items():
            for piece in tok._viterbi_word(w):
                new_counts[piece] = new_counts.get(piece, 0) + c
        # single bytes survive even when a round never picks them
        for k, v in byte_counts.items():
            new_counts.setdefault(k, v)
        counts = new_counts
    multi = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                   key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    final = dict(multi)
    final.update({p: c for p, c in counts.items() if len(p) == 1})
    return sorted(_logp_table(final).items())


def train_unigram(
    df: DataFrame,
    vocab_size: int = 8000,
    text_col: str = "text",
    max_words: int = 1_000_000,
    max_piece_len: int = 8,
    num_iters: int = 3,
) -> UnigramTokenizer:
    """Train a unigram-LM tokenizer on a corpus: the SAME distributed
    capped word histogram as train_bpe (one map-side-combined
    groupBy — the only corpus-sized stage), then the sequential EM
    loop on the compact histogram driver-side (how production
    tokenizer trainers structure it; the EM rounds are inherently
    sequential). Deterministic end to end — a pure-Python histogram
    replica trains the identical vocabulary (pytest)."""
    counts = word_histogram(df, text_col=text_col, max_words=max_words)
    return UnigramTokenizer(learn_unigram(
        counts, vocab_size=vocab_size, max_piece_len=max_piece_len,
        num_iters=num_iters))


def tokenizer_fertility(
    df: DataFrame,
    tokenizer,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer FERTILITY report — the standard diagnostic
    when sizing/choosing a vocabulary for a multilingual corpus
    (tokens-per-word varies 1.3-4x by language and tokenizer family,
    which shifts every token-budgeted decision downstream: mixture
    weights, packing bins, context windows, cost estimates):

      (group, n_docs, n_words, n_tokens, n_bytes,
       fertility        = n_tokens / n_words    (lower = better fit),
       bytes_per_token  = n_bytes / n_tokens    (compression view))

    Works with EITHER tokenizer family (BPE / unigram) through the
    shared broadcast machinery; whitespace words use the same
    empty-string guard as text.token_count. One map-side projection +
    ONE |groups|-row groupBy — scan-bound at any corpus size. Ratios
    rounded to 6 dp (cross-engine exact: both numerator and
    denominator are exact integer sums).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.when(F.length(F.trim(F.col(text_col))) == 0,
                     F.lit(0)).otherwise(F.size(toks)).cast("long")
    cnt = bpe_token_count_col(df, tokenizer, text_col)
    per_doc = df.select(
        F.col(group_col),
        n_words.alias("_w"),
        cnt.alias("_t"),
        F.octet_length(F.col(text_col)).cast("long").alias("_b"),
    )
    agg = per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_w").alias("n_words"),
        F.sum("_t").alias("n_tokens"),
        F.sum("_b").alias("n_bytes"),
    )
    return agg.select(
        F.col(group_col), "n_docs", "n_words", "n_tokens", "n_bytes",
        F.when(F.col("n_words") > 0,
               F.round(F.col("n_tokens") / F.col("n_words"), 6))
        .alias("fertility"),
        F.when(F.col("n_tokens") > 0,
               F.round(F.col("n_bytes") / F.col("n_tokens"), 6))
        .alias("bytes_per_token"),
    )


# ---------------------------------------------------------------------------
# tokenizer persistence (r11, VERDICT r10 ask #6): a production pipeline
# trains a vocabulary ONCE and ships it — token accounting must be
# reproducible across sessions and auditable across time. Persisted
# under the SAME manifest discipline as the index families
# (operators/index_store.py): the vocabulary payload is a
# CONTENT-ADDRESSED blob (blobs/{content_key}.json — re-saving the
# same tokenizer rewrites identical bytes, so blob writes are
# idempotent and conflict-free), and the pointer to it lands in one
# atomic manifest commit, giving save/load the commit-log serialization,
# time travel (load_tokenizer(as_of_seq=)) and crash-safety the index
# tiers already have.
# ---------------------------------------------------------------------------

def save_tokenizer(spark, tokenizer, path: str) -> dict:
    """Persist a trained tokenizer (BPE or unigram) at ``path``.

    Layout: ``{path}/blobs/{content_key}.json`` (the vocabulary,
    content-addressed by the tokenizer's deterministic content_key)
    plus one manifest commit whose ``tiers['tokenizer']`` points at
    the blob and whose ``tokenizer_meta`` records the family and key.
    Returns the committed manifest. Loaded tokenizers encode
    BIT-IDENTICALLY to the saved instance (round-trip pytest)."""
    import base64
    import json as _json

    from .index_store import (
        _fs,
        _jp,
        _write_small_file,
        commit_manifest,
        current_manifest,
    )

    if isinstance(tokenizer, BPETokenizer):
        kind = "bpe"
        payload = {
            "kind": kind,
            "merges": [[base64.b64encode(a).decode("ascii"),
                        base64.b64encode(b).decode("ascii")]
                       for a, b in tokenizer.merges],
        }
    elif isinstance(tokenizer, UnigramTokenizer):
        kind = "unigram"
        payload = {
            "kind": kind,
            "byte_logp": tokenizer.byte_logp,
            "vocab": [[base64.b64encode(p).decode("ascii"), lp]
                      for p, lp in tokenizer._vocab_arg],
        }
    else:
        raise TypeError(
            f"save_tokenizer supports BPETokenizer and UnigramTokenizer, "
            f"got {type(tokenizer).__name__}")
    key = tokenizer.content_key()
    payload["content_key"] = key
    blob_rel = f"blobs/{key}.json"
    raw = _json.dumps(payload, sort_keys=True).encode("utf-8")
    jvm, fs = _fs(spark, path)
    final = _jp(jvm, f"{path}/{blob_rel}")
    if not fs.exists(final):
        # temp + rename like the manifest commit; a rename that loses
        # to a concurrent identical save is fine — content-addressing
        # makes the existing blob byte-equal by construction
        tmp = _jp(jvm, f"{path}/blobs/.tmp-{key}.json")
        _write_small_file(fs, tmp, raw)
        if not fs.rename(tmp, final) and not fs.exists(final):
            raise RuntimeError(
                f"tokenizer blob publish failed at {path}/{blob_rel}")
        if fs.exists(tmp):
            fs.delete(tmp, False)
    m = current_manifest(spark, path)
    m2 = dict(m)
    m2["seq"] = int(m.get("seq", 0)) + 1
    m2.setdefault("version", 1)
    m2["tiers"] = {**m.get("tiers", {}), "tokenizer": blob_rel}
    m2.setdefault("hwm", None)
    m2.setdefault("delta_floor", None)
    m2["tokenizer_meta"] = {"kind": kind, "content_key": key}
    commit_manifest(spark, path, m2)
    return m2


def load_tokenizer(spark, path: str, as_of_seq: "int | None" = None):
    """Load the tokenizer committed at ``path`` — the newest manifest,
    or (time travel) exactly the vocabulary a pipeline at manifest
    commit ``as_of_seq`` scored with. Verifies the payload's recorded
    content_key against the reconstructed tokenizer's, so a corrupted
    or hand-edited blob fails loudly instead of mis-tokenizing."""
    import base64
    import json as _json

    from .index_store import (
        _fs,
        _jp,
        _read_small_file,
        current_manifest,
        manifest_at,
    )

    m = (manifest_at(spark, path, as_of_seq) if as_of_seq is not None
         else current_manifest(spark, path))
    blob_rel = m.get("tiers", {}).get("tokenizer")
    if blob_rel is None:
        raise ValueError(f"no tokenizer committed at {path}"
                         + (f" as of seq {as_of_seq}"
                            if as_of_seq is not None else ""))
    jvm, fs = _fs(spark, path)
    jp = _jp(jvm, f"{path}/{blob_rel}")
    if not fs.exists(jp):
        raise ValueError(
            f"tokenizer blob {blob_rel} referenced by manifest seq "
            f"{m.get('seq')} is missing at {path}")
    payload = _json.loads(_read_small_file(jvm, fs, jp).decode("utf-8"))
    kind = payload.get("kind")
    if kind == "bpe":
        tok = BPETokenizer(
            [(base64.b64decode(a), base64.b64decode(b))
             for a, b in payload["merges"]])
    elif kind == "unigram":
        tok = UnigramTokenizer(
            [(base64.b64decode(p), float(lp))
             for p, lp in payload["vocab"]],
            byte_logp=float(payload["byte_logp"]))
    else:
        raise ValueError(f"unknown tokenizer kind {kind!r} in {blob_rel}")
    want = payload.get("content_key")
    got = tok.content_key()
    if want != got:
        raise ValueError(
            f"tokenizer blob {blob_rel} failed its content check: "
            f"recorded {want}, reconstructed {got} — corrupted or "
            f"hand-edited vocabulary")
    return tok
