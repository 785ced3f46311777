"""Deterministic sampling / split assignment for training-data pipelines.

Beyond-reference surface (the reference engine has no sampling
operators; the driver brief's LLM-pipeline family). Reproducible
selection is a hard requirement for training corpora: the same document
must land in the same split on every run, on any cluster, under any
partitioning — so none of this uses Spark's ``df.sample`` (whose RNG is
seeded per partition and therefore repartition-SENSITIVE).

Selection key = Knuth multiplicative hash of a numeric id:
``((key + salt) * 2654435761) mod 2^32`` — map-side, codegen'd, and
exactly expressible in ANSI SQL, so every operator here has a
cross-engine oracle. Safe for FULL 64-bit keys (snowflake ids,
``F.xxhash64(col)`` pre-hashes of string keys — then the oracle is
rows-only, like the LSH family): the multiply is split 16/16 so no
intermediate overflows BIGINT under ANSI mode.

At 100 TB: all operators are single-pass projections/filters with NO
shuffle — sampling must never cost more than the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761  # 2^32 * golden-ratio conjugate, Knuth §6.4
_M32 = 1 << 32


def _bucket(key: Column, salt: int) -> Column:
    """Deterministic uniform bucket in [0, 2^32) from a numeric key.

    Salt is mixed into the multiplicand (``(key + salt) * KNUTH``), not
    added afterward — a post-add would only rotate bucket values, so
    every salt would select nearly the same rows.

    The product is computed mod 2^32 with a 16/16 split so NO
    intermediate exceeds 2^48: a naive ``(key + salt) * KNUTH`` throws
    ARITHMETIC_OVERFLOW under Spark 4's default ANSI mode for keys
    above ~3.47e9 (any 64-bit id or xxhash64 pre-hash). Congruence
    keeps the value identical to the plain formula for small keys, so
    the DuckDB oracles (which use small doc_ids) are unchanged.
    """
    k32 = F.pmod(F.pmod(key.cast("long"), F.lit(_M32)) + F.lit(salt), F.lit(_M32))
    lo = k32.bitwiseAND(F.lit(0xFFFF))
    hi = F.shiftright(k32, 16)
    # (k32*K) mod 2^32 == (K*lo + ((K*hi mod 2^16) << 16)) mod 2^32
    return F.pmod(
        F.lit(_KNUTH) * lo
        + F.pmod(F.lit(_KNUTH) * hi, F.lit(1 << 16)) * F.lit(1 << 16),
        F.lit(_M32),
    )


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                salt: int = 0) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, selected by key hash.

    Properties Spark's ``sample()`` does not give:
    - reproducible across runs/partitionings (pure function of the key)
    - consistent across tables: the same (key, salt) always selects the
      same rows, so sampled fact/dim tables still join
    - nested: hash_sample(.., 0.01) is a subset of hash_sample(.., 0.1)
      at the same salt (threshold on the same bucket value)
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thresh = int(fraction * _M32)
    return df.filter(_bucket(F.col(key_col), salt) < F.lit(thresh))


def mixture_sample(df: DataFrame, group_col: str, targets: dict[str, float],
                   key_col: str, salt: int = 0,
                   weight_col: str | None = None,
                   tokenizer=None, text_col: str = "text") -> DataFrame:
    """Downsample groups to a TARGET MIXTURE — the data-mixing step of
    a training pipeline ("50% en / 30% code / 20% the rest").

    ``targets`` maps group value -> desired weight share of the output
    (weights measured by ``weight_col``, e.g. token counts; rows if
    None). Groups absent from ``targets`` are dropped. The output is
    the LARGEST corpus achieving the target proportions without
    upsampling: T = min_g(weight_g / target_g); each group keeps
    rate_g = target_g * T / weight_g of its weight (the binding group
    keeps everything). Selection uses the deterministic key hash, so
    the mix is reproducible and nested like hash_sample.

    Scale: one partial-aggregated groupBy for the per-group weights
    (|groups| rows), a 1-row min, broadcast rate join, map-side filter
    — cost is the scan plus one tiny shuffle regardless of corpus
    size. Entirely plan-side: no driver collect.

    Pass ``tokenizer`` (a tokenize.BPETokenizer) to measure the
    mixture in real BPE tokens of ``text_col`` — the denomination a
    training run actually budgets — instead of rows / ``weight_col``.
    """
    if not targets or any(t <= 0 for t in targets.values()):
        raise ValueError(f"targets must be positive shares: {targets}")
    drop_weight = ()
    if tokenizer is not None:
        from .tokenize import bpe_token_count_col

        weight_col = "_bpe_tokens"
        drop_weight = (weight_col,)  # temp column must not leak out
        df = df.withColumn(
            weight_col, bpe_token_count_col(df, tokenizer, text_col))
    tmap = F.create_map(*[F.lit(x) for kv in targets.items() for x in kv])
    # aggregate weights in their native (integer-exact) type and cast
    # AFTER the sum: a double-typed partial sum would be partition-
    # order-dependent in its last bit, breaking reproducibility
    w = F.col(weight_col) if weight_col else F.lit(1)
    stats = (
        df.groupBy(group_col).agg(F.sum(w).alias("_ws"))
        .select(
            F.col(group_col),
            F.col("_ws").cast("double").alias("_w"),
            tmap[F.col(group_col)].alias("_target"),
        )
        .filter(F.col("_target").isNotNull())
    )
    tmin = stats.select(F.min(F.col("_w") / F.col("_target")).alias("_T"))
    rates = stats.crossJoin(F.broadcast(tmin)).select(
        F.col(group_col),
        F.least(
            F.lit(1.0), F.col("_target") * F.col("_T") / F.col("_w")
        ).alias("_rate"),
    )
    out = df.join(F.broadcast(rates), group_col, "inner")
    return out.filter(
        _bucket(F.col(key_col), salt) < F.col("_rate") * F.lit(float(_M32))
    ).drop("_rate", *drop_weight)


def split_assign(df: DataFrame, key_col: str,
                 weights: dict[str, float] | None = None,
                 salt: int = 0, split_col: str = "split") -> DataFrame:
    """Add a deterministic train/val/test split label column.

    ``weights`` maps label -> fraction (must sum to <= 1; any remainder
    falls into the last label). Assignment is a pure function of
    (key, salt): stable under reruns, repartitions, and incremental
    ingestion — a document never migrates between splits.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if any(w < 0 for w in weights.values()) or sum(weights.values()) > 1.0 + 1e-9:
        raise ValueError(f"weights must be >=0 and sum <=1: {weights}")
    bucket = _bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for name, w in labels[:-1]:
        acc += w
        cond = bucket < F.lit(int(acc * _M32))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def cap_per_key(df: DataFrame, key_col: str, k: int,
                order_col: str | None = None,
                descending: bool = False) -> DataFrame:
    """Keep at most ``k`` rows per ``key_col`` value — the per-domain
    document cap of crawl-curation pipelines (RefinedWeb/C4 keep <= N
    pages per host so megasites can't dominate the corpus). Rows are
    ranked by ``order_col`` (default: the first non-key column;
    ``descending`` for "keep the best k" when the order is a score),
    ties broken by the order value itself being unique per key — pass
    a unique id/score column for deterministic output.

    Plan: one shuffle on key + rank<=k filter. Catalyst rewrites the
    row_number + filter into WindowGroupLimit, which applies the limit
    PARTIALLY BEFORE the exchange — each map task forwards at most k
    rows per key it sees, so a hot key (the skew case the operator
    exists for) ships executors*k rows instead of its full multi-
    million-row group. That pre-shuffle truncation is what makes the
    cap safe at 100 TB.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    if order_col is None:
        order_col = next(c for c in df.columns if c != key_col)
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(key_col).orderBy(oc)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _word_ngram_features(text_col: str, orders: tuple[int, ...]) -> Column:
    """Concatenated word n-gram array of lower(trim(text)) for every
    order in ``orders`` — the DSIR feature extractor (unigrams+bigrams
    by default, matching Xie et al. 2023 §3). split('' ) yields ['']
    so even an empty document has one unigram feature (consistent in
    the ANSI SQL twin)."""
    ws = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    if tuple(sorted(orders)) == (1,):
        return ws

    # bind the split word array ONCE per row as a lambda variable:
    # Catalyst does not CSE through higher-order-function lambdas, so
    # referencing the split inside the per-position slice re-ran the
    # regex split once per output n-gram (the _char_ngrams lesson,
    # r11). SQL form with EXPLICIT lambda names — pyspark's Column-API
    # nested lambdas shadow their auto-generated variable names.
    parts = []
    for n in sorted(orders):
        if n == 1:
            parts.append("_w")
        else:
            parts.append(
                f"CASE WHEN size(_w) >= {n} THEN "
                f"transform(sequence(0, size(_w) - {n}), "
                f"_p -> concat_ws(' ', slice(_w, _p + 1, {n}))) "
                f"ELSE array() END"
            )
    body = parts[0] if len(parts) == 1 else "concat(" + ", ".join(parts) + ")"
    norm = f"split(trim(lower({text_col})), '\\\\s+')"
    return F.expr(f"transform(array({norm}), _w -> {body})[0]")


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    orders: tuple[int, ...] = (1, 2),
    num_buckets: int | None = None,
    smoothing: float = 0.5,
    salt: int = 0,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): pick the ``k`` raw documents whose hashed-n-gram
    distribution looks most like a TARGET corpus, by Gumbel top-k over
    importance log-weights

        log w(x) = Σ_features count_f(x) · (log p̂_target(f) − log q̂_raw(f))

    with both bag-of-features models Lidstone-smoothed over the shared
    cross-corpus vocabulary (the lang_ngram_model recipe applied to a
    target/raw pair). Gumbel resampling-without-replacement keeps the
    selected set DISTRIBUTIONALLY matched to the target instead of
    collapsing onto near-duplicates of its mode, which is the paper's
    point vs plain top-weight selection; here the Gumbel draw is the
    DETERMINISTIC Knuth bucket of the document id —
    g = −ln(−ln((bucket(id, salt)+0.5)/2³²)) — so selection is
    reproducible across runs/partitionings AND the whole operator
    (noise included) replays in ANSI SQL for cross-engine oracles.
    Non-numeric ids fold through xxhash64 for the noise only (then the
    oracle is rows-only, the LSH-family convention).

    ``num_buckets``: hash features into a bounded space
    (xxhash64 mod buckets — the paper uses 10k). That caps BOTH model
    frames at num_buckets rows — broadcastable at any corpus scale —
    which is the 100 TB deployment shape; the default (None) keeps raw
    gram features so the model math is exactly replayable in SQL.
    Collisions fold feature counts together (the paper's variance
    argument: unbiased enough at 10k buckets).

    Distributed shape: two explode+groupBy passes build the models
    (target presumably small; raw model is one map-side-combined
    groupBy), a full-outer feature join + three broadcast 1×1s
    (totals, vocab) form per-feature deltas, scoring is one
    explode+join+groupBy over the raw corpus, and the top-k is a
    distributed TakeOrdered — no driver-side loop anywhere.

    Returns the selected rows: (id, log_weight, gumbel_key), both
    rounded (4) for cross-engine comparability, ordered by the
    UNROUNDED key descending (ties by id).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    if not orders or any(n < 1 for n in orders):
        raise ValueError(f"orders must be positive n-gram sizes, got {orders}")

    feats = _word_ngram_features(text_col, tuple(orders))
    if num_buckets is not None:
        if num_buckets < 2:
            raise ValueError(f"num_buckets must be >= 2, got {num_buckets}")
        feat_expr = F.pmod(F.xxhash64(F.col("_g")), F.lit(int(num_buckets)))
    else:
        feat_expr = F.col("_g")

    # the n-gram explode is the heavy stage and a small corpus often
    # arrives as ONE parquet row group (one scan task) — spread it so
    # the explode parallelizes; a many-split corpus is left alone
    # (common.spread_narrow's contract)
    from .common import spread_narrow

    raw_feats = (
        spread_narrow(df.select(F.col(id_col), F.col(text_col)), id_col)
        .select(F.col(id_col), F.explode(feats).alias("_g"))
        .select(F.col(id_col), feat_expr.alias("_f"))
        .localCheckpoint(eager=False)
    )
    # target spreads keyed on the text itself — deterministic under
    # task retry where a synthetic row number would not be
    tgt_feats = (
        spread_narrow(target.select(F.col(text_col)), text_col)
        .select(F.explode(feats).alias("_g"))
        .select(feat_expr.alias("_f"))
    )

    tc = tgt_feats.groupBy("_f").agg(F.count(F.lit(1)).alias("_ct"))
    rc = raw_feats.groupBy("_f").agg(F.count(F.lit(1)).alias("_cr"))
    vocab = (
        tc.select("_f").unionByName(rc.select("_f")).distinct()
        .agg(F.count(F.lit(1)).cast("double").alias("_v"))
    )
    # coalesce(…, 0): an EMPTY target degrades to the uniform-target
    # limit (delta = log(1/V) − log q̂) instead of null-poisoning weights
    tt = tc.agg(F.coalesce(F.sum("_ct"), F.lit(0))
                .cast("double").alias("_tt"))
    tr = rc.agg(F.coalesce(F.sum("_cr"), F.lit(0))
                .cast("double").alias("_tr"))
    s = float(smoothing)
    model = (
        tc.join(rc, "_f", "full_outer")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
        .select(
            "_f",
            (
                F.log((F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(s))
                      / (F.col("_tt") + F.lit(s) * F.col("_v")))
                - F.log((F.coalesce(F.col("_cr"), F.lit(0)) + F.lit(s))
                        / (F.col("_tr") + F.lit(s) * F.col("_v")))
            ).alias("_delta"),
        )
    )
    # every raw feature occurrence is in the raw model by construction,
    # so the inner join loses nothing; the left join back onto the id
    # set is belt-and-braces for degenerate corpora
    weights = (
        raw_feats.join(model, "_f")
        .groupBy(id_col)
        .agg(F.sum("_delta").alias("_lw"))
    )
    id_dtype = dict(df.dtypes)[id_col]
    noise_key = (F.col(id_col) if id_dtype in
                 ("tinyint", "smallint", "int", "bigint")
                 else F.xxhash64(F.col(id_col)))
    u = (_bucket(noise_key, salt) + F.lit(0.5)) / F.lit(float(_M32))
    keyed = (
        df.select(F.col(id_col)).distinct()
        .join(weights, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_lw"), F.lit(0.0)).alias("_lw"),
            (-F.log(-F.log(u))).alias("_gum"),
        )
    )
    return (
        keyed.select(
            F.col(id_col),
            (F.col("_lw") + F.col("_gum")).alias("_key"),
            F.round(F.col("_lw"), 4).alias("log_weight"),
            F.round(F.col("_lw") + F.col("_gum"), 4).alias("gumbel_key"),
        )
        .orderBy(F.col("_key").desc(), F.col(id_col))
        .limit(int(k))
        .drop("_key")
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    key_col: str = "doc_id",
    salt: int = 0,
    group_cols: tuple = (),
    on_nonpositive: str = "error",
) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup 2005): the n rows
    with the largest priority q = w / u per group, plus the UNBIASED
    per-row weight estimate ``w_hat = max(w, tau)``.

    u is the deterministic uniform ``(fmix32(key)+0.5)/2^32`` (the
    dsir Gumbel device), tau the (n+1)-th largest priority (0 when the
    group fits entirely, making the sample exact). sum(w_hat) over ANY
    kept subset unbiasedly estimates that subset's true weight sum —
    the property plain weighted top-k does not have, and the reason
    this is the right primitive for weight-proportional corpus
    subsampling with downstream per-slice accounting.

    Deterministic end to end — same rows and estimates on any
    partitioning, replayable in ANSI SQL (q is two IEEE divisions,
    ties broken by key). Scale: grouped selection compiles to the
    partial pre-shuffle WindowGroupLimit plan (each partition ships
    <= n+1 rows per group); ungrouped uses sort+limit
    (TakeOrderedAndProject). Weights must be > 0 per the paper;
    ``on_nonpositive``: 'error' (in-plan assertion) or 'drop'.
    """
    from pyspark.sql import Window

    from .sketches import _attach_mix32, _M32 as _SM32

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = F.col(weight_col).cast("double")
    if on_nonpositive == "drop":
        df = df.where(w > 0)
    elif on_nonpositive == "error":
        w = F.when(w > 0, w).otherwise(
            F.raise_error(F.concat(
                F.lit(f"priority_sample: nonpositive {weight_col}: "),
                w.cast("string"))).cast("double"))
    else:
        raise ValueError(f"on_nonpositive must be error|drop,"
                         f" got {on_nonpositive!r}")
    staged = _attach_mix32(
        df.select(*group_cols, key_col, weight_col),
        F.col(key_col), salt, "_ph")
    u = (F.col("_ph") + F.lit(0.5)) / F.lit(float(_SM32))
    staged = staged.select(
        *group_cols, key_col, w.alias("_w"), (w / u).alias("_q"))
    if group_cols:
        win = Window.partitionBy(*[F.col(c) for c in group_cols]) \
            .orderBy(F.col("_q").desc(), F.col(key_col))
        top = staged.withColumn("_rn", F.row_number().over(win)) \
            .where(F.col("_rn") <= n + 1)
    else:
        top = staged.orderBy(F.col("_q").desc(), F.col(key_col)) \
            .limit(n + 1)
        win = Window.partitionBy().orderBy(F.col("_q").desc(),
                                           F.col(key_col))
        top = top.withColumn("_rn", F.row_number().over(win))
    taus = (
        top.groupBy(*group_cols)
        .agg(F.max(F.when(F.col("_rn") == n + 1, F.col("_q")))
             .alias("_tau"))
    )
    kept = top.where(F.col("_rn") <= n)
    joined = (kept.join(F.broadcast(taus), list(group_cols), "left")
              if group_cols else kept.crossJoin(F.broadcast(taus)))
    tau = F.coalesce(F.col("_tau"), F.lit(0.0))
    return joined.select(
        *group_cols, key_col,
        F.col("_w").alias(weight_col),
        F.greatest(F.col("_w"), tau).alias("weight_est"),
    )


def negative_samples(
    pairs: DataFrame,
    n_items: int,
    k: int = 4,
    salt: int = 0,
    query_col: str = "query_id",
    item_col: str = "item_id",
    item_base: int = 0,
) -> DataFrame:
    """(query, positive, neg_rank, negative): k deterministic uniform
    negatives per positive pair — the word2vec/DSSM/GNN contrastive-
    training sampler. Negative j of pair (q, i) is
    ``bucket(q*1000003 + i*8191 + j, salt) mod n_items + item_base``,
    nudged forward by one (mod n) when it collides with the pair's own
    positive — deterministic on any partitioning, replayable in ANSI
    SQL (the random_walks discipline). Other positives of the same
    query are NOT excluded (the standard in-batch trade: exclusion
    would need a per-query positive set join; callers who want it
    compose an anti-join or use hard_negatives).

    Map-side only: one explode of k rows per pair, zero shuffle.
    """
    if k < 1 or k > 64:
        raise ValueError(f"k must be in [1, 64], got {k}")
    if n_items < 2:
        raise ValueError(f"n_items must be >= 2, got {n_items}")
    q, i = F.col(query_col), F.col(item_col)
    out = pairs.select(
        q, i,
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("neg_rank"),
    )
    seed = (F.pmod(q.cast("long"), F.lit(1000003)) * F.lit(1000003)
            + F.pmod(i.cast("long"), F.lit(8191)) * F.lit(8191)
            + F.col("neg_rank"))
    cand = F.pmod(_bucket(seed, salt), F.lit(n_items))
    fixed = F.when(cand + F.lit(item_base) == i,
                   F.pmod(cand + 1, F.lit(n_items))).otherwise(cand)
    return out.select(
        query_col, item_col, "neg_rank",
        (fixed + F.lit(item_base)).cast("long").alias("negative"),
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    salt: int = 0,
    weight_col: str | None = None,
    tokenizer=None,
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based mixture sampling — the multilingual-corpus
    rebalancing rule the published pretraining recipes use (XLM,
    Lample & Conneau 2019 §3.1; mT5's alpha sweep): target share
    q_g ∝ p_g^alpha where p_g is the group's natural share, alpha=1
    keeps the natural mix, alpha -> 0 approaches uniform. Unlike
    mixture_sample (explicit targets), the targets here are DERIVED
    from the corpus itself, then realized the same way: the output is
    the largest corpus achieving the q mixture without upsampling
    (T = min_g w_g/q_g; group g keeps rate_g = q_g * T / w_g, the
    binding group keeps everything), selected by the deterministic
    Knuth key hash so the sample is reproducible and nested.

    Cross-engine determinism: weights aggregate in their native
    integer type and cast AFTER the sum; alpha=0.5 (the default, and
    the common published setting) computes shares^alpha as sqrt —
    CORRECTLY-ROUNDED IEEE in every engine, unlike pow — and the
    per-group rate is rounded to 9 dp before the bucket comparison,
    so the boundary test is engine-exact. One partial-aggregated
    groupBy (|groups| rows) + broadcast rate join + map-side filter:
    scan-dominated at any corpus size.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    drop_weight = ()
    if tokenizer is not None:
        # tokenizer-true budgets, the mixture_sample convention: the
        # shares that get temperature-flattened are real BPE tokens
        from .tokenize import bpe_token_count_col

        weight_col = "_bpe_tokens"
        drop_weight = (weight_col,)
        df = df.withColumn(
            weight_col, bpe_token_count_col(df, tokenizer, text_col))
    w = F.col(weight_col) if weight_col else F.lit(1)
    stats = df.groupBy(group_col).agg(F.sum(w).alias("_ws")) \
        .select(F.col(group_col), F.col("_ws").cast("double").alias("_w"))
    tot = stats.agg(F.sum("_w").alias("_tot"))
    share = F.col("_w") / F.col("_tot")
    qraw = (F.sqrt(share) if alpha == 0.5
            else F.pow(share, F.lit(float(alpha))))
    scored = stats.crossJoin(F.broadcast(tot)) \
        .select(F.col(group_col), "_w", qraw.alias("_qraw"))
    norm = scored.agg(F.sum("_qraw").alias("_S"))
    qed = scored.crossJoin(F.broadcast(norm)).select(
        F.col(group_col), "_w",
        (F.col("_qraw") / F.col("_S")).alias("_q"))
    tmin = qed.select(F.min(F.col("_w") / F.col("_q")).alias("_T"))
    rates = qed.crossJoin(F.broadcast(tmin)).select(
        F.col(group_col),
        F.round(
            F.least(F.lit(1.0), F.col("_q") * F.col("_T") / F.col("_w")),
            9,
        ).alias("_rate"),
    )
    out = df.join(F.broadcast(rates), group_col, "inner")
    return out.filter(
        _bucket(F.col(key_col), salt) < F.col("_rate") * F.lit(float(_M32))
    ).drop("_rate", *drop_weight)
