"""Dump annotated physical plans for flagship queries to docs/PLANS.md.

Usage: python tools/show_plans.py [sf_dir]

Each section pairs the query with its `.explain("formatted")` output and
a short note on what to look for (pushed filters, elided scans, join
strategy, shuffle count) — the plan-shape contract that
tests/test_plans_sources.py asserts mechanically.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    (
        "agg_q1_pricing",
        "Edge-only aggregation: the Order and Part node joins are elided "
        "(no expression references them), so the whole query is ONE "
        "pruned+filtered lineitem scan -> partial agg -> exchange -> "
        "final agg, all inside WholeStageCodegen.",
    ),
    (
        "q5_local_supplier_volume",
        "6-way star join: dimension node tables broadcast; supplier/"
        "customer keys answered from edge endpoint ids (key-derivation "
        "elision) so only 7 scans / 6 joins remain for an 11-pattern "
        "query.",
    ),
    (
        "q21_sole_supplier",
        "Correlated NOT EXISTS decorrelated at compile time: the "
        "subquery becomes ONE anti-join with the inequality as join "
        "condition; its Supplier/Part node scans are elided, leaving "
        "two 2-column lineitem scans.",
    ),
    (
        "asof_join_purchases",
        "As-of join without range explosion: both sides union into one "
        "frame, a single shuffle on (user) orders by time, and "
        "last_value(ignoreNulls) fills each event with the latest "
        "preceding quote — one Exchange total.",
    ),
    (
        "minhash_lsh_pairs",
        "MinHash LSH: signature groupBy carries 64 partial-agg mins "
        "(map-side combined), band buckets self-join hash-to-hash; the "
        "only shuffles are the signature agg and the bucket join — "
        "no O(n^2) stage.",
    ),
    (
        "bm25_search_topk",
        "BM25 retrieval: postings explode filters to query terms inside "
        "the generator, document frequencies and corpus stats come back "
        "as BROADCAST joins (|query|-sized + 1-row), one per-doc score "
        "shuffle, and the final top-k is TakeOrderedAndProject — no "
        "global sort.",
    ),
    (
        "window_top_orders",
        "Top-n per group: one Exchange on the partition key feeding a "
        "single WindowExec (row_number) + filter — compare the "
        "reference's per-customer ORDER BY..LIMIT correlated subquery, "
        "a nested-loop re-scan per outer row.",
    ),
    (
        "ngram_jaccard_pairs",
        "PPJoin prefix-filter dedup (the default strategy): every "
        "shuffle key is an 8-byte xxhash64; the frequency source for "
        "rarest-first ordering is a size-based physical choice (count "
        "window on small inputs; sampled BROADCAST hot-shingle list "
        "past 64 input partitions, so no stage ever gathers a hot "
        "shingle's postings into one un-splittable window partition); "
        "hot stop-shingles fall out of every prefix, and candidates "
        "carry a length filter before the verify joins — the "
        "inverted-index variant's sum-over-shingles C(df,2) blowup "
        "cannot happen here.",
    ),
    (
        "streaming_dedup_batch",
        "Streaming dedup's batch fallback: hash projection is map-side; "
        "the single shuffle is the groupBy on the 8-byte content hash "
        "with partial min(id) aggregation. The stream path replaces the "
        "groupBy with applyInPandasWithState over the same key — state "
        "rows are 16 bytes/doc.",
    ),
    (
        "mixture_sample_langs",
        "Target-mixture resampling (round 3): ONE partial-aggregated "
        "groupBy for per-group weights, a 1-row min, then the per-group "
        "rates come back as BROADCAST joins onto the scan — the "
        "selection filter itself is a map-side Knuth-hash comparison. "
        "Corpus-size-independent overhead beyond the scan.",
    ),
    (
        "ngram_contamination",
        "Benchmark decontamination (round 3): the probe set's distinct "
        "shingle hashes BROADCAST to a left join against the map-side "
        "exploded corpus shingles; one groupBy on doc_id (8-byte key) "
        "finishes the overlap fractions. The corpus is scanned once; "
        "no corpus-side self-join exists.",
    ),
    (
        "hash_sample_fraction",
        "Deterministic sampling (round 3): pure map-side filter over "
        "the scan — the 16/16-split modular multiply is whole-stage "
        "codegen, no shuffle, no RNG state; sampling never costs more "
        "than the scan.",
    ),
    (
        "chunk_documents_overlap",
        "Token-window chunking (round 4): sequence + transform + "
        "explode entirely inside the scan stage's Generate — row "
        "expansion with ZERO shuffles and no Python; the 100 TB shape "
        "for context-window slicing.",
    ),
    (
        "probe_containment",
        "Per-eval-item containment (round 4): probe shingle hashes "
        "BROADCAST against the map-side corpus shingle stream (semi "
        "join), survivors distinct-ed at probe-bounded size and "
        "broadcast back — the corpus is scanned once and never "
        "shuffled.",
    ),
    (
        "ann_lsh_recall_audit",
        "ANN recall audit (round 4): the multi-table signatures are "
        "per-table projected columns evaluated once per row (NOT "
        "inlined per probe — a Catalyst-tree-size trap), probes "
        "explode map-side, and the candidate join runs on (table, "
        "bucket) structs; the exact side is one broadcast of 5 query "
        "rows. Hits via left-semi join; three 1-row aggregates "
        "cross-joined.",
    ),
    (
        "betweenness_chains",
        "Bounded Brandes (round 4): forward sigma-BFS batches levels "
        "between checkpoints (dedup cadence decoupled from batch "
        "size), the shortest-path DAG materializes ONCE "
        "(localCheckpoint) and every backward level filters it by "
        "dist — the sweep is join + groupBy per level with no "
        "re-derivation of the forward lineage.",
    ),
    (
        "token_count_bpe",
        "Tokenizer-true accounting (round 6): ONE Arrow-vectorized "
        "pandas UDF over the scan — the merge table ships by "
        "broadcast, encoding is per-executor-cached, and the plan is "
        "scan -> ArrowEvalPython -> project with zero exchanges: "
        "token counting must never cost more than the scan.",
    ),
    (
        "chunk_documents_bpe",
        "BPE chunking (round 6): a single mapInPandas stage does "
        "encode-once-emit-all-chunks per document — row expansion "
        "with no shuffle, the streaming-compatible shape "
        "(stream==batch pytest).",
    ),
    (
        "ann_rescore_topk",
        "Quantized-scan + exact-rescore ANN (round 6): stage 1 is "
        "mapInPandas (int8 integer GEMM vs broadcast quantized "
        "queries) emitting per-partition top-C rows only; the "
        "exchanges are the C-sized top-C window and the candidate "
        "re-join against items for full-precision vectors — 85% of "
        "the corpus's fp vectors never move.",
    ),
    (
        "quantize_embeddings_audit",
        "int8 quantization (round 6 fix): scale is a PROJECTED "
        "attribute, not inlined into the element lambda — inlined, "
        "the O(d) array_max re-evaluates per element (O(d^2)/row, "
        "measured 50.6s -> 1.6s at 200k x 64). Map-side only, no "
        "exchange before the audit aggregate.",
    ),
    (
        "streaming_minhash_dedup_batch",
        "Streaming near-dup dedup, batch twin (round 7): the MinHash "
        "signature is computed PER ROW (hoisted _ha/_hb hash-array "
        "projections + 64 array_min(zip_with) terms referencing them "
        "— no per-term re-hash) so band buckets exist before any "
        "exchange; the only shuffles are the (doc, band, bucket) "
        "triples into the bucket-winner aggregate and the per-doc "
        "bool_and. In streaming mode the identical map-side frame "
        "feeds applyInPandasWithState.",
    ),
    (
        "copurchase_triangles_approx",
        "DOULION sampled triangles (round 7): the deterministic Knuth "
        "double-bucket edge filter is a map-side predicate applied "
        "BEFORE the degree computation and both wedge joins, so the "
        "entire closure runs on the 1/p-sparser graph (~1/p^2 less "
        "join work); estimate = one final projection. No RNG state, "
        "repartition-insensitive.",
    ),
    (
        "ann_rescore_persisted",
        "Persisted-index ANN (round 7): stage 1 scans the stored "
        "int8 codes parquet — the plan contains NO quantization "
        "expressions and never reads the corpus's fp vectors until "
        "the C-candidate rescore join; the meta sidecar supplies "
        "n_items so there is no sizing pass either.",
    ),
    (
        "lm_bigram_score",
        "Bigram LM fluency (round 7): adjacent-pair extraction is a "
        "zip_with over the token split inside the scan's Generate; "
        "the observed-bigram model aggregates map-side-combined and "
        "ships back BROADCAST, so the corpus shuffles only once for "
        "the per-doc average.",
    ),
    (
        "gopher_quality_filters",
        "Gopher rule set (round 7): every rule — word count, mean "
        "word length, symbol/bullet/ellipsis ratios, alpha-word "
        "ratio, stop-word floor — is ONE codegen'd projection over "
        "the scan; the plan has no Exchange at all. The only shape "
        "that survives a 100 TB filter pass.",
    ),
    (
        "cap_per_source",
        "Per-domain cap (round 7): row_number<=k compiles to "
        "WindowGroupLimit with a PARTIAL pass under the Exchange — "
        "each map task forwards at most k rows per key it sees, so a "
        "hot domain ships executors*k rows instead of its whole "
        "group. Look for 'WindowGroupLimit ... Partial' BELOW the "
        "Exchange and 'Final' above it.",
    ),
    (
        "span_dedup_exact",
        "Exact substring dedup (round 7): the k-gram array is built "
        "by one transform() inside the scan projection (no "
        "explode-then-window); duplicated grams come from a single "
        "map-side-combined count; the rebuild is ARRAY-SIDE — "
        "covered-position sets collect only for affected docs and a "
        "filter lambda drops their tokens in one projection, so no "
        "corpus-sized regroup exists anywhere.",
    ),
    (
        "span_dedup_salted",
        "Salted skew path (round 11): identical plan shape to "
        "span_dedup_exact except the duplicated-gram semi-join keys "
        "on (_k, _salt) — look for the semi-join's Exchange "
        "hashpartitioning carrying BOTH columns (the hot gram now "
        "spreads over 16 partitions) and the generate/explode on the "
        "dup-key side replicating the reduced key set, never the "
        "occurrence rows.",
    ),
    (
        "profile_sketch_index",
        "Merged-sketch profile read (round 11): every scan is a "
        "SKETCH tier (scalar rows, HLL registers, DDSketch buckets) "
        "resolved through the index manifest — no documents scan "
        "anywhere in the plan. The three merge groupBys are partial-"
        "aggregated (key spaces bounded by groups x registers/"
        "buckets), the HLL estimator and quantile walk run over "
        "kilobytes, and the final three-way join is broadcast.",
    ),
    (
        "bm25_indexed_asof",
        "Snapshot BM25 (round 11): same term-pruned postings scan as "
        "bm25_indexed_topk — PushedFilters term IN (...) — but every "
        "tier dir resolves through manifest seq 2, and the delta "
        "union's _batch_id clamps compile to PartitionFilters "
        "(directory skips). Epoch 2's partition never appears in the "
        "scan list.",
    ),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from graphlite_spark.session import get_spark

    spark = get_spark(app_name="graphlite-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out = io.StringIO()
    out.write(
        "# Physical plans — flagship queries\n\n"
        f"Generated by `python tools/show_plans.py {sf_dir}` "
        "(re-run after compiler changes).\n"
    )
    for name, note in SHOWCASE:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.write(f"\n## {name}\n\n{note}\n\n```\n{buf.getvalue().rstrip()}\n```\n")

    os.makedirs("docs", exist_ok=True)
    with open("docs/PLANS.md", "w") as f:
        f.write(out.getvalue())
    print("wrote docs/PLANS.md")


if __name__ == "__main__":
    main()
