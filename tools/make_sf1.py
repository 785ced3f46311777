"""Derive a deterministic sf1 dataset (10x sf0.1) for the scale ladder.

The driver ships sf{0.001,0.01,0.1} only; SCALE.md's decade ladder
needs one more decade. sf1 is constructed by 10x ID-OFFSET TILING of
the driver's sf0.1 (tile 0 == the original rows bit-for-bit), which
preserves schemas, value marginals, per-entity structure (chain
lengths, orders-per-customer, lines-per-order) and foreign-key
consistency, while two per-tile transforms prevent the tiling from
planting artificial cross-tile duplicates that would make dedup /
similarity workloads quadratically HARDER than a real 10x corpus:

- documents: tile k > 0 remaps the corpus vocabulary with a rank
  bijection (word of rank r -> word of rank (r + k*stride) mod V) —
  the word SEQUENCE shape per doc is preserved, so any two docs in
  the same tile have EXACTLY the sf0.1 pair's n-gram Jaccard
  (shingle sets are isomorphic under the bijection) and near-dup
  pair counts scale exactly 10x, while cross-tile shingles share
  nothing beyond chance. (A word-ROTATION was tried first and is a
  trap: n-gram SETS are rotation-invariant up to the single cut
  point, so every doc matched its nine rotated twins and pair counts
  exploded ~1000x.)
- embeddings: tile k rotates the 64 components by k positions — norms
  and component marginals unchanged, cross-tile cosine drops to the
  random-pair level.

Everything is plain deterministic SQL (DuckDB), no RNG. Output:
/root/repo/testdata_sf1/<table>.parquet (one file per table, matching
the driver layout). Oracle checks remain valid at sf1 because the
DuckDB oracle reads the same files the Spark queries do.

Usage: python tools/make_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
TILES = 10

# table -> {column: offset-per-tile}; other columns copy through
OFFSETS = {
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "customer": {"c_custkey": 15_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
}
COPY = ["region", "nation"]  # fixed dimensions, shared by every tile


def main() -> None:
    import duckdb

    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE tiles AS SELECT unnest(range(%d)) AS k"
                % TILES)

    for t in COPY:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")

    # documents: per-tile vocabulary bijection (see module docstring)
    con.execute(f"""
        CREATE TABLE vocab AS
        SELECT w, row_number() OVER (ORDER BY w) - 1 AS r
        FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
              FROM '{SRC}/documents.parquet')
    """)
    v_count = con.execute("SELECT count(*) FROM vocab").fetchone()[0]
    stride = v_count // 11 + 1
    con.execute(f"""
        CREATE TABLE doc_words AS
        SELECT u.doc_id, t.k, u.pos, v2.w AS neww
        FROM (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS w,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM '{SRC}/documents.parquet'
        ) u
        CROSS JOIN tiles t
        JOIN vocab v1 ON v1.w = u.w
        JOIN vocab v2 ON v2.r = (v1.r + t.k * {stride}) % {v_count}
    """)
    con.execute(f"""
        COPY (
            SELECT d.doc_id + tiles.k * {OFFSETS['documents']['doc_id']}
                       AS doc_id,
                   m.text, d.lang, d.source,
                   length(m.text) AS n_chars
            FROM '{SRC}/documents.parquet' d
            CROSS JOIN tiles
            JOIN (SELECT doc_id, k,
                         array_to_string(list(neww ORDER BY pos), ' ')
                             AS text
                  FROM doc_words GROUP BY doc_id, k) m
              ON m.doc_id = d.doc_id AND m.k = tiles.k
            ORDER BY tiles.k, d.doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    n = con.execute(
        f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    print("documents", n)

    for t, offs in OFFSETS.items():
        if t == "documents":
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in offs:
                sel.append(f"({c} + k * {offs[c]}) AS {c}")
            elif t == "embeddings" and c == "embedding":
                sel.append(
                    "CASE WHEN k = 0 THEN embedding ELSE "
                    "list_concat(embedding[(k % len(embedding)) + 1 :], "
                    "embedding[1 : k % len(embedding)])"
                    "::FLOAT[] END AS embedding"
                )
            else:
                sel.append(c)
        q = (
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM (SELECT * FROM '{SRC}/{t}.parquet') "
            f"CROSS JOIN tiles ORDER BY k) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.execute(q)
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
