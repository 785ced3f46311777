"""Derive a deterministic sf10 dataset (10x sf1, 100x sf0.1) for the
THIRD decade of the scale ladder.

Same id-offset tiling idea as make_sf1.py (tile 0 == the sf1 rows
bit-for-bit; schemas, marginals, per-entity structure and FK
consistency preserved), but the two per-tile content transforms must
differ — the sf1 transforms cannot stack a second decade:

- documents: sf1 used a vocabulary rank BIJECTION; the corpus has only
  31 distinct words, so composing bijections across 100 total tiles
  pigeonholes (shifts repeat mod 31) and would plant EXACT cross-tile
  duplicate docs, exploding dedup/Jaccard counts. Instead tile m > 0
  SUFFIXES every word with 'x<m>': within a tile every doc pair keeps
  exactly its sf1 shingle structure (word sequences are isomorphic
  under the injective remap w -> w||'x'||m), so near-dup pair counts
  scale exactly 10x, while cross-tile shingles share nothing.
  n_chars is recomputed from the transformed text.
- embeddings: sf1 ROTATED components by the tile index; rotations
  compose mod 64, so a second rotation decade would collide (tiles
  with equal total rotation -> exact duplicate vectors under
  different ids). Instead tile m applies the Walsh-pattern SIGN FLIP
  s_i = (-1)^popcount(i & m): norms and component magnitudes are
  unchanged, m=0 is the identity, and any two distinct patterns
  differ in exactly half the positions, so cross-tile cosine of
  same-base vectors is a near-zero balanced sum — the random-pair
  level, no planted near-dups.

Everything is plain deterministic SQL (DuckDB), no RNG. Output:
/root/repo/testdata_sf10/<table>.parquet.

Usage: python tools/make_sf10.py [out_dir] [table ...]
(default: all tables; pass table names to regenerate a subset)
"""

from __future__ import annotations

import os
import sys

SRC = "/root/repo/testdata_sf1"
TILES = 10

# sf1 offsets x10 (sf1 already holds 10 tiles of sf0.1)
OFFSETS = {
    "documents": {"doc_id": 50_000},
    "embeddings": {"vec_id": 20_000},
    "events": {"event_id": 1_000_000, "user_id": 15_000},
    "customer": {"c_custkey": 150_000},
    "orders": {"o_orderkey": 1_500_000, "o_custkey": 150_000},
    "lineitem": {"l_orderkey": 1_500_000, "l_partkey": 200_000,
                 "l_suppkey": 10_000},
    "part": {"p_partkey": 200_000},
    "supplier": {"s_suppkey": 10_000},
}
COPY = ["region", "nation"]


def main() -> None:
    import duckdb

    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf10"
    only = set(sys.argv[2:])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("CREATE TABLE tiles AS SELECT unnest(range(%d)) AS m"
                % TILES)

    for t in COPY:
        if only and t not in only:
            continue
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")

    if not only or "documents" in only:
        # word-suffix remap per tile (injective; see module docstring)
        con.execute(f"""
            COPY (
                SELECT d.doc_id + tiles.m * {OFFSETS['documents']['doc_id']}
                           AS doc_id,
                       CASE WHEN tiles.m = 0 THEN d.text
                            ELSE regexp_replace(d.text, '(\\S+)',
                                 '\\1x' || tiles.m, 'g') END AS text,
                       d.lang, d.source,
                       length(CASE WHEN tiles.m = 0 THEN d.text
                              ELSE regexp_replace(d.text, '(\\S+)',
                                   '\\1x' || tiles.m, 'g') END) AS n_chars
                FROM '{SRC}/documents.parquet' d
                CROSS JOIN tiles
                ORDER BY tiles.m, d.doc_id
            ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """)
        n = con.execute(
            f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
        print("documents", n)

    for t, offs in OFFSETS.items():
        if t == "documents" or (only and t not in only):
            continue
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in offs:
                sel.append(f"({c} + m * {offs[c]}) AS {c}")
            elif t == "embeddings" and c == "embedding":
                # Walsh-pattern sign flip: s_i = (-1)^popcount((i-1) & m)
                sel.append(
                    "CASE WHEN m = 0 THEN embedding ELSE "
                    "list_transform(list_zip(embedding, "
                    "range(len(embedding))), "
                    "p -> CASE WHEN bit_count(CAST(p[2] AS BIGINT) "
                    "& CAST(m AS BIGINT)) % 2 = 1 "
                    "THEN -p[1] ELSE p[1] END)::FLOAT[] END AS embedding"
                )
            else:
                sel.append(c)
        q = (
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM (SELECT * FROM '{SRC}/{t}.parquet') "
            f"CROSS JOIN tiles ORDER BY m) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        con.execute(q)
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
