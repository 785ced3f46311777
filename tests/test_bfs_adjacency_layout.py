"""Pin the BFS adjacency layout switch (r12).

bfs_distances / shortest_path_pair materialize their adjacency once;
under the session's autoBroadcastJoinThreshold the frame keeps its size
estimate and every per-level join broadcasts it (the bench-scale
regime), while a measured count past the threshold re-lays the frame
out hash-distributed + sorted by the join key so per-level sort-merge
joins never re-sort the edge side (the at-scale regime). Results must
be bit-identical in both regimes — forced here by dropping the
threshold to 1 byte.
"""

from __future__ import annotations


def test_bfs_and_spp_identical_across_join_regimes(spark):
    from graphlite_spark.operators.paths import (
        bfs_distances,
        shortest_path_pair,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(29)] + [(0, 15)],
        "_src: long, _dst: long")
    srcs = spark.createDataFrame([(0,), (5,)], "id: long")

    def run_all():
        d = {(r.root, r.node): r.dist
             for r in bfs_distances(edges, srcs, max_hops=40).collect()}
        p = shortest_path_pair(
            edges, 0, 29, max_hops=40, directed=False).collect()
        u = shortest_path_pair(edges, 29, 0, max_hops=40).collect()
        return d, [r.dist for r in p], [r.dist for r in u]

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        broadcast_res = run_all()
        assert broadcast_res[0][(0, 29)] == 15  # via the 0->15 shortcut
        assert broadcast_res[1] == [15]
        assert broadcast_res[2] == []  # unreachable against edge direction
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        sorted_res = run_all()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert sorted_res == broadcast_res
