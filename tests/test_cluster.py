from __future__ import annotations

from pyspark.sql import functions as F

from pyconform_spark.operators.cluster import kmeans_integer


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_kmeans_separates_planted_blobs(spark):
    # two blobs 1.0 apart with 0.01-scale jitter; seeds = first two
    # vectors (stride=1), one from each blob by construction
    blob_a = [[0.0 + 0.01 * ((i * 7) % 5), 0.0] for i in range(10)]
    blob_b = [[1.0 + 0.01 * ((i * 3) % 5), 1.0] for i in range(10)]
    vecs = [blob_a[0], blob_b[0]] + blob_a[1:] + blob_b[1:]
    out = kmeans_integer(
        _emb_df(spark, vecs), k=2, iters=3, stride=1
    ).collect()
    by_id = {r["vec_id"]: r["cluster"] for r in out}
    a_ids = [0] + list(range(2, 11))
    b_ids = [1] + list(range(11, 20))
    assert {by_id[i] for i in a_ids} == {0}
    assert {by_id[i] for i in b_ids} == {1}


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # seed 2 duplicates seed 0: in the first assignment every tie
    # resolves to the lower cid, so cluster 2 receives NO members and
    # its update row vanishes — the left-join/coalesce fallback must
    # keep its previous centroid.  Proof it was kept: centroid 0's
    # mean then moves off the origin while centroid 2 stays exactly
    # on it, so the final assignment hands every exact-origin vector
    # back to cluster 2 (dist 0 beats the moved centroid).
    vecs = [[0.0, 0.0], [5.0, 5.0], [0.0, 0.0]] + [
        [0.1 * (i % 3), 0.0] for i in range(8)
    ]
    out = kmeans_integer(
        _emb_df(spark, vecs), k=3, iters=1, stride=1
    ).collect()
    assert len(out) == len(vecs)
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    origin_ids = {0, 2, 3, 6, 9}  # every vector that is exactly [0, 0]
    assert by_cluster[2] == origin_ids
    assert by_cluster[1] == {1}


def test_kmeans_assignment_is_exact_integer_l2(spark):
    # hand-check one vector's distance: quantization floor(x*1e6),
    # squared-L2 in int64 — dist_sq of a seed to itself after 0
    # iterations is 0
    vecs = [[0.25, -0.5], [1.0, 1.0]]
    out = {
        r["vec_id"]: r["dist_sq"]
        for r in kmeans_integer(
            _emb_df(spark, vecs), k=2, iters=0, stride=1
        ).collect()
    }
    assert out[0] == 0 and out[1] == 0


def test_silhouette_tight_vs_boundary(spark):
    """Two obvious 2-D clusters built so stride-seeded centroids
    converge onto them: tight members score near 1, while the point
    seeded midway scores far lower (the Lloyd update pulls its
    centroid toward it, so it lands ~0.33 rather than 0) — and
    every score is the quantized floor(10000*s)/10000."""
    from pyconform_spark.operators.cluster import (
        kmeans_integer,
        silhouette_kmeans,
    )
    import pyspark.sql.functions as F

    # stride-seed layout: vec_id 0 and 32 are the k=2 seeds
    pts = []
    for i, v in [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [0.0, 0.1]),
                 (32, [10.0, 10.0]), (33, [10.1, 10.0]),
                 (34, [5.05, 5.0])]:
        pts.append((i, v))
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    out = {r["cluster"]: r
           for r in silhouette_kmeans(emb, k=2, iters=2, stride=32)
           .collect()}
    assert len(out) == 2
    # both clusters should be strongly positive on average
    assert all(r["mean_silhouette"] > 0.5 for r in out.values())
    # the midway point is somebody's worst member, well below the pack
    assert min(r["worst_silhouette"] for r in out.values()) < 0.4
    # scores are floor-quantized to 1e-4
    for r in out.values():
        assert abs(r["worst_silhouette"] * 10000
                   - round(r["worst_silhouette"] * 10000)) < 1e-9
    # assignment parity with kmeans_integer on the same input
    assign = kmeans_integer(emb, k=2, iters=2, stride=32)
    n_by_cluster = {r["cluster"]: 0 for r in assign.collect()}
    for r in assign.collect():
        n_by_cluster[r["cluster"]] += 1
    assert {r["n_vectors"] for r in out.values()} == set(
        n_by_cluster.values())


def test_calinski_harabasz_exact_mirror(spark):
    """Two tight, far-apart clusters: CH is asserted bit-for-bit
    against a pure-Python mirror of the integer pipeline (quantize,
    2 Lloyd rounds from stride seeds, truncating integer centroid
    divisions, BIGINT W/B, one double expression)."""
    from pyconform_spark.operators.cluster import (
        calinski_harabasz,
        QUANT,
    )

    pts = [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [0.0, 0.1]),
           (32, [10.0, 10.0]), (33, [10.1, 10.0])]
    emb = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    [r] = calinski_harabasz(emb, k=2, iters=2, stride=32).collect()

    import math
    q = {i: [math.floor(x * QUANT) for x in v] for i, v in pts}
    cents = {0: q[0], 1: q[32]}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def tdiv(a, b):  # truncating integer division (Spark div / duck //)
        return int(a / b) if (a < 0) != (b < 0) else a // b

    for _ in range(2):
        assign = {i: min(cents, key=lambda c: (d2(q[i], cents[c]), c))
                  for i in q}
        for c in cents:
            members = [q[i] for i in q if assign[i] == c]
            if members:
                cents[c] = [tdiv(sum(col), len(members))
                            for col in zip(*members)]
    assign = {i: min(cents, key=lambda c: (d2(q[i], cents[c]), c))
              for i in q}
    w = sum(d2(q[i], cents[assign[i]]) for i in q)
    n = len(q)
    cbar = [tdiv(sum(col), n) for col in zip(*q.values())]
    sizes = {c: sum(1 for i in q if assign[i] == c) for c in cents}
    b = sum(sizes[c] * d2(cents[c], cbar) for c in cents if sizes[c])
    k_used = sum(1 for c in sizes if sizes[c])
    ch = (b / (k_used - 1.0)) / (w / (n - float(k_used)))
    assert (r["k_used"], r["n"]) == (k_used, n)
    assert r["w"] == w and r["b"] == b
    assert r["ch_index"] == ch
