"""Approximate-nearest-neighbor similarity search over an embedding
column (``array<float>``).

Two strategies (driver brief):

* :func:`cosine_topk` — brute-force cosine top-k. The query set is
  broadcast (it is small by definition); the corpus side streams
  through a single whole-stage-codegen'd projection computing the
  dot product with higher-order functions — no Python, no shuffle
  except the final per-query top-k aggregation.
* :func:`lsh_cosine_topk` — the scale path: random-hyperplane LSH
  (sign bits of projections onto seeded pseudo-random hyperplanes)
  buckets vectors; only bucket-colliding (query, vector) pairs are
  scored. Recall < 1 by construction; multiple hash tables raise it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (JVM-side)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query:
    ``(query_id, vec_id, cosine, rank)``; ``cosine`` rounded to 4
    decimals, rank by (rounded cosine desc, vec_id asc) — fully pinned
    so results are reproducible across engines. Self-matches
    (query_id == vec_id) are excluded.

    The corpus never shuffles for the join: the query side is
    broadcast and each corpus partition emits its local scores; the
    only exchange is the per-query top-k (a window over query_id —
    at 10^12 rows swap for an `aggregate`-based partial top-k).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v_vec"),
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_cosine(F.col("q_vec"), F.col("v_vec")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs:
    ``(vec_a, vec_b, cosine)`` for all pairs with cosine >= threshold,
    vec_a < vec_b, cosine rounded to 4 decimals.

    Brute-force all-pairs (the exact baseline the LSH variant is
    measured against). The join is a self-cross restricted by id
    ordering; at 10^12 vectors use :func:`lsh_cosine_topk` buckets
    as the candidate generator and this only as the verifier.
    """
    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    a = v.select(F.col("vid").alias("vec_a"), F.col("vec").alias("va"))
    b = v.select(F.col("vid").alias("vec_b"), F.col("vec").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(_cosine(F.col("va"), F.col("vb")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid by cosine (JVM-side argmax over
    broadcast centroid literals).

    Implemented as array_max over (sim, idx) structs — a chained
    when/otherwise argmax would reference the running best twice per
    step and the expression tree doubles per centroid (2^n nodes; 16
    centroids OOM'd the driver at plan build)."""
    structs = [
        F.struct(
            _cosine(vec, F.array(*[F.lit(c) for c in cen])).alias("sim"),
            F.lit(i).alias("cluster"),
        )
        for i, cen in enumerate(centroids)
    ]
    return F.array_max(F.array(*structs))["cluster"]


def ivf_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer, then each
    query scores only the vectors in its ``n_probe`` nearest cells.
    Output schema/ordering identical to :func:`cosine_topk`.

    The quantizer is mini k-means on the DataFrame: centroids live on
    the driver (n_clusters x dim floats — tiny), assignment is a
    broadcast argmax projection, the update step is one groupBy over
    (cluster, dim). Scored fraction ~= n_probe / n_clusters; recall
    depends on how clustered the corpus is (pytest-checked vs brute
    force).
    """
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    # deterministic init: first n_clusters vectors by id
    init = v.orderBy("vec_id").limit(n_clusters).collect()
    centroids = [list(r["vec"]) for r in init]

    for _ in range(iters):
        assigned = v.withColumn("cluster", _nearest_centroid(F.col("vec"), centroids))
        sums = (
            assigned.select(
                "cluster", F.posexplode("vec").alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        new_cents = {}
        for r in sums:
            new_cents.setdefault(r["cluster"], {})[r["dim"]] = r["mean"]
        centroids = [
            [new_cents[c][d] for d in sorted(new_cents[c])]
            if c in new_cents
            else centroids[c]
            for c in range(n_clusters)
        ]

    assigned = v.withColumn("cluster", _nearest_centroid(F.col("vec"), centroids))

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    # n_probe nearest cells per query: rank the per-centroid sims
    sims = [
        _cosine(F.col("q_vec"), F.array(*[F.lit(c) for c in cen])).alias(f"_s{i}")
        for i, cen in enumerate(centroids)
    ]
    q_cells = q.select("query_id", "q_vec", *sims)
    cell_structs = F.array(
        *[
            F.struct(F.col(f"_s{i}").alias("sim"), F.lit(i).alias("cluster"))
            for i in range(n_clusters)
        ]
    )
    q_probed = q_cells.select(
        "query_id",
        "q_vec",
        F.explode(
            F.slice(F.reverse(F.array_sort(cell_structs)), 1, n_probe)
        ).alias("cell"),
    ).select("query_id", "q_vec", F.col("cell.cluster").alias("cluster"))

    scored = (
        assigned.join(F.broadcast(q_probed), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(_cosine(F.col("q_vec"), F.col("vec")), 4).alias("cosine"),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    """Seeded pseudo-random hyperplanes, precomputed driver-side.

    Components land in Catalyst as array literals — no per-row hash
    arithmetic, identical on every executor, no stored model."""
    import random

    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def _hyperplane_bits(vec: Column, dim: int, n_bits: int, seed: int) -> Column:
    """Sign-bit signature of ``vec`` against the seeded hyperplanes."""
    planes = _hyperplanes(dim, n_bits, seed)
    return F.array(
        *[
            (
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(c) for c in plane]),
                        lambda x, h: x * h,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0
            ).cast("int")
            for plane in planes
        ]
    )


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Random-hyperplane LSH ANN: ``(query_id, vec_id, cosine, rank)``.

    Each of ``n_tables`` tables buckets vectors by an ``n_bits``
    sign-bit signature; a (query, vector) pair is scored iff it
    collides in >=1 table. Expected candidate fraction per table is
    ~(1 - theta/pi)^n_bits for angle theta. Scoring + top-k identical
    to :func:`cosine_topk`, so output schema/ordering match exactly.
    """
    # each table's bits come from a distinct seed (reusing one
    # signature across tables would make every table identical)
    def signed_multi(df: DataFrame, id_alias: str) -> DataFrame:
        vec = F.col(vec_col).cast("array<double>")
        parts = []
        for t in range(n_tables):
            bits = _hyperplane_bits(vec, dim, n_bits, seed + 7919 * t)
            parts.append(
                F.struct(
                    F.lit(t).alias("table"),
                    F.concat_ws(
                        "", F.transform(bits, lambda x: x.cast("string"))
                    ).alias("bucket"),
                )
            )
        return df.select(
            F.col(id_alias).alias(id_alias),
            vec.alias(f"_vec_{id_alias}"),
            F.explode(F.array(*parts)).alias("tb"),
        ).select(id_alias, f"_vec_{id_alias}", "tb.table", "tb.bucket")

    vs = signed_multi(vectors.withColumnRenamed(id_col, "vec_id"), "vec_id")
    qs = signed_multi(queries.withColumnRenamed(query_id_col, "query_id"), "query_id")
    cands = (
        vs.join(F.broadcast(qs), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.col("_vec_query_id").alias("q_vec"),
            F.col("_vec_vec_id").alias("v_vec"),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        F.round(_cosine(F.col("q_vec"), F.col("v_vec")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
