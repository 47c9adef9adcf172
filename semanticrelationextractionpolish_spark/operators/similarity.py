"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k: broadcast the (small) query set against the
  corpus - one codegen'd map + per-query top-k window. The baseline and
  the verification oracle.
* LSH-bucketed ANN (random-hyperplane signs): deterministic
  pseudo-random hyperplanes derived from hash(seed, dim_index), sign
  bits -> bucket key; probes only matching buckets - the 100 TB path
  (candidates per query ~ corpus / 2^bits).

All vector arithmetic is ``zip_with``/``aggregate`` Column algebra in
double precision (JVM, no Python), matching DuckDB's
``list_cosine_similarity`` on DOUBLE[] for oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).
    Returns (query_id, rank, neighbor_id, cos_sim rounded to 6)."""
    base = embeddings.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec")
    )
    queries = base.where(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"), F.col("nvec").alias("qvec")
    )
    scored = base.crossJoin(F.broadcast(queries)).where(
        F.col("nid") != F.col("query_id")
    )
    sim = F.round(cosine(F.col("qvec"), F.col("nvec")), 6)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            sim.alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def brute_force_topk_oracle_sql(query_ids: list[int], k: int = 5) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
        SELECT query_id, rank, neighbor_id, cos_sim
        FROM (
          SELECT q.vec_id AS query_id,
                 n.vec_id AS neighbor_id,
                 round(list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]), 6) AS cos_sim,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]), 6) DESC,
                            n.vec_id ASC
                 ) AS rank
          FROM embeddings q JOIN embeddings n ON q.vec_id != n.vec_id
          WHERE q.vec_id IN ({ids})
        )
        WHERE rank <= {k}
    """


N_PLANES = 8
_PLANE_SEED = 1337


def _hyperplane_sign(vec_col, plane: int):
    """Sign bit of <v, r_plane> where r_plane[d] is a deterministic
    pseudo-random unit in {-1,+1} from hash(seed, plane, d)."""
    proj = F.aggregate(
        F.zip_with(
            vec_col,
            F.sequence(F.lit(0), F.size(vec_col) - 1),
            lambda x, d: x
            * F.when(
                F.pmod(F.hash(F.lit(_PLANE_SEED), F.lit(plane), d), F.lit(2)) == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(vec_col, n_planes: int = N_PLANES):
    key = F.lit(0)
    for p in range(n_planes):
        key = F.shiftleft(key, 1) + _hyperplane_sign(vec_col, p)
    return key


def ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = N_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's
    random-hyperplane bucket (equi-join on bucket key instead of the
    cross join). Recall < 1 by construction; the bench compares its
    hit-rate and speed against brute force."""
    base = embeddings.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("nvec")
    ).withColumn("bucket", lsh_bucket(F.col("nvec"), n_planes))
    queries = base.where(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"),
        F.col("nvec").alias("qvec"),
        F.col("bucket"),
    )
    scored = base.join(F.broadcast(queries), "bucket").where(
        F.col("nid") != F.col("query_id")
    )
    sim = F.round(cosine(F.col("qvec"), F.col("nvec")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", F.col("nid").alias("neighbor_id"), sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def pairwise_cosine_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via bucketed self-join
    (4-bit buckets -> ~1/16 of the quadratic work; threshold-verified)."""
    base = embeddings.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    ).withColumn("bucket", lsh_bucket(F.col("vec"), n_planes))
    a = base.select("bucket", F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    b = base.select("bucket", F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
