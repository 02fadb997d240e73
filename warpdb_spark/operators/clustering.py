"""K-means clustering over embedding columns (Lloyd's algorithm).

Distributed shape — the same one Spark MLlib's KMeans uses, re-expressed
on DataFrames: centroids live on the driver as a tiny k x dim float64
matrix, each iteration (1) broadcasts them as a k-row DataFrame,
(2) assigns every vector to its nearest centroid with a JVM-side HOF
squared-L2 (whole-stage codegen, no Python in the per-vector path), and
(3) recomputes centroids with posexplode + partial aggregation — one
shuffle of k*dim cells after map-side combine. The corpus is never
collected; only k x dim aggregated floats cross the driver boundary per
iteration, so the loop is identical at 500 vectors or 100 TB.

Reference parity note: the reference engine has no clustering operator —
this is part of the LLM-data-pipeline superset (embedding curation /
IVF index training).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType


def _centroid_df(spark, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    schema = StructType(
        [
            StructField("__cluster", LongType()),
            StructField("__ce", ArrayType(DoubleType())),
        ]
    )
    return spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in centroids], schema
    )


def _dist2(vec_col, centroid_col):
    """Squared L2 as a sequential HOF fold — deterministic summation
    order, so DuckDB's list_sum over the same comprehension reproduces
    the exact double."""
    sq = F.zip_with(
        vec_col,
        centroid_col,
        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
    )
    return F.aggregate(sq, F.lit(0.0), lambda acc, d: acc + d)


def assign_step(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd assignment: (id, cluster, dist2). dist2 is rounded to
    6 dp BEFORE the argmin and ties break to the lowest cluster id, so
    the choice is engine-reproducible. Broadcast hash join + one
    map-side-combinable min aggregation — no corpus shuffle beyond the
    groupBy on id."""
    cdf = _centroid_df(df.sparkSession, centroids)
    d = F.round(_dist2(F.col(vec_col), F.col("__ce")), 6)
    scored = df.crossJoin(F.broadcast(cdf)).select(
        F.col(id_col),
        F.col("__cluster"),
        d.alias("__d2"),
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct("__d2", "__cluster")).alias("__best")
    )
    return best.select(
        id_col,
        F.col("__best.__cluster").alias("cluster"),
        F.col("__best.__d2").alias("dist2"),
    )


def init_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Deterministic engine-portable init: the k vectors whose
    md5(id-as-string) sorts lowest (a content-addressed sample — stable
    across runs, partitionings, and engines; DuckDB replicates it with
    ORDER BY md5(CAST(id AS VARCHAR)) LIMIT k). Cluster label = the
    source vector's id, avoiding any renumbering convention."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(k)
        .collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def lloyd(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Full Lloyd iterations. Returns (assignments DataFrame, centroids,
    n_iter). Stops when max centroid movement (squared L2) < tol.

    The (id, vec) projection is persisted ONCE across all iterations
    (r13): each iteration consumes it twice (the assignment cross-join
    and the update join) and the returned frame once more, so the
    un-persisted loop re-scanned and re-projected the input 2x per
    iteration. Persist-only change — init, centroid arithmetic,
    iteration order, and every aggregate are untouched (ANN oracle
    hashes pin them); MEMORY_AND_DISK spills rather than dying."""
    from pyspark import StorageLevel

    proj = df.select(id_col, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    centroids = init_centroids(proj, k, id_col, vec_col)
    n_iter = 0
    for n_iter in range(1, max_iter + 1):
        assigned = assign_step(proj, centroids, id_col, vec_col)
        joined = proj.join(assigned, id_col)
        cells = joined.select(
            "cluster", F.posexplode(F.col(vec_col)).alias("pos", "val")
        )
        agg = (
            cells.groupBy("cluster", "pos")
            .agg(F.sum(F.col("val").cast("double")).alias("s"), F.count("*").alias("n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        counts: dict[int, int] = {}
        for r in agg:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["s"]
            counts[r["cluster"]] = r["n"]
        new_centroids = []
        movement = 0.0
        for c, old in centroids:
            if c in by_cluster:
                dims = by_cluster[c]
                vec = [dims[i] / counts[c] for i in range(len(old))]
            else:  # empty cluster keeps its old centroid
                vec = list(old)
            movement = max(
                movement, sum((a - b) * (a - b) for a, b in zip(vec, old))
            )
            new_centroids.append((c, vec))
        centroids = new_centroids
        if movement < tol:
            break
    return assign_step(proj, centroids, id_col, vec_col), centroids, n_iter
