"""Similarity search over an embedding column (`array<float>`).

Brute-force cosine top-k is the correctness baseline; the scale path is the
LSH-bucketed variant (random-hyperplane signatures → bucket equi-join →
cosine refine within bucket).  The same cell-keyed-equi-join shape as the
spatial tiered join — buckets play the role of SFC cells.

All math is built-in column algebra: `zip_with` for the element products,
`aggregate` for the fold — JVM-side, no Python.  Cosines are emitted in
integer micro-units (`floor(x*1e6+0.5)`) so results are order-independent
and exactly reproducible by the DuckDB oracle; ranking uses the micro value
with id tie-breaks, so ranks are deterministic across engines.

Hyperplane components are derived from the shared 60-bit md5 hash
(`h60("i:d") % 2001 - 1000`), making the LSH bucketing itself
cross-engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIM = 64  # embedding dimensionality of the input tables


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic evaluation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine_mu(a: Column, b: Column) -> Column:
    """Cosine similarity in exact integer micro-units.

    Zero-norm embeddings are defined as cosine 0 (ranked last, never
    crashing): under Spark 4's default ANSI mode a bare division would
    raise DIVIDE_BY_ZERO on the first all-zero vector and kill the job.
    NaN components are likewise clamped to 0 so ``floor(..).cast(long)``
    cannot raise under ANSI.  The DuckDB oracle mirrors both clamps.
    """
    denom = F.sqrt(norm2(a)) * F.sqrt(norm2(b))
    c = F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))
    c = F.when(F.isnan(c), F.lit(0.0)).otherwise(c)
    return F.floor(c * 1e6 + F.lit(0.5)).cast("long")


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, vec_id, cos_mu, rank).

    The query side broadcasts; the vector side streams through one codegen
    stage — at 100 TB this is a single scan with zero shuffle except the
    final per-query top-k (tiny after the rank filter).
    """
    q = queries.select(
        F.col(id_col).alias(query_id), _as_double(F.col(vec_col)).alias("_qv")
    )
    v = vectors.select(F.col(id_col).alias(id_col), _as_double(F.col(vec_col)).alias("_vv"))
    cand = v.crossJoin(F.broadcast(q) if broadcast_queries else q).withColumn(
        "cos_mu", cosine_mu(F.col("_qv"), F.col("_vv"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_mu").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cos_mu", "rank")
    )


def hyperplane_components(n_planes: int, dim: int = DIM) -> list[list[int]]:
    """Deterministic integer hyperplane components in [-1000, 1000].

    Pure function of (plane, dim) via the shared md5 hash — replicated
    verbatim by the oracle SQL.  Computed driver-side (tiny) and inlined as
    literals into the plan.
    """
    import hashlib

    out = []
    for i in range(n_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:15], 16)
            row.append(h % 2001 - 1000)
        out.append(row)
    return out


def lsh_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """Random-hyperplane signature: bit i = [dot(vec, plane_i) > 0]."""
    b = F.lit(0).cast("long")
    for i, comps in enumerate(planes):
        plane = F.array(*[F.lit(float(c)) for c in comps])
        b = b + F.when(dot(vec, plane) > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return b


def lsh_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    n_probe: int = 0,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share the query's bucket.

    (query_id, vec_id, cos_mu, rank) — rank within bucket.  At scale the
    bucket column becomes the table's partition/cluster key, so the
    equi-join prunes to matching buckets only (the ANN analog of the
    tiered cell join).

    ``n_probe``: multi-probe LSH — each query additionally probes the
    buckets reached by flipping its ``n_probe`` smallest-|margin|
    hyperplane bits (the planes the query sits closest to, where true
    neighbors most often land on the other side).  Query-side only: the
    vector table still has ONE bucket per row, so the scan/partition
    layout is unchanged; recall rises at the cost of n_probe+1 bucket
    probes per query.  0 = single-bucket (the oracle-exact default).
    """
    planes = hyperplane_components(n_planes)
    q = queries.select(
        F.col(id_col).alias(query_id),
        _as_double(F.col(vec_col)).alias("_qv"),
    ).withColumn("bucket", lsh_bucket(F.col("_qv"), planes))
    if n_probe > 0:
        # margins: (|dot(q, plane_i)|, i), ascending — closest planes first
        margins = F.array_sort(
            F.array(
                *[
                    F.struct(
                        F.abs(dot(F.col("_qv"), F.array(*[F.lit(float(c)) for c in comps]))).alias("m"),
                        F.lit(i).alias("i"),
                    )
                    for i, comps in enumerate(planes)
                ]
            )
        )
        masks = F.array(*[F.lit(1 << i).cast("long") for i in range(n_planes)])
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(
                    F.element_at(masks, F.element_at(margins, j + 1)["i"] + F.lit(1))
                )
                for j in range(min(n_probe, n_planes))
            ],
        )
        q = q.withColumn("bucket", F.explode(F.array_distinct(probes)))
    v = vectors.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_vv")
    ).withColumn("bucket", lsh_bucket(F.col("_vv"), planes))
    cand = v.join(F.broadcast(q), "bucket").withColumn(
        "cos_mu", cosine_mu(F.col("_qv"), F.col("_vv"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cos_mu").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cos_mu", "rank")
    )


def sampled_centroids(
    vectors: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic data-sampled centroids: the embeddings of the
    ``n_lists`` smallest ids.  Random-sample centroid init without Lloyd
    refinement is the classic cheap IVF recipe; making the "sample" the
    id-ordered head makes the centroid set — and therefore every IVF
    assignment, probe and result — derivable by the SQL oracle (the same
    move that oracle-ized kmeans_hulls).  The Lloyd-trained variant stays
    the quality default (`ivf_ann_topk` with ``centroids=None``)."""
    rows = (
        vectors.select(F.col(id_col).alias("_i"), _as_double(F.col(vec_col)).alias("_v"))
        .orderBy("_i")
        .limit(n_lists)
        .collect()
    )
    if len(rows) < n_lists:
        raise ValueError(f"sampled_centroids: need >= {n_lists} vectors")
    return [list(map(float, r["_v"])) for r in rows]


def _centers_literal(centers: list[list[float]]) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("list_id"),
                F.array(*[F.lit(float(x)) for x in c]).alias("c"),
            )
            for i, c in enumerate(centers)
        ]
    )


def _d2_fold(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 — bitwise-mirrored by the oracle's
    list_reduce(list_transform(list_zip(...)))."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_lists(
    v: DataFrame, centers: list[list[float]], vec_expr: str = "_v"
) -> DataFrame:
    """Nearest-centroid list assignment as ONE shuffle-free projection:
    array_min over (d2, list_id) structs — argmin with the deterministic
    list_id tie-break, no explode, no window exchange (the right shape for
    a 100 TB assignment pass)."""
    ca = _centers_literal(centers)
    best = F.array_min(
        F.transform(
            ca,
            lambda c: F.struct(
                _d2_fold(F.col(vec_expr), c["c"]).alias("d2"),
                c["list_id"].alias("list_id"),
            ),
        )
    )
    return v.withColumn("list_id", best["list_id"])


def ivf_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: inverted lists + multi-probe.

    The scale path: vectors are bucketed by nearest centroid (the inverted
    list — at cluster scale this is the table's partition key); each query
    probes its n_probe nearest lists and ranks candidates by exact cosine.

    ``centroids=None`` (default): KMeans-trained lists, deterministic for
    a fixed seed; recall vs brute force pinned in tests.  With explicit
    ``centroids`` (e.g. `sampled_centroids`) the whole operator is
    SQL-derivable and oracle-checked by the driver.
    """
    v = vectors.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    if centroids is not None:
        centers = [list(map(float, c)) for c in centroids]
        assigned = assign_lists(v, centers).select(id_col, "_v", "list_id")
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = v.withColumn("_fv", array_to_vector(F.col("_v")))
        model = KMeans(k=n_lists, seed=seed, featuresCol="_fv").fit(feats)
        assigned = model.transform(feats).select(
            id_col, "_v", F.col("prediction").alias("list_id")
        )
        centers = [c.tolist() for c in model.clusterCenters()]
    centers_arr = _centers_literal(centers)
    q = queries.select(F.col(id_col).alias(query_id), _as_double(F.col(vec_col)).alias("_qv"))
    qc = (
        q.withColumn("_c", F.explode(centers_arr))
        .withColumn(
            "_d2",
            F.aggregate(
                F.zip_with(F.col("_qv"), F.col("_c.c"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("_d2").asc(), F.col("_c.list_id").asc())
    probes = (
        qc.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_probe)
        .select(query_id, "_qv", F.col("_c.list_id").alias("list_id"))
    )

    cand = assigned.join(F.broadcast(probes), "list_id").withColumn(
        "cos_mu", cosine_mu(F.col("_qv"), F.col("_v"))
    )
    w2 = Window.partitionBy(query_id).orderBy(F.col("cos_mu").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cos_mu", "rank")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold_mu: int = 950_000,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, LSH-bucket candidates.

    Exact-verify within bucket; high-cosine pairs almost surely share all
    hyperplane signs, so the bucket join is the correct scale plan (the
    brute-force oracle confirms recall at test scale).
    """
    planes = hyperplane_components(n_planes)
    v = (
        vectors.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
        .withColumn("bucket", lsh_bucket(F.col("_v"), planes))
        .localCheckpoint()  # reused by both self-join sides; GC-reclaimed
    )
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn("cos_mu", cosine_mu(F.col("a._v"), F.col("b._v")))
        .filter(F.col("cos_mu") >= threshold_mu)
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            "cos_mu",
        )
    )


# --- product quantization (PQ) ANN ------------------------------------------

def pq_train(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    sample_n: int = 4096,
    n_iter: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
):
    """Train PQ codebooks: split the dim into m subspaces, Lloyd's k-means
    per subspace on a bounded driver-side sample (codebooks are m*k*(d/m)
    floats — tiny; training on a sample is the standard PQ recipe).

    Returns a numpy array (m, k, d/m), deterministic for a fixed seed.
    """
    import numpy as np

    # orderBy before limit: a bare limit() on a repartitioned frame picks
    # an arbitrary subset per execution, which would make the codebooks —
    # and everything downstream — nondeterministic across runs
    rows = (
        vectors.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
        .orderBy(id_col)
        .limit(sample_n)
        .collect()
    )
    if not rows:
        raise ValueError("pq_train: vectors frame is empty — nothing to train on")
    X = np.asarray([r["_v"] for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, sub), dtype=np.float64)
    for j in range(m):
        Xj = X[:, j * sub:(j + 1) * sub]
        # fewer sample rows than k: seed the extra centroids by sampling
        # with replacement (duplicates converge to distinct cells or stay
        # redundant — harmless), instead of np.random.choice raising
        C = Xj[rng.choice(len(Xj), size=k, replace=len(Xj) < k)].copy()
        for _ in range(n_iter):
            d2 = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                pts = Xj[assign == c]
                if len(pts):
                    C[c] = pts.mean(axis=0)
        books[j] = C
    return books


def pq_sample_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic PQ codebooks without Lloyd refinement: codebook j =
    the j-th sub-vectors of the ``k`` smallest-id embeddings (the PQ twin
    of `sampled_centroids`).  Fully SQL-derivable — the driver oracle
    recomputes codes, ADC tables and reranks from the table itself.  The
    Lloyd-trained `pq_train` stays the quality default."""
    import numpy as np

    rows = (
        vectors.select(F.col(id_col).alias("_i"), _as_double(F.col(vec_col)).alias("_v"))
        .orderBy("_i")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"pq_sample_codebooks: need >= {k} vectors")
    X = np.asarray([r["_v"] for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return np.stack([X[:, j * sub:(j + 1) * sub] for j in range(m)])


def pq_encode(
    vectors: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): m bytes of storage per vector at k<=256 —
    the compressed scan column (Arrow-batched argmin per subspace)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    books = np.asarray(codebooks)
    m, _, sub = books.shape

    def _enc_fn(vs):
        X = np.asarray(vs.tolist(), dtype=np.float64)
        codes = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            Xj = X[:, j * sub:(j + 1) * sub]
            d2 = ((Xj[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    _enc = F.pandas_udf(_enc_fn, T.ArrayType(T.IntegerType()))

    return vectors.select(F.col(id_col), _enc(_as_double(F.col(vec_col))).alias("codes"))


def pq_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance top-k with exact rerank.

    Scan phase is pure JVM: each query carries its (m x k) distance table
    as a nested array literal; the ADC score is a fold over the stored
    m-byte codes — no Python, no full-vector reads.  The top `rerank`
    ADC candidates per query are re-scored with exact cosine and the
    final top-k returned (the standard PQ + rerank pipeline; recall vs
    brute force is pinned in tests).
    """
    import numpy as np

    books = np.asarray(codebooks)
    m, kk, sub = books.shape
    enc = pq_encode(vectors, books, id_col, vec_col)

    # keep the caller's id type (string ids work like everywhere else in
    # this module)
    qid_ddl = queries.schema[id_col].dataType.simpleString()
    qrows = queries.select(
        F.col(id_col).alias(query_id), _as_double(F.col(vec_col)).alias("_qv")
    ).collect()
    q_out = []
    for r in qrows:
        qv = np.asarray(r["_qv"], dtype=np.float64)
        tbl = np.empty((m, kk), dtype=np.float64)
        for j in range(m):
            tbl[j] = ((books[j] - qv[j * sub:(j + 1) * sub][None, :]) ** 2).sum(axis=1)
        q_out.append((r[query_id], qv.tolist(), [row.tolist() for row in tbl]))
    qdf = F.broadcast(
        vectors.sparkSession.createDataFrame(
            q_out, f"{query_id} {qid_ddl}, _qv array<double>, _tbl array<array<double>>"
        )
    )
    # ADC scan over (id, codes) ONLY — the full `_v` vectors never enter
    # the candidate stage (that's the point of PQ: the scan ships m bytes
    # per row, not the d-dim double array); `_v` is joined back for just
    # the <= rerank survivors per query below
    # unrolled scalar sum: m element_at lookups per row, no per-row array
    # materialization (the transform+aggregate form allocates an m-array
    # per candidate pair — measurably slower at 10^6 x queries scale)
    adc = None
    for j in range(m):
        t = F.element_at(
            F.element_at(F.col("_tbl"), j + 1), F.col("codes")[j] + F.lit(1)
        )
        adc = t if adc is None else adc + t
    cand = enc.crossJoin(qdf.drop("_qv")).withColumn("_adc", adc)
    w1 = Window.partitionBy(query_id).orderBy(F.col("_adc").asc(), F.col(id_col).asc())
    short = (
        cand.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= rerank)
        .select(query_id, id_col, "_adc")
    )
    v = vectors.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    # survivors are <= rerank * |queries| rows — broadcast them into the
    # vector table (a tiny semi-join-shaped probe, not a full-vector scan)
    rer = (
        v.join(F.broadcast(short), id_col)
        .join(F.broadcast(qdf.select(query_id, "_qv")), query_id)
        .withColumn("cos_mu", cosine_mu(F.col("_qv"), F.col("_v")))
    )
    w2 = Window.partitionBy(query_id).orderBy(F.col("cos_mu").desc(), F.col(id_col).asc())
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cos_mu", "rank")
    )
