"""Stored ANN index: IVF lists as the physical partition key, PQ codes
as the in-list scan payload, exact-cosine rerank.

``operators/similarity.py`` benchmarks each ANN ingredient in isolation
(IVF inverted lists, PQ ADC scan, exact rerank); at 100 TB the winner
COMPOSES them over a *stored* layout, exactly like the spatial side's
``write_indexed`` + ``range_lookup`` pair:

* **write once**: vectors land in hive-style ``list_id=<n>`` partition
  directories keyed by nearest KMeans centroid, carrying their m-byte PQ
  codes alongside the raw embedding;
* **probe**: a query touches only its ``n_probe`` nearest lists — the
  read is PARTITION-PRUNED at the source (``PartitionFilters`` in the
  scan node, not a post-scan filter), so a 256-list table answers a
  probe-8 query by reading ~3% of its files;
* **ADC candidate stage** selects ``(vec_id, list_id, codes)`` ONLY —
  columnar ``ReadSchema`` pruning keeps the d-dim embedding array out of
  the scan (the codes-only contract from ``pq_ann_topk``);
* the ≤ ``rerank`` ADC survivors per query join back to the SAME pruned
  partitions for exact cosine — a broadcast probe, not a second pass.

Reference analog: the tiered SFC range scan over the stored KV layout
(core/store/.../BaseDataStore.java query path; RowRangeHistogram-sized
splits) — the inverted list plays the SFC cell, the PQ code plays the
compact row payload.  Trained artifacts (centroids + codebooks) persist
in a ``_ann_meta.json`` sidecar so probes never retrain.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import similarity as sim

META_FILE = "_ann_meta.json"


def write_vectors_ivf(
    vectors: DataFrame,
    path: str,
    n_lists: int = 16,
    pq_m: int = 8,
    pq_k: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers=None,
    codebooks=None,
) -> dict:
    """Write the IVF+PQ layout: one pass trains, encodes and partitions.

    Returns the meta dict (also persisted as ``_ann_meta.json``): KMeans
    centroids, PQ codebooks, and the layout parameters.  The embedding
    column is kept in the table (rerank needs it) but the probe path
    never scans it until the survivor join.

    ``centers``/``codebooks``: optional pre-derived artifacts (e.g.
    `sampled_centroids` / `pq_sample_codebooks`) — the assignment then
    runs as one shuffle-free projection (no MLlib fit pass) and the whole
    stored layout becomes SQL-oracle-derivable.
    """
    import numpy as np

    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    )
    head = v.first()
    if head is None:
        # fail BEFORE any write: a half-created table (parquet without its
        # meta sidecar) would break every later stored_ann_topk load
        raise ValueError("write_vectors_ivf: input vector frame is empty")
    dim = len(head["embedding"])
    if centers is not None:
        centers = [list(map(float, c)) for c in centers]
        if len(centers) != n_lists:
            raise ValueError("write_vectors_ivf: len(centers) != n_lists")
        assigned = sim.assign_lists(
            v.withColumnRenamed("embedding", "_v"), centers
        ).select("vec_id", F.col("_v").alias("embedding"), "list_id")
        model_centers = centers
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = v.withColumn("_fv", array_to_vector(F.col("embedding")))
        model = KMeans(k=n_lists, seed=seed, featuresCol="_fv").fit(feats)
        assigned = model.transform(feats).select(
            "vec_id", "embedding", F.col("prediction").alias("list_id")
        )
        model_centers = [c.tolist() for c in model.clusterCenters()]
    if codebooks is None:
        books = sim.pq_train(
            v, m=pq_m, k=pq_k, id_col="vec_id", vec_col="embedding", seed=seed
        )
    else:
        books = np.asarray(codebooks, dtype=np.float64)
        if books.shape[0] != pq_m or books.shape[1] != pq_k:
            raise ValueError("write_vectors_ivf: codebooks shape != (pq_m, pq_k, d/m)")
    codes = sim.pq_encode(v, books, id_col="vec_id", vec_col="embedding")
    out = assigned.join(codes, "vec_id")
    (
        out.repartition("list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(path)
    )
    meta = {
        "n_lists": n_lists,
        "pq_m": pq_m,
        "pq_k": pq_k,
        "seed": seed,
        "dim": dim,
        "centers": model_centers,
        "codebooks": np.asarray(books).tolist(),
    }
    _write_sidecar(vectors.sparkSession, os.path.join(path, META_FILE), json.dumps(meta))
    return meta


def _write_sidecar(spark: SparkSession, path: str, text: str) -> None:
    """Write the meta sidecar through the JVM Hadoop FS so the layout works
    on any scheme the table itself writes to (s3a/hdfs/file), not just the
    driver's local filesystem."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def load_meta(spark_or_path, path: str | None = None) -> dict:
    """Read the sidecar.  ``load_meta(spark, table_path)`` goes through the
    Hadoop FS (any scheme); the legacy ``load_meta(table_path)`` form keeps
    working for local paths."""
    if path is None:
        with open(os.path.join(spark_or_path, META_FILE)) as f:
            return json.load(f)
    spark = spark_or_path
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(os.path.join(path, META_FILE))
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(jpath)
    try:
        data = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def stored_ann_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 50,
    id_col: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the stored IVF+PQ table: partition-pruned scan → JVM ADC over
    codes → exact-cosine rerank of the survivors.

    Output: (query_id, vec_id, cos_mu, rank) — same contract as the
    in-memory ANN family.  Deterministic for a stored layout (trained
    artifacts are read from the sidecar, never refit).

    ``id_col``/``vec_col`` name the columns of the *queries* frame only:
    ``write_vectors_ivf`` normalizes the stored table to
    ``vec_id``/``embedding`` at write time, so the probe always reads
    (and emits) those names regardless of what the original ingest frame
    called them.
    """
    import numpy as np

    meta = load_meta(spark, path)
    books = np.asarray(meta["codebooks"], dtype=np.float64)
    centers = np.asarray(meta["centers"], dtype=np.float64)
    m, kk, sub = books.shape

    # queries are small by contract (the probe side): their centroid
    # ranking and ADC distance tables are driver-side numpy, inlined as a
    # broadcast literal frame — one row per (query, probed list).  The
    # query-id keeps the caller's type (string ids work too).
    qid_ddl = queries.schema[id_col].dataType.simpleString()
    qrows = queries.select(
        F.col(id_col).alias(query_id),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).collect()
    probe_rows = []
    probed_lists: set[int] = set()
    for r in qrows:
        qv = np.asarray(r["_qv"], dtype=np.float64)
        d2 = ((centers - qv[None, :]) ** 2).sum(axis=1)
        lists = np.argsort(d2, kind="stable")[:n_probe]
        tbl = np.empty((m, kk), dtype=np.float64)
        for j in range(m):
            tbl[j] = ((books[j] - qv[j * sub:(j + 1) * sub][None, :]) ** 2).sum(axis=1)
        for li in lists.tolist():
            probed_lists.add(int(li))
            probe_rows.append(
                (r[query_id], int(li), qv.tolist(), [row.tolist() for row in tbl])
            )
    probes = F.broadcast(
        spark.createDataFrame(
            probe_rows,
            f"{query_id} {qid_ddl}, list_id int, _qv array<double>, _tbl array<array<double>>",
        )
    )

    # partition-pruned scan: list_id is the hive partition column, so the
    # isin filter becomes PartitionFilters — unprobed directories are
    # never opened.  The candidate stage reads (vec_id, list_id, codes)
    # only; `embedding` stays out of the ReadSchema.
    table = spark.read.parquet(path)
    pruned = table.filter(F.col("list_id").isin(sorted(probed_lists)))
    cand = pruned.select("vec_id", "list_id", "codes").join(
        probes.drop("_qv"), "list_id"
    )
    adc = None
    for j in range(m):
        t = F.element_at(
            F.element_at(F.col("_tbl"), j + 1), F.col("codes")[j] + F.lit(1)
        )
        adc = t if adc is None else adc + t
    w1 = Window.partitionBy(query_id).orderBy(F.col("_adc").asc(), F.col("vec_id").asc())
    short = (
        cand.withColumn("_adc", adc)
        .withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= rerank)
        .select(query_id, "vec_id")
    )

    # exact rerank: broadcast the <= rerank*|queries| survivors into the
    # SAME pruned partitions (candidates live in probed lists by
    # construction) — only now does the embedding column enter a scan
    qv_df = F.broadcast(
        spark.createDataFrame(
            [(r[query_id], r["_qv"]) for r in qrows],
            f"{query_id} {qid_ddl}, _qv array<double>",
        )
    )
    rer = (
        pruned.select("vec_id", F.col("embedding").alias("_v"))
        .join(F.broadcast(short), "vec_id")
        .join(qv_df, query_id)
        .withColumn("cos_mu", sim.cosine_mu(F.col("_qv"), F.col("_v").cast("array<double>")))
    )
    w2 = Window.partitionBy(query_id).orderBy(F.col("cos_mu").desc(), F.col("vec_id").asc())
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id, "vec_id", "cos_mu", "rank")
    )
