"""Deterministic synthetic-fixture generator for scale factors the driver
did not ship (sf1+).

Reproduces the driver testdata schema (TESTDATA.md: TPC-H-ish star schema
+ events/documents/embeddings) with xxhash64-derived columns — fully
deterministic for a fixed seed, generated distributed (spark.range +
Column math, no Python row loops), so sf10 is as cheap as the cluster is
wide.  Correctness at these SFs is self-contained: the DuckDB oracles run
on the same parquet files, so engine/oracle parity needs no driver
involvement.

Usage: python scripts/gen_sf.py <sf> [out_root]
Writes <out_root>/sf<sf>/{table}.parquet (default out_root: .fixtures).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "a", "the", "line", "sort", "window",
    "order", "data", "column", "join", "small", "customer", "query", "big",
    "stream", "group", "filter",
]


def _h(salt: str, *cols) -> F.Column:
    """Deterministic non-negative int64 from (seed, salt, cols)."""
    return F.abs(F.xxhash64(F.lit(SEED), F.lit(salt), *cols))


def _pick(salt: str, idc: F.Column, values: list[str]) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_h(salt, idc) % len(values) + 1).cast("int"))


def _ts_ntz(base: str, us: F.Column) -> F.Column:
    # TIMESTAMP_NTZ like the driver fixtures (DuckDB reads plain TIMESTAMP)
    return F.expr(f"timestampadd(MICROSECOND, _us, TIMESTAMP_NTZ '{base}')")


def gen_events(spark: SparkSession, sf: float) -> DataFrame:
    n = int(1_000_000 * sf)
    users = max(150, int(15_000 * sf))
    df = spark.range(n).withColumnRenamed("id", "event_id")
    df = df.withColumn(
        "_us", (_h("ts", F.col("event_id")) % (30 * 86_400_000_000)).cast("long")
    )
    return df.select(
        "event_id",
        _ts_ntz("2024-01-01 00:00:00", F.col("_us")).alias("ts"),
        (_h("uid", F.col("event_id")) % users).cast("long").alias("user_id"),
        _pick("et", F.col("event_id"), EVENT_TYPES).alias("event_type"),
        (
            ((_h("val", F.col("event_id")) % 49_000) + 1).cast("double")
            / F.lit(100.0)
        ).alias("value"),
        F.concat(
            F.lit('{"k": '), (_h("pk", F.col("event_id")) % 100).cast("string"), F.lit("}")
        ).alias("props"),
    )


def gen_documents(spark: SparkSession, sf: float) -> DataFrame:
    """Docs = hash-chained vocab tokens; ~8% are near-dup copies of an
    earlier doc (one token substituted) so dedup operators have real work
    at every SF."""
    n = max(500, int(50_000 * sf))
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    ntok = (_h("len", F.col("doc_id")) % 81 + 20).cast("int")  # 20..100 tokens
    arr = F.array(*[F.lit(v) for v in VOCAB])
    base_id = F.when(
        (_h("dup", F.col("doc_id")) % 100 < 8) & (F.col("doc_id") >= 50),
        _h("src", F.col("doc_id")) % F.col("doc_id"),
    ).otherwise(F.col("doc_id"))
    toks = F.transform(
        F.sequence(F.lit(1), ntok),
        lambda i: F.element_at(arr, (_h("tok", base_id, i) % len(VOCAB) + 1).cast("int")),
    )
    # near-dups: substitute token 1 so the copy is close, not identical
    toks = F.when(
        base_id != F.col("doc_id"),
        F.concat(F.slice(toks, 1, 1), F.array(F.lit("mutant")), F.slice(toks, 3, 10_000)),
    ).otherwise(toks)
    text = F.array_join(toks, " ")
    return df.select(
        "doc_id",
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("doc_id") % 40).cast("string")).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def gen_embeddings(spark: SparkSession, sf: float, dim: int = 64) -> DataFrame:
    n = max(500, int(20_000 * sf))
    df = spark.range(n).withColumnRenamed("id", "vec_id")
    # cluster-structured vectors: label centroid + hash noise, so ANN/LSH
    # recall is meaningful (pure noise has no neighbor structure)
    label = (_h("lab", F.col("vec_id")) % 8).cast("int")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            ((_h("c", label, i) % 2_000_001).cast("double") - 1_000_000.0) / 5_000_000.0
            + ((_h("e", F.col("vec_id"), i) % 2_000_001).cast("double") - 1_000_000.0)
            / 10_000_000.0
        ).cast("float"),
    )
    return df.select("vec_id", emb.alias("embedding"), label.alias("label"))


def gen_region_nation(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    r = spark.createDataFrame(
        [(i, n) for i, n in enumerate(regions)], "r_regionkey int, r_name string"
    )
    n = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id").cast("string")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    return r, n


def gen_customer(spark: SparkSession, sf: float) -> DataFrame:
    n = max(150, int(150_000 * sf))
    df = spark.range(n).withColumnRenamed("id", "c_custkey")
    return df.select(
        "c_custkey",
        F.concat(F.lit("Customer#"), F.col("c_custkey").cast("string")).alias("c_name"),
        (_h("cn", F.col("c_custkey")) % 25).cast("int").alias("c_nationkey"),
        (
            ((_h("cb", F.col("c_custkey")) % 1_100_000).cast("double") / 100.0) - 1000.0
        ).alias("c_acctbal"),
        _pick("cs", F.col("c_custkey"), SEGMENTS).alias("c_mktsegment"),
    )


def gen_supplier(spark: SparkSession, sf: float) -> DataFrame:
    n = max(10, int(10_000 * sf))
    df = spark.range(n).withColumnRenamed("id", "s_suppkey")
    return df.select(
        "s_suppkey",
        F.concat(F.lit("Supplier#"), F.col("s_suppkey").cast("string")).alias("s_name"),
        (_h("sn", F.col("s_suppkey")) % 25).cast("int").alias("s_nationkey"),
        (
            ((_h("sb", F.col("s_suppkey")) % 1_100_000).cast("double") / 100.0) - 1000.0
        ).alias("s_acctbal"),
    )


def gen_part(spark: SparkSession, sf: float) -> DataFrame:
    n = max(200, int(200_000 * sf))
    df = spark.range(n).withColumnRenamed("id", "p_partkey")
    return df.select(
        "p_partkey",
        F.concat(F.lit("part "), (_h("pn", F.col("p_partkey")) % 1000).cast("string")).alias("p_name"),
        F.concat(F.lit("Brand#"), (_h("pb", F.col("p_partkey")) % 50).cast("string")).alias("p_brand"),
        F.concat(F.lit("TYPE "), (_h("pt", F.col("p_partkey")) % 150).cast("string")).alias("p_type"),
        (_h("ps", F.col("p_partkey")) % 50 + 1).cast("int").alias("p_size"),
        (
            ((_h("pr", F.col("p_partkey")) % 200_000).cast("double") / 100.0) + 900.0
        ).alias("p_retailprice"),
    )


def gen_orders(spark: SparkSession, sf: float, n_cust: int) -> DataFrame:
    n = max(1500, int(1_500_000 * sf))
    df = spark.range(n).withColumnRenamed("id", "o_orderkey")
    df = df.withColumn(
        "_us", (_h("ots", F.col("o_orderkey")) % (365 * 86_400_000_000)).cast("long")
    )
    return df.select(
        "o_orderkey",
        (_h("oc", F.col("o_orderkey")) % n_cust).cast("long").alias("o_custkey"),
        _pick("os", F.col("o_orderkey"), ["F", "O", "P"]).alias("o_orderstatus"),
        (
            ((_h("op", F.col("o_orderkey")) % 45_000_000).cast("double") / 100.0) + 900.0
        ).alias("o_totalprice"),
        _ts_ntz("2024-01-01 00:00:00", F.col("_us")).alias("o_orderdate"),
        _pick("opr", F.col("o_orderkey"), PRIORITIES).alias("o_orderpriority"),
    )


def gen_lineitem(spark: SparkSession, sf: float, n_orders: int, n_part: int, n_supp: int) -> DataFrame:
    n = max(6000, int(6_000_000 * sf))
    df = spark.range(n).withColumnRenamed("id", "_i")
    qty = (_h("lq", F.col("_i")) % 50 + 1).cast("double")
    price = ((_h("lp", F.col("_i")) % 10_400_000).cast("double") / 100.0) + 900.0
    df = df.withColumn(
        "_us", (_h("lts", F.col("_i")) % (365 * 86_400_000_000)).cast("long")
    )
    return df.select(
        (_h("lo", F.col("_i")) % n_orders).cast("long").alias("l_orderkey"),
        (_h("lpk", F.col("_i")) % n_part).cast("long").alias("l_partkey"),
        (_h("lsk", F.col("_i")) % n_supp).cast("long").alias("l_suppkey"),
        (_h("ln", F.col("_i")) % 7 + 1).cast("int").alias("l_linenumber"),
        qty.alias("l_quantity"),
        price.alias("l_extendedprice"),
        ((_h("ld", F.col("_i")) % 11).cast("double") / 100.0).alias("l_discount"),
        ((_h("lt", F.col("_i")) % 9).cast("double") / 100.0).alias("l_tax"),
        _pick("lrf", F.col("_i"), ["A", "N", "R"]).alias("l_returnflag"),
        _pick("lls", F.col("_i"), ["F", "O"]).alias("l_linestatus"),
        _ts_ntz("2024-01-01 00:00:00", F.col("_us")).alias("l_shipdate"),
    )


def generate(spark: SparkSession, sf: float, out_root: str) -> str:
    out = os.path.join(out_root, f"sf{sf:g}")
    os.makedirs(out, exist_ok=True)
    r, nt = gen_region_nation(spark)
    cust = gen_customer(spark, sf)
    supp = gen_supplier(spark, sf)
    part = gen_part(spark, sf)
    n_cust = max(150, int(150_000 * sf))
    n_orders = max(1500, int(1_500_000 * sf))
    n_part = max(200, int(200_000 * sf))
    n_supp = max(10, int(10_000 * sf))
    tables = {
        "region": r,
        "nation": nt,
        "customer": cust,
        "supplier": supp,
        "part": part,
        "orders": gen_orders(spark, sf, n_cust),
        "lineitem": gen_lineitem(spark, sf, n_orders, n_part, n_supp),
        "events": gen_events(spark, sf),
        "documents": gen_documents(spark, sf),
        "embeddings": gen_embeddings(spark, sf),
    }
    for name, df in tables.items():
        path = os.path.join(out, f"{name}.parquet")
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            continue
        df.write.mode("overwrite").parquet(path)
        print("wrote", path)
    return out


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    root = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures"
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from geowave_spark.session import get_spark

    spark = get_spark("gen-sf", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")),
                      shuffle_partitions=32)
    out = generate(spark, sf, root)
    print("DONE", out)
