"""Engine-vs-DuckDB verification at ANY scale factor, without driver
collects.

The driver's own correctness gate collects both result sets and compares
sorted tuples — fine at sf0.01, but a 5M-row join result blows
spark.driver.maxResultSize long before correctness is in question.  This
harness compares (row count, 60-bit row-fingerprint sum) computed
DISTRIBUTED on the Spark side and inside DuckDB on the oracle side:

    fp(row) = ('0x' || substr(md5(concat_ws('|', cols sorted by name)), 1, 15))::BIGINT
    check   = (count, sum(fp))

Query outputs are integer/string-engineered by design (micro-unit longs,
ids), so string formatting is engine-independent; both concat_ws
implementations skip NULLs.  A mismatch in either aggregate fails the
query exactly like a tuple mismatch would.

Usage:
  python scripts/verify_sf.py <sf_dir> [query ...]   # default: all oracles
Writes JSON results to stdout (one line) and per-query progress to stderr.
"""

from __future__ import annotations

import json
import sys
import time

REPO = "/root/repo"


def spark_fingerprint(df) -> tuple[int, int]:
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
    fp = F.conv(
        F.substring(F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols])), 1, 15),
        16, 10,
    ).cast("decimal(38,0)")  # 60-bit values x 10^7 rows overflow int64
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(fp).alias("s")
    ).collect()[0]
    return int(row["n"]), int(row["s"] or 0)


def duck_fingerprint(con, sql: str) -> tuple[int, int]:
    res = con.execute(sql)
    cols = sorted(d[0] for d in res.description)
    inner = sql
    cat = ", ".join(f'CAST("{c}" AS VARCHAR)' for c in cols)
    # HUGEINT sum (DuckDB default for BIGINT sums) — matches Spark's
    # decimal(38,0) accumulation exactly as Python ints
    q = (
        f"SELECT COUNT(*) AS n, COALESCE(SUM(('0x' || substr(md5(concat_ws('|', {cat})), 1, 15))::BIGINT), 0) AS s "
        f"FROM ({inner})"
    )
    n, s = con.execute(q).fetchone()
    return int(n), int(s)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    sys.path.insert(0, REPO)
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("verify-sf")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    import __spark_entry__ as m

    def fresh_con():
        # per-query connection: one query's OOM must not poison the rest
        # (observed: a shared connection keeps failing tiny allocations
        # after a single memory_limit hit), and a bounded limit + spill
        # dir keeps the recursive-CTE oracles off the JVM's memory
        c = duckdb.connect()
        c.execute("SET memory_limit='48GB'")
        c.execute("SET temp_directory='/tmp/duckdb_spill'")
        glob = "/*.parquet" if sf_dir.rstrip("/").startswith("/root/repo") else ""
        for t in ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"]:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet{glob}')"
            )
        return c

    qs, orc = m.queries(), m.oracle_sql()
    names = only or sorted(orc)
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.monotonic()
        try:
            sn, ss = spark_fingerprint(qs[name](spark, sf_dir))
            t_spark = round(time.monotonic() - t0, 1)
            t1 = time.monotonic()
            con = fresh_con()
            try:
                dn, ds = duck_fingerprint(con, orc[name])
            finally:
                con.close()
            t_duck = round(time.monotonic() - t1, 1)
            ok = (sn == dn) and (ss == ds)
            results[name] = {
                "match": ok, "rows": sn, "oracle_rows": dn,
                "spark_sec": t_spark, "duckdb_sec": t_duck,
            }
            print(f"{name} {'OK' if ok else 'MISMATCH'} n={sn}/{dn} "
                  f"spark={t_spark}s duck={t_duck}s", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = {"match": False, "err": str(e)[:300]}
            print(f"{name} ERR {str(e)[:200]}", file=sys.stderr, flush=True)
    bad = [k for k, v in results.items() if not v.get("match")]
    # self-describing evidence (ADVICE r3): keep the all_match flag and the
    # provenance note so the artifact records what produced it
    print(json.dumps({
        "sf_dir": sf_dir,
        "checked": len(results),
        "all_match": not bad,
        "bad": bad,
        "note": (
            "distributed (count, sum of 60-bit row fingerprints) compared "
            "Spark-vs-DuckDB per oracle query; sf tables are the driver-"
            "generated parquet under sf_dir (deterministic generator, see "
            "TESTDATA.md) or scripts/gen_sf.py output for sf>=1"
        ),
        "results": results,
    }))


if __name__ == "__main__":
    main()
