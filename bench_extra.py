#!/usr/bin/env python
"""Round-6 measurement harness (bench.py is FROZEN for driver measurement;
this file holds the extra instrumentation the optimization guide asks for:
noop-sink isolation per query, .explain("formatted") capture, and an
approximate scale-up dataset builder for driver-scale profiling).

Usage:
  python bench_extra.py time   [--sf-dir D] [--runs 3] [--queries a,b|all]
  python bench_extra.py explain [--sf-dir D] [--out plans/r06] [--suffix before]
  python bench_extra.py scaleup --k 10 --out /root/sfscaled/sf1a
"""

from __future__ import annotations

import argparse
import json
import os
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _registry():
    from bionext_spark.corpus_queries import CORPUS
    from bionext_spark.entry_queries import RELATIONAL

    return {**RELATIONAL, **CORPUS}


def _spark():
    from bench import _quiet_spark

    return _quiet_spark("bench-extra", cores=CPUS, shuffle_partitions=max(CPUS, 8))


def _warm(spark, sf_dir):
    for name in ("lineitem", "orders", "events", "documents", "embeddings", "part"):
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()


def cmd_time(args) -> None:
    reg = _registry()
    names = list(reg) if args.queries == "all" else args.queries.split(",")
    spark = _spark()
    _warm(spark, args.sf_dir)
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.runs):
        for n in names:
            fn, _sql = reg[n]
            spark.sparkContext.setJobDescription(f"bench_extra:{n}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs[n].append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    best = {n: min(rs) for n, rs in runs.items()}
    print(json.dumps({"sf_dir": args.sf_dir, "best": best,
                      "total_best": round(sum(best.values()), 3), "runs": runs}))
    spark.stop()


def cmd_explain(args) -> None:
    reg = _registry()
    names = list(reg) if args.queries == "all" else args.queries.split(",")
    os.makedirs(args.out, exist_ok=True)
    spark = _spark()
    for n in names:
        fn, _sql = reg[n]
        df = fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(args.out, f"{n}_{args.suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {n}_{args.suffix}.txt")
    spark.stop()


def cmd_scaleup(args) -> None:
    """Approximate a larger scale factor by replicating sf0.1 with shifted
    ids (text gets a replica-specific prefix so shingle/minhash structure
    does not degenerate into k-fold exact duplicates). For profiling only —
    the driver generates its own large-sf data."""
    from pyspark.sql import functions as F

    spark = _spark()
    src = args.src
    k = args.k
    os.makedirs(args.out, exist_ok=True)
    reps = spark.range(k).select(F.col("id").alias("rep"))

    def rep_table(name, **shift):
        df = spark.read.parquet(f"{src}/{name}.parquet")
        out = df.crossJoin(F.broadcast(reps))
        for col, base in shift.items():
            out = out.withColumn(col, (F.col(col) + F.col("rep") * base).cast(df.schema[col].dataType))
        return out.drop("rep")

    n_doc = spark.read.parquet(f"{src}/documents.parquet").count()
    docs = rep_table("documents", doc_id=n_doc)
    # perturb every shingle for non-zero replicas: prefix shifts stride-2
    # char windows so replica clusters don't minhash-collide wholesale
    docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") < n_doc, F.col("text")).otherwise(
            F.concat((F.col("doc_id") % 89).cast("string"), F.lit(" "), F.col("text"))
        ),
    )
    docs.coalesce(4).write.mode("overwrite").parquet(f"{args.out}/documents.parquet")
    n_ord = spark.read.parquet(f"{src}/orders.parquet").count()
    n_li_ord = n_ord  # lineitem orderkeys live in orders' key space
    rep_table("lineitem", l_orderkey=n_li_ord * 2).coalesce(8).write.mode("overwrite").parquet(
        f"{args.out}/lineitem.parquet"
    )
    rep_table("orders", o_orderkey=n_li_ord * 2).coalesce(4).write.mode("overwrite").parquet(
        f"{args.out}/orders.parquet"
    )
    n_ev = spark.read.parquet(f"{src}/events.parquet").count()
    rep_table("events", event_id=n_ev).coalesce(4).write.mode("overwrite").parquet(
        f"{args.out}/events.parquet"
    )
    n_vec = spark.read.parquet(f"{src}/embeddings.parquet").count()
    emb = rep_table("embeddings", vec_id=n_vec)
    emb.coalesce(2).write.mode("overwrite").parquet(f"{args.out}/embeddings.parquet")
    for name in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{src}/{name}.parquet").write.mode("overwrite").parquet(
            f"{args.out}/{name}.parquet"
        )
    print("scaled dataset at", args.out)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("time")
    p.add_argument("--sf-dir", default=SF_DIR)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--queries", default="all")
    p.set_defaults(fn=cmd_time)
    p = sub.add_parser("explain")
    p.add_argument("--sf-dir", default=SF_DIR)
    p.add_argument("--out", default="plans/r06")
    p.add_argument("--suffix", default="before")
    p.add_argument("--queries", default="all")
    p.set_defaults(fn=cmd_explain)
    p = sub.add_parser("scaleup")
    p.add_argument("--src", default=SF_DIR)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_scaleup)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
