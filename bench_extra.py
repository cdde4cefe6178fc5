#!/usr/bin/env python
"""Round-7 optimization measurement harness (bench.py stays frozen).

Per-query wall timing with the SAME session shape as bench.py, plus:
  - choice of sink: collect (driver-contract parity) or noop (guide §1.4)
  - per-query job labels (guide §1.5)
  - optional .explain("formatted") dump to plans/r07/
  - query subset selection

Usage:
  python bench_extra.py [--queries a,b,c] [--reps 2] [--sink collect|noop]
                        [--plans-dir plans/r07] [--suffix _before]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_dcp_kafka_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sink", choices=("collect", "noop"), default="collect")
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(256 * 1024),
        },
    )
    # same warmups as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(cpus * 4).repartition(cpus).mapInPandas(lambda it: it, "id long").count()

    import __spark_entry__ as entry

    qs = entry.queries()
    sel = [q.strip() for q in args.queries.split(",") if q.strip()] or list(qs)
    out: dict[str, list[float]] = {}
    for name in sel:
        fn = qs[name]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(args.plans_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        reps = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if args.sink == "collect":
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = reps
        print(f"{name}: {reps} min={min(reps)}", flush=True)
    res = {"sf_dir": sf_dir, "sink": args.sink, "reps": args.reps,
           "queries": {k: {"raw": v, "min": min(v)} for k, v in out.items()}}
    line = json.dumps(res)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
