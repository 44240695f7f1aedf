"""Extra measurement harness for optimization rounds (bench.py is FROZEN).

Mirrors bench.py's methodology for the headline queries (same clearCache +
count() timing, best-of-N) and adds:
  - per-query `.explain("formatted")` capture to plans/r07/<q>_<tag>.txt
  - optional noop-sink timing (guide §1.4) to time computation without the
    count() short-circuit
  - job descriptions so the UI is attributable (guide §1.5)

Usage:
  python bench_extra.py --tag before [--queries a,b,...] [--runs 3] [--noop]
Prints one JSON line {"tag":..., "queries": {name: best_sec}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADS = ["kg_triples_all", "dedup_minhash_pairs", "dedup_minhash_km",
         "dedup_lsh_verified", "dedup_embcos", "sim_topk",
         "text_quality", "rel_agg", "rel_join"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--queries", default=",".join(HEADS))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true",
                    help="also time a noop-sink write (full materialization)")
    ap.add_argument("--plans", action="store_true",
                    help="write explain('formatted') to plans/r07/")
    ap.add_argument("--kg", action="store_true",
                    help="also run the kg_triples pipeline leg (run_kg)")
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--cores", type=int, default=CPUS)
    args = ap.parse_args()

    import __spark_entry__ as E
    from fonduer_spark.session import get_spark

    spark = get_spark(cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    out: dict = {"tag": args.tag, "queries": {}, "samples": {}}
    if args.noop:
        out["noop"] = {}

    if args.kg:
        from bench import run_kg
        n_triples, n_docs, wall = run_kg(spark, args.sf_dir)
        out["queries"]["kg_triples"] = round(wall, 3)

    os.makedirs("plans/r07", exist_ok=True)
    for name in args.queries.split(","):
        q = qs[name]
        if args.plans:
            plan = q(spark, args.sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(f"plans/r07/{name}_{args.tag}.txt", "w") as f:
                f.write(plan)
        samples = []
        spark.sparkContext.setJobDescription(f"{args.tag}:{name}")
        for _ in range(args.runs + 1):  # first = warmup
            spark.catalog.clearCache()
            t0 = time.time()
            q(spark, args.sf_dir).count()
            samples.append(round(time.time() - t0, 3))
        out["queries"][name] = min(samples[1:])
        out["samples"][name] = samples
        if args.noop:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{args.tag}:{name}:noop")
            t0 = time.time()
            (q(spark, args.sf_dir).write.format("noop")
             .mode("overwrite").save())
            out["noop"][name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
    out["total"] = round(sum(out["queries"].values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
