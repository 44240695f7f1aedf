#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline.

Cluster usage (north_rule: spark-submit --py-files on multi-executor
clusters at two cluster sizes):

    zip -r fonduer_spark.zip fonduer_spark
    spark-submit --master <cluster> --py-files fonduer_spark.zip \\
        scripts/submit_pipeline.py \\
        --sf-dir /data/webpages --out /warehouse/kg --replicate 1

Local sandbox equivalent (two parallelism levels):

    python scripts/submit_pipeline.py --cores 8  --sf-dir ... --out ...
    python scripts/submit_pipeline.py --cores 32 --sf-dir ... --out ...

Writes snapshot-committed stage tables (mentions/candidates/scored/features/
entities) plus the partitioned triples graph table and the checkpoints
lineage table under --out; re-running resumes from committed snapshots.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-docs", type=int, default=None)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fonduer_spark.pipeline import run_checkpointed
    from fonduer_spark.session import get_spark

    # under spark-submit the session already exists (builder returns it);
    # standalone we build the tuned local one
    spark = (SparkSession.getActiveSession()
             or get_spark(cores=args.cores))
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    stages, cp = run_checkpointed(
        spark, args.sf_dir, args.out,
        max_docs=args.max_docs, replicate=args.replicate,
    )
    n_triples = stages["triples"].count()
    wall = time.time() - t0
    print(json.dumps({
        "out": args.out,
        "n_triples": n_triples,
        "wall_sec": round(wall, 2),
        "stages": [
            {"kind": k, "stage": s, "snapshot": sid, "rows": n, "ms": ms}
            for k, s, sid, n, ms in cp.events
        ],
    }))


if __name__ == "__main__":
    main()
