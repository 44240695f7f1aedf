"""Interleaved A/B harness comparison (VERDICT r5 task #2): run the SAME
headline queries from two checkouts of this repo — A = an older round's
harness (a git worktree), B = the current tree — strictly alternating
A,B,A,B,... within one machine window, each run wrapped in the /proc/stat
obtained-cores/steal capture. Interleaving means both harnesses sample the
same hypervisor conditions, so a uniform wall-clock delta between rounds is
either reproduced (real regression, per-query attribution below) or
vanishes (noise, demonstrated rather than asserted).

Usage: python scripts/ab_bench.py <worktree_A> [sf_dir] [runs]
Writes one JSON line to stdout; each side runs in its OWN subprocess per
round-trip so JVM/codegen warmup is paid symmetrically (one warmup run
inside each subprocess before its measured run).
"""
import json
import os
import subprocess
import sys
import time

QUERIES = ["kg_triples", "rel_agg", "rel_join", "dedup_minhash_pairs"]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
os.chdir({root!r})
from fonduer_spark.session import get_spark
import __spark_entry__ as E
spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")
qs = E.queries()
out = {{}}
def proc_stat():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    steal = v[7] if len(v) > 7 else 0
    busy = v[0] + v[1] + v[2] + v[5] + v[6]
    return busy, steal, busy + steal + v[3] + v[4]
hz = os.sysconf("SC_CLK_TCK")
for name in {queries!r}:
    q = qs[name]
    spark.catalog.clearCache(); q(spark, {sf_dir!r}).count()  # warmup
    spark.catalog.clearCache()
    p0, t0 = proc_stat(), time.time()
    q(spark, {sf_dir!r}).count()
    t1, p1 = time.time(), proc_stat()
    span = max(t1 - t0, 1e-9)
    out[name] = {{"wall": round(span, 3),
                 "obtained_cores": round((p1[0]-p0[0])/hz/span, 2),
                 "steal_frac": round((p1[1]-p0[1])/max(1, p1[2]-p0[2]), 4)}}
print("ABJSON:" + json.dumps(out))
"""


def run_side(root: str, sf_dir: str) -> dict:
    code = _CHILD.format(root=root, queries=QUERIES, sf_dir=sf_dir)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1200)
    for line in r.stdout.splitlines():
        if line.startswith("ABJSON:"):
            return json.loads(line[len("ABJSON:"):])
    raise RuntimeError(f"side {root} produced no result: "
                       f"{r.stdout[-500:]} {r.stderr[-500:]}")


def main():
    side_a = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    side_b = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trips = []
    for i in range(runs):
        a = run_side(side_a, sf_dir)
        b = run_side(side_b, sf_dir)
        trips.append({"trip": i, "A": a, "B": b})
        print(f"# trip {i}: " + " ".join(
            f"{q}: A={a[q]['wall']} B={b[q]['wall']}" for q in QUERIES),
            file=sys.stderr)
    # best-of per side per query, plus the paired per-trip ratio median
    summary = {}
    for q in QUERIES:
        best_a = min(t["A"][q]["wall"] for t in trips)
        best_b = min(t["B"][q]["wall"] for t in trips)
        ratios = sorted(t["B"][q]["wall"] / t["A"][q]["wall"] for t in trips)
        summary[q] = {"best_A": best_a, "best_B": best_b,
                      "median_B_over_A": round(ratios[len(ratios) // 2], 3)}
    print(json.dumps({"metric": "ab_harness_compare", "sf_dir": sf_dir,
                      "side_A": side_a, "side_B": side_b,
                      "queries": QUERIES, "trips": trips,
                      "summary": summary}))


if __name__ == "__main__":
    main()
