"""Round-6 optimization workbench (bench.py is FROZEN for measurement —
this file is the builder's own instrument, guide §1).

Times any subset of the headline queries with the exact methodology of the
frozen bench.py headline snippet (noop sink = full compute, N passes, min
per query) and optionally dumps ``.explain("formatted")`` per query to
plans/r06/<query>_<tag>.txt so plan claims in OPTIMIZATION_r06.md are
checkable.

Usage:
  python bench_extra.py [--queries a,b,c] [--passes 2] [--explain TAG]
                        [--sf /root/testdata/sf0.1] [--cpus 32] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_substring",
    "connected_components",
    "dedup_jaccard",
    "agg_lineitem",
    "join_revenue_by_nation",
    "sessionize",
    "topk_per_group",
    "text_quality",
    "token_count",
    "knn_cosine",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--explain", default=None, help="dump plans/r06/<q>_<TAG>.txt")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from outcite_duplicate_detecting_spark.session import get_spark

    spark = get_spark(cores=args.cpus, app_name="bench-extra-r06")
    qs = entrymod.queries()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]

    if args.explain:
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r06/{name}_{args.explain}.txt", "w") as f:
                f.write(plan)
            print(f"explain -> plans/r06/{name}_{args.explain}.txt")

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _pass in range(args.passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"r06 {name} pass{_pass}")
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
    out = {
        "timings": timings,
        "total": round(sum(timings.values()), 3),
        "samples": samples,
        "sf": args.sf,
        "cpus": args.cpus,
    }
    print("EXTRA " + json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
