"""Benchmark harness.

1. Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
   on local[$SPARK_GRAFT_CPUS]: per-query wall seconds via the noop sink
   (forces full computation, no driver collect).
2. Pipeline throughput + the north-rule scaling evidence: the full dedup
   pipeline over an identical deterministic synthetic corpus at local[8]
   and local[32] (subprocesses — fresh JVMs), reporting docs/sec at both
   and scaling efficiency = speedup / (32/8). Results also land in
   BENCH/BASELINE.md.

Prints ONE JSON line:
  {"metric": "e2e_headline_queries", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "throughput": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "60000"))
SKIP_SCALING = os.environ.get("SPARK_GRAFT_SKIP_SCALING", "") == "1"

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

_SCALING_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
from outcite_duplicate_detecting_spark.session import get_spark
from outcite_duplicate_detecting_spark.plans.pipeline import PipelineConfig, dedup_pipeline

cores = int(sys.argv[1]); corpus = sys.argv[2]; workdir = sys.argv[3]
spark = get_spark(cores=cores, app_name=f"bench-scaling-{{cores}}",
                  shuffle_partitions=max(cores * 2, 16))
pages = spark.read.parquet(corpus)
t0 = time.time()
out = dedup_pipeline(spark, pages, PipelineConfig(), workdir=workdir, run_id=f"bench{{cores}}")
n = out.count()
dup_rows = out.where(out.is_duplicate).count()
wall = time.time() - t0
print(json.dumps({{"cores": cores, "wall_sec": wall, "docs": n,
                   "docs_per_sec": n / wall, "dup_rows": dup_rows}}))
spark.stop()
"""


_HEADLINE_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
import __spark_entry__ as entrymod
from outcite_duplicate_detecting_spark.session import get_spark

spark = get_spark(cores={cpus}, app_name="bench-headline")
qs = entrymod.queries()
timings = {{}}
for name in {headline!r}:
    t0 = time.time()
    qs[name](spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
    timings[name] = round(time.time() - t0, 3)
print("HEADLINE " + json.dumps(timings))
"""


def time_headline_queries() -> dict[str, float]:
    # subprocess: pyspark keeps its gateway JVM alive until the python
    # process exits, and a lingering JVM would pollute the scaling runs
    repo = os.path.dirname(os.path.abspath(__file__))
    snippet = _HEADLINE_SNIPPET.format(
        repo=repo, cpus=CPUS, headline=HEADLINE, sf_dir=SF_DIR
    )
    proc = subprocess.run(
        [sys.executable, "-c", snippet], capture_output=True, text=True, timeout=3600
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("HEADLINE ")]
    if not lines:
        raise RuntimeError(f"headline run failed:\n{proc.stderr[-2000:]}")
    return json.loads(lines[-1][len("HEADLINE "):])


def run_scaling() -> dict:
    from outcite_duplicate_detecting_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="bench_corpus_")
    corpus_dir = os.path.join(tmp, "pages")
    gen = get_spark(cores=CPUS, app_name="bench-gen")
    from outcite_duplicate_detecting_spark.sources.bench_corpus import generate_bench_pages

    generate_bench_pages(gen, BENCH_DOCS, parts=max(CPUS * 2, 64)).write.mode(
        "overwrite"
    ).parquet(corpus_dir)
    gen.stop()

    snippet = _SCALING_SNIPPET.format(repo=os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for cores in (8, 32):
        workdir = os.path.join(tmp, f"work{cores}")
        proc = subprocess.run(
            [sys.executable, "-c", snippet, str(cores), corpus_dir, workdir],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if not line:
            raise RuntimeError(
                f"scaling run cores={cores} failed:\n{proc.stderr[-2000:]}"
            )
        results[cores] = json.loads(line[-1])
    shutil.rmtree(tmp, ignore_errors=True)

    speedup = results[32]["docs_per_sec"] / results[8]["docs_per_sec"]
    efficiency = speedup / (32 / 8)
    return {
        "docs": BENCH_DOCS,
        "local8_docs_per_sec": round(results[8]["docs_per_sec"], 1),
        "local32_docs_per_sec": round(results[32]["docs_per_sec"], 1),
        "local8_wall_sec": round(results[8]["wall_sec"], 2),
        "local32_wall_sec": round(results[32]["wall_sec"], 2),
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
    }


def write_bench_md(timings: dict[str, float], scaling: dict | None) -> None:
    os.makedirs("BENCH", exist_ok=True)
    lines = [
        "# BENCH — measured numbers",
        "",
        f"Headline queries at sf dir `{SF_DIR}` on local[{CPUS}] (noop sink, full compute):",
        "",
        "| query | sec |",
        "| --- | --- |",
    ]
    lines += [f"| {k} | {v} |" for k, v in timings.items()]
    if scaling:
        lines += [
            "",
            "## Scaling (north rule: N vs 4N parallelism on identical input)",
            "",
            f"Full dedup pipeline (MinHash+SimHash+substring+CC) over {scaling['docs']:,}",
            "deterministic synthetic pages (sandbox stand-in for N vs 4N executors):",
            "",
            "| parallelism | wall sec | docs/sec |",
            "| --- | --- | --- |",
            f"| local[8] | {scaling['local8_wall_sec']} | {scaling['local8_docs_per_sec']} |",
            f"| local[32] | {scaling['local32_wall_sec']} | {scaling['local32_docs_per_sec']} |",
            "",
            f"speedup 8→32: **{scaling['speedup_8_to_32']}×**, scaling efficiency "
            f"(speedup/4): **{scaling['scaling_efficiency']}** (target ≥ 0.8)",
        ]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    timings = time_headline_queries()
    scaling = None if SKIP_SCALING else run_scaling()
    write_bench_md(timings, scaling)
    out = {
        "metric": "e2e_headline_queries",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
    }
    if scaling:
        out["throughput"] = scaling
    print(json.dumps(out))


if __name__ == "__main__":
    main()
