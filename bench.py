"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "turns": N, "turns_per_sec": ...}

--single <name> --master local[N]: run one query in a fresh session and
print {"query":..., "sec":..., "rows":...} (used by --scaling).

--scaling: the two-cluster-size evidence for the north rule (no real
cluster in this sandbox): the identical fused triple-extraction job on the
identical input at local[8] vs local[32] (shuffle partitions scaled with
cores), reporting throughput at both plus efficiency = (T8/T32)/4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1).rstrip(".")) if m else -1.0


def _session(master: str, cores: int):
    from kgpipe.session import get_spark

    return get_spark(
        "kgpipe-bench",
        master=master,
        shuffle_partitions=max(2 * cores, 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": "32m"},
    )


def _inputs(spark):
    from kgpipe.fixtures import derive_transcripts

    return derive_transcripts(spark, SF_DIR)


# headline queries: name -> (fn(spark) -> DataFrame to fully materialize)
def _headline(spark):
    import __spark_entry__ as E
    from kgpipe.config import DEFAULT_CONFIG
    from kgpipe.pipeline import build_triples

    t = _inputs(spark)
    return {
        "triples_fused": lambda: build_triples(
            t, E._GAZ, E._BLACKLIST, DEFAULT_CONFIG, fused=True
        ),
        "triples_structured": lambda: build_triples(
            t, E._GAZ, E._BLACKLIST, DEFAULT_CONFIG, fused=False
        ),
        "cross_turn_edges": lambda: E._q_cross_turn_edges(spark, SF_DIR),
        "dedup_minhash": lambda: E._q_dedup_minhash(spark, SF_DIR),
        "sim_topk_bruteforce": lambda: E._q_topk_bruteforce(spark, SF_DIR),
    }


def _run_one(df) -> tuple[float, int]:
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def run_default() -> None:
    spark = _session(f"local[{CPUS}]", CPUS)
    t = _inputs(spark)
    turns = t.count()
    queries = {}
    total = 0.0
    triple_rows = 0
    for name, build in _headline(spark).items():
        sec, rows = _run_one(build())
        queries[name] = round(sec, 3)
        total += sec
        if name == "triples_fused":
            fused_sec, triple_rows = sec, rows
    out = {
        "metric": "kg_pipeline_headline_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_of(SF_DIR),
        "turns": turns,
        "triples": triple_rows,
        "turns_per_sec": round(turns / fused_sec, 1),
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


def run_single(name: str, master: str) -> None:
    cores = int(master.split("[")[1].rstrip("]"))
    spark = _session(master, cores)
    builds = _headline(spark)
    sec, rows = _run_one(builds[name]())
    turns = _inputs(spark).count()
    print(json.dumps({"query": name, "sec": round(sec, 3), "rows": rows, "turns": turns}))
    spark.stop()


def run_scaling() -> None:
    """Same job, same input, two parallelism levels; scaling efficiency =
    (throughput@32cores / throughput@8cores) / 4."""
    results = {}
    for cores in (8, 32):
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--single", "triples_fused", "--master", f"local[{cores}]",
        ]
        out = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, timeout=3600
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        r["turns_per_sec"] = round(r["turns"] / r["sec"], 1)
        results[cores] = r
    eff = (results[32]["turns_per_sec"] / results[8]["turns_per_sec"]) / 4.0
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32_cores",
                "value": round(eff, 3),
                "unit": "ratio",
                "local8": results[8],
                "local32": results[32],
                "sf": _sf_of(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--single" in sys.argv:
        i = sys.argv.index("--single")
        m = sys.argv.index("--master")
        run_single(sys.argv[i + 1], sys.argv[m + 1])
    else:
        run_default()
