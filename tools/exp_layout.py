"""Experiment: does input file layout (17 AQE-coalesced files vs N
round-robin files) change headline query walls?  Times the fused /
structured / cross-turn builds with the same methodology as bench.py
(count, best-of-2) against both layouts in ONE session.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kgpipe.session import get_spark  # noqa: E402
from kgpipe.fixtures import derive_transcripts  # noqa: E402
from kgpipe.config import DEFAULT_CONFIG  # noqa: E402
from kgpipe.pipeline import build_annotations, build_triples  # noqa: E402
from kgpipe.graph import cross_turn_event_edges  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
NPART = int(sys.argv[1]) if len(sys.argv) > 1 else 96

spark = get_spark(
    "exp-layout", master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS,
    extra_conf={"spark.sql.files.maxPartitionBytes": "32m"},
)
import __spark_entry__ as E  # noqa: E402

base = "/tmp/kg_exp_layout"
p17 = base + "/few17"
pN = base + f"/rr{NPART}"
if not os.path.exists(p17 + "/_SUCCESS"):
    # derive_transcripts now repartitions itself (the fix this experiment
    # motivated), so the few-file "before" layout is reproduced explicitly
    # with coalesce(17) — the file count the AQE-coalesced join output used
    # to produce at sf0.1
    derive_transcripts(spark, SF).coalesce(17).write.mode(
        "overwrite"
    ).parquet(p17)
if not os.path.exists(pN + "/_SUCCESS"):
    derive_transcripts(spark, SF).write.mode("overwrite").parquet(pN)


def timed(label, build):
    best = None
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        n = build().count()
        s = time.time() - t0
        best = s if best is None else min(best, s)
    print(f"{label}: {best:.3f}s rows={n}", flush=True)
    return best


for path in (p17, pN):
    t = spark.read.parquet(path)
    nfiles = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    print(f"--- input {path} ({nfiles} files) ---", flush=True)
    timed("fused     ", lambda: build_triples(t, E._GAZ, E._BLACKLIST, DEFAULT_CONFIG, fused=True))
    timed("structured", lambda: build_triples(t, E._GAZ, E._BLACKLIST, DEFAULT_CONFIG, fused=False))

    def ct():
        ann = build_annotations(t, E._GAZ, E._BLACKLIST, DEFAULT_CONFIG,
                                persist=False, timexes=False)
        return cross_turn_event_edges(ann["mentions_f"], DEFAULT_CONFIG)

    timed("cross_turn", ct)
spark.stop()
