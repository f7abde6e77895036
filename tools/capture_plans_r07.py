"""Capture .explain('formatted') for every r07-touched headline query.

Usage: python tools/capture_plans_r07.py <repo_root> <suffix>
Writes plans/r07/<query>_<suffix>.txt under THIS repo (the optimization
round's evidence directory), importing kgpipe from <repo_root> so the same
script captures both the round-start ("before") and current ("after")
plans.
"""
import io
import os
import sys
from contextlib import redirect_stdout

repo_root = sys.argv[1]
suffix = sys.argv[2]
sys.path.insert(0, repo_root)

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
os.makedirs(OUT_DIR, exist_ok=True)

from kgpipe.session import get_spark  # noqa: E402

spark = get_spark(
    "capture-plans", master="local[8]", shuffle_partitions=16,
    extra_conf={"spark.sql.files.maxPartitionBytes": "32m",
                "spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E  # noqa: E402
from kgpipe.config import DEFAULT_CONFIG  # noqa: E402
from kgpipe.fixtures import derive_transcripts  # noqa: E402
from kgpipe.graph import cross_turn_event_edges  # noqa: E402
from kgpipe.pipeline import build_annotations, build_triples  # noqa: E402

SF = "/root/testdata/sf0.01"
import tempfile  # noqa: E402

path = tempfile.mkdtemp(prefix="kg_plans_") + "/t"
derive_transcripts(spark, SF).write.mode("overwrite").parquet(path)
t = spark.read.parquet(path)


def cross_turn():
    ann = build_annotations(
        t, E._GAZ, E._BLACKLIST, DEFAULT_CONFIG, persist=False, timexes=False
    )
    return cross_turn_event_edges(ann["mentions_f"], DEFAULT_CONFIG)


builds = {
    "triples_fused": lambda: build_triples(
        t, E._GAZ, E._BLACKLIST, DEFAULT_CONFIG, fused=True),
    "triples_structured": lambda: build_triples(
        t, E._GAZ, E._BLACKLIST, DEFAULT_CONFIG, fused=False),
    "cross_turn_edges": cross_turn,
    "dedup_minhash": lambda: E._q_dedup_minhash(spark, SF),
    "sim_topk_bruteforce": lambda: E._q_topk_bruteforce(spark, SF),
    "derive_transcripts": lambda: derive_transcripts(spark, SF),
}

for name, build in builds.items():
    buf = io.StringIO()
    with redirect_stdout(buf):
        build().explain("formatted")
    with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as f:
        f.write(buf.getvalue())
    txt = buf.getvalue()
    n_ex = txt.count("Exchange")
    print(f"{name}_{suffix}: {len(txt.splitlines())} lines, {n_ex} Exchange refs")
spark.stop()
