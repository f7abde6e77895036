"""Single-threaded per-turn CPU profile of the fused path's inner loop.

Runs turn_triples / annotate_turn over a sample of real sf0.1 turns with
cProfile, entirely outside Spark, so the per-function cost breakdown is
visible (guide §1: know where per-task time goes before touching it).
"""
import cProfile
import io
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kgpipe.session import get_spark  # noqa: E402
from kgpipe.fixtures import derive_transcripts  # noqa: E402
from kgpipe.config import DEFAULT_CONFIG  # noqa: E402
from kgpipe.pair import turn_triples  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 8000

spark = get_spark("profile-turn", master="local[8]", shuffle_partitions=16)
import __spark_entry__ as E  # noqa: E402

rows = (
    derive_transcripts(spark, sf)
    .select("conv_id", "turn_idx", "role", "tool", "ts", "text")
    .limit(n_sample)
    .collect()
)
spark.stop()
gaz, bl = E._GAZ, E._BLACKLIST
turns = [(r.conv_id, r.turn_idx, r.role, r.tool, r.ts, r.text) for r in rows]


def run_all():
    n = 0
    for cid, tidx, role, tool, ts, text in turns:
        n += len(turn_triples(cid, tidx, role, tool, ts, text, gaz, bl, DEFAULT_CONFIG))
    return n


# warm (compile regexes, memos)
run_all()
t0 = time.time()
n = run_all()
t1 = time.time()
print(f"turns={len(turns)} triples={n} wall={t1-t0:.3f}s "
      f"us_per_turn={(t1-t0)/len(turns)*1e6:.1f}")

pr = cProfile.Profile()
pr.enable()
run_all()
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(40)
print(s.getvalue())
