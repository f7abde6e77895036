"""One-off profiler: where does the structured triples path spend time?"""
import sys, time, os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import StorageLevel
from pyspark.sql import functions as F
from kgpipe.session import get_spark
from kgpipe.fixtures import derive_transcripts
from kgpipe.extract import annotate_union, assign_union_ids, filter_union
from kgpipe.pair import pair_window, tlink_triples_from_pairs
from kgpipe.pipeline import build_triples
from kgpipe.config import DEFAULT_CONFIG

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("profile", master="local[32]", shuffle_partitions=64,
                  extra_conf={"spark.sql.files.maxPartitionBytes": "32m"})
import __spark_entry__ as E
tr = derive_transcripts(spark, sf); tr.count()
gaz, bl = E._GAZ, E._BLACKLIST

t0 = time.time()
raw = annotate_union(tr, gaz, bl, DEFAULT_CONFIG)
n = raw.count()
t1 = time.time(); print(f"annotate_union (no persist): {t1-t0:.2f}s rows={n}", flush=True)

u = assign_union_ids(filter_union(annotate_union(tr, gaz, bl, DEFAULT_CONFIG), bl, DEFAULT_CONFIG)).persist(StorageLevel.MEMORY_AND_DISK)
u.count()
t2 = time.time(); print(f"filter+W1+persist (incl. annotate rerun): {t2-t1:.2f}s", flush=True)

mentions_id = u.where(F.col("kind_rank") == 0)
timexes_id = u.where(F.col("kind_rank") == 1)
toks = u.where(F.col("kind_rank") == 2)
pairs = pair_window(mentions_id, timexes_id)
tlink = tlink_triples_from_pairs(pairs, toks, DEFAULT_CONFIG)
tlink.count()
t3 = time.time(); print(f"pair+score from cache: {t3-t2:.2f}s", flush=True)

spark.catalog.clearCache()
t3b = time.time()
trip = build_triples(tr, gaz, bl, fused=False)
n_all = trip.count()
t4 = time.time()
print(f"FULL structured (cold cache): {t4-t3b:.2f}s rows={n_all}", flush=True)

spark.catalog.clearCache()
t5 = time.time()
build_triples(tr, gaz, bl, fused=False).count()
t6 = time.time(); print(f"FULL structured again (cold cache): {t6-t5:.2f}s", flush=True)
spark.catalog.clearCache()
build_triples(tr, gaz, bl, fused=True).count()
t7 = time.time(); print(f"FULL fused: {t7-t6:.2f}s", flush=True)
