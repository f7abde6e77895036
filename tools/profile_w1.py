"""Micro-profile the W1/mentions stage components."""
import sys, time, os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F
from kgpipe.session import get_spark
from kgpipe.fixtures import derive_transcripts
from kgpipe.pipeline import build_annotations
from kgpipe.extract import mentions_table, timexes_table, filter_mentions, filter_timexes, assign_annotation_ids

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("profile", master="local[32]", shuffle_partitions=64,
                  extra_conf={"spark.sql.files.maxPartitionBytes": "32m"})
import __spark_entry__ as E
tr = derive_transcripts(spark, sf); tr.count()
gaz, bl = E._GAZ, E._BLACKLIST

tables = build_annotations(tr, gaz, bl, persist=True)
ann = tables["annotated"]
t0 = time.time(); ann.count(); t1 = time.time()
print(f"annotate+persist: {t1-t0:.2f}s", flush=True)

# cache rescan cost, tokens only
ann.select(F.size("tokens").alias("n")).agg(F.sum("n")).collect()
t2 = time.time(); print(f"cache scan (tokens col): {t2-t1:.2f}s", flush=True)

ann.select(F.size("mentions").alias("n")).agg(F.sum("n")).collect()
t3 = time.time(); print(f"cache scan (mentions col): {t3-t2:.2f}s", flush=True)

m_raw = mentions_table(ann)
m_raw.count()
t4 = time.time(); print(f"mentions explode: {t4-t3:.2f}s", flush=True)

m_f = filter_mentions(m_raw, bl)
m_f.count()
t5 = time.time(); print(f"mentions filter: {t5-t4:.2f}s", flush=True)

t_f = filter_timexes(timexes_table(ann))
m_id, t_id = assign_annotation_ids(m_f, t_f, cache=False)
m_id.count()
t6 = time.time(); print(f"W1 ids (mentions side, no cache): {t6-t5:.2f}s", flush=True)

m_id2, t_id2 = assign_annotation_ids(m_f, t_f, cache=True)
m_id2.count()
t7 = time.time(); print(f"W1 ids (cache=True, mentions count): {t7-t6:.2f}s", flush=True)
t_id2.count()
t8 = time.time(); print(f"W1 ids (timexes count from cache): {t8-t7:.2f}s", flush=True)
