"""spark-submit launcher (E1 deployment shape, north rule):

    spark-submit --master <cluster> --py-files kgpipe.zip main.py \
        --input /path/transcripts_parquet --output /path/kg_out \
        [--fused] [--buckets 64] [--run-id r1] [--snapshot-id s1]

Thin wrapper so ``kgpipe`` resolves from the shipped zip; all logic lives in
``kgpipe.run.main``.
"""

import sys

from kgpipe.run import main

if __name__ == "__main__":
    sys.exit(main())
