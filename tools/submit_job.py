"""spark-submit main file (north rule launch mode):

    zip -r linkgraph.zip linkgraph          # build the --py-files archive
    spark-submit --master <cluster> --py-files linkgraph.zip \
        tools/submit_job.py pagerank --input edges.parquet \
        --output ranks.parquet --partitions 2048 --checkpoint-dir /ckpt

Locally the same file runs under plain python:

    python tools/submit_job.py pagerank --input /tmp/edges --output /tmp/ranks
"""

import sys

from linkgraph.cli import main

if __name__ == "__main__":
    main(sys.argv[1:])
