"""spark-submit entrypoint: build the inverted index.

    spark-submit --py-files $(python -c 'from engine.packaging import make_pyfiles_zip as m; print(m())') \
        build_index.py --corpus /path/or/iceberg://tbl --out /index/dir \
        [--shards 256] [--chunks 16] [--no-stem] [--no-resume]

(BASELINE.json:6/14: packaged for spark-submit --py-files; resumable
from per-partition checkpoints.)
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--cores", default=None, help="local[N] for sandbox runs")
    args = ap.parse_args()

    from engine.session import get_spark
    from engine.io import read_corpus, with_identity
    from engine.index import build_index

    spark = get_spark("build_index", cores=args.cores)
    corpus = with_identity(read_corpus(spark, args.corpus))
    reader = build_index(
        spark,
        corpus,
        args.out,
        use_stem=not args.no_stem,
        n_shards=args.shards,
        n_chunks=args.chunks,
        resume=not args.no_resume,
    )
    print("index complete:", reader.manifest["stats"])


if __name__ == "__main__":
    main()
