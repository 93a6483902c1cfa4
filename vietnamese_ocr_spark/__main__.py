"""CLI entry point — the spark-submit surface.

  python -m vietnamese_ocr_spark extract --documents D.parquet \
      --media M.parquet --out OUT_DIR [--no-resume] [--master local[32]]
  python -m vietnamese_ocr_spark synth --docs 1000 --out DIR [--seed 42]

On a cluster: `spark-submit --py-files vietnamese_ocr_spark.zip
cli.py extract ...` — the package has no native deps beyond NumPy.
Reference analog: predict.py --type batch --img_path DIR (predict.py:7-24).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="vietnamese_ocr_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="run the extraction pipeline")
    ex.add_argument("--documents", required=True)
    ex.add_argument("--media", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--master", default=None)
    ex.add_argument("--no-resume", action="store_true")
    ex.add_argument("--partitions", type=int, default=None)

    sy = sub.add_parser("synth", help="generate the deterministic synthetic corpus")
    sy.add_argument("--docs", type=int, required=True)
    sy.add_argument("--out", required=True)
    sy.add_argument("--seed", type=int, default=42)

    args = p.parse_args(argv)

    if args.cmd == "synth":
        from .sources.fixtures import generate_corpus

        paths = generate_corpus(args.docs, args.out, seed=args.seed)
        print(json.dumps({"generated": paths}))
        return 0

    from .config import get_spark
    from .plans.extract import run_extract

    spark = get_spark("extract-cli", master=args.master)
    try:
        result = run_extract(
            spark,
            args.documents,
            args.media,
            args.out,
            resume=not args.no_resume,
            n_partitions=args.partitions,
        )
        print(json.dumps(result))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
