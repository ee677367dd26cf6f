"""spark-submit entry point: full-suite validation of a tokenized
sequences table (the north_rule deployment shape).

    spark-submit --master ... --py-files dist/boon_spark.zip \
        jobs/validate_job.py --table /path/seq.parquet \
        [--schema spec.json] [--manifest DIR --partition-col source] \
        [--violations DIR] [--row-id doc_id]

Prints one JSON line with the verdict; exit 2 on any violation.
boon_spark is imported from the --py-files zip — no install needed.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--schema", default=None,
                    help="JSON/YAML constraint file; defaults to the "
                         "input_hint sequences spec")
    ap.add_argument("--row-id", default="doc_id")
    ap.add_argument("--partition-col", default=None)
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--violations", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("boon_spark-validate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from boon_spark import Engine
    from boon_spark.sources.tables import sequences_spec

    if args.schema:
        from boon_spark.cli import load_schema
        spec = load_schema(args.schema)
    else:
        spec = sequences_spec()

    df = spark.read.parquet(args.table)

    if args.partition_col and args.manifest:
        from boon_spark.sources.manifest import validate_partitioned
        out = validate_partitioned(
            spark, df, spec, args.partition_col, args.manifest,
            violations_path=args.violations, row_id=args.row_id)
        print(json.dumps({"pending": out["pending"],
                          "skipped": out["skipped"],
                          "metrics": out["metrics"]}))
        bad = any(not m["valid"] for m in out["metrics"].values())
        return 2 if bad else 0

    res = Engine.from_schema(spec, row_id=args.row_id).validate(df)
    f = res.flag().collect()[0]
    print(json.dumps({"valid": f.valid, "n_rows": f.n_rows,
                      "n_invalid": f.n_invalid,
                      "n_violations": f.n_violations}))
    return 2 if not f.valid else 0


if __name__ == "__main__":
    sys.exit(main())
