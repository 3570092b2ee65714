"""spark-submit entry point for the KG-construction pipeline (north rule:
"runs via spark-submit --py-files at N and 4N executors").

Local sandbox:
    python scripts/run_pipeline.py --root /tmp/kg --pages 10000 --parts 16

Cluster (the invocation the north rule names — package the library, ship
it to executors, point the sinks at the Iceberg catalog via TableIO):
    cd /root/repo && zip -qr /tmp/ords.zip ocaml_rdf_spark
    spark-submit \
        --master <cluster> \
        --py-files /tmp/ords.zip \
        scripts/run_pipeline.py --root <warehouse-path> --pages <N> --parts <P>

The same script run twice against the same --root resumes: committed
stages (matching fingerprint) are skipped, which is the kill/resume
behavior tests/test_kg_ops.py::test_pipeline_commit_resume verifies.
Prints one JSON line per stage (name, rows, seconds, skipped).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="pipeline warehouse dir (parquet locally, Iceberg in prod)")
    ap.add_argument("--pages", type=int, default=10000, help="synthetic corpus size (prod: read the pages table)")
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from ocaml_rdf_spark.pipeline import kg_pipeline
    from ocaml_rdf_spark.session import get_spark

    spark = get_spark(app="ords-kg-pipeline", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pipe = kg_pipeline(spark, args.root, n_pages=args.pages, parts=args.parts)
    for entry in pipe.run():
        print(json.dumps({k: entry[k] for k in ("stage", "rows", "seconds") if k in entry} | {"skipped": entry["skipped"]}))


if __name__ == "__main__":
    main()
