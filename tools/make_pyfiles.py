#!/usr/bin/env python3
"""Build dist/tinyetl_spark.zip for `spark-submit --py-files`.

The north-star deployment shape is `spark-submit --py-files engine.zip
job.py` on a multi-executor cluster (reference: TinyETL ships one static
binary; the Spark equivalent of "copy one file to the box" is shipping
one zip with the job). The zip holds the package at its root so both the
driver and every executor's python workers can `import tinyetl_spark`
straight off the Spark-distributed archive — no install step.

Usage:  python tools/make_pyfiles.py [out_zip]
Prints the zip path on stdout.
"""
from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "tinyetl_spark")


def build(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO, "dist", "tinyetl_spark.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(PKG):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_zip


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
