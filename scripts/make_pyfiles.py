#!/usr/bin/env python
"""Build the --py-files artifact: dist/opengauss_tools_datachecker_performance_spark.zip

Zips the package (source only, deterministic order, no caches) so a
cluster run ships as:

    spark-submit --py-files dist/opengauss_tools_datachecker_performance_spark.zip \
        scripts/submit_job.py --source ... --sink ... --assets ... \
        --report-dir ... --checkpoint-dir ... --resume

The zip is importable directly (zipimport), which the test suite
verifies — so the artifact that reaches the executors is exactly the
code that passed the tests.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "opengauss_tools_datachecker_performance_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src_root = os.path.join(REPO, PKG)
    members: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(src_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            members.append((full, os.path.relpath(full, REPO)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            # pin the timestamp so the artifact is byte-reproducible
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    return out_path


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
