#!/usr/bin/env python
"""Build tsc_spark.zip for spark-submit --py-files deployment.

Usage: python scripts/make_pyfiles.py [out.zip]
Then:  spark-submit --py-files tsc_spark.zip scripts/run_pipeline.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "tsc_spark.zip")
    pkg = os.path.join(REPO, "tsc_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    print(out)


if __name__ == "__main__":
    main()
