#!/usr/bin/env python
"""Pre-generate (and re-stamp) the fixture + ANN oracle cache.

Usage:  python scripts/gen_fixtures.py [sf_dir ...]

Defaults to the committed scales (/root/testdata/sf0.001 and sf0.01).
The cache normally self-invalidates — the stamp covers both the source
parquet content AND the kernel/builder source files — so this script is
only needed to pre-commit fixtures for a new scale, or to force-refresh
with --force.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    force = "--force" in sys.argv
    scales = args or DEFAULT_SCALES

    from tsc_spark.oracle_fixtures import (
        FIXTURE_BUILDERS,
        ann_oracle_sql_cached,
        fixture_sql,
    )

    for sf in scales:
        t0 = time.time()
        for name in FIXTURE_BUILDERS:
            fixture_sql(name, sf, force=force)
            print(f"[{os.path.basename(sf)}] {name} ok")
        ann = ann_oracle_sql_cached(sf)
        for name in ann:
            print(f"[{os.path.basename(sf)}] {name} ok")
        print(f"{sf}: {len(FIXTURE_BUILDERS) + len(ann)} oracles in "
              f"{time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
