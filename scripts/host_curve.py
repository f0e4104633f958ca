"""Measure the sandbox host's own parallel-delivery curve, Spark-free.

The north rule's scaling criterion compares throughput at two cluster
sizes.  This sandbox substitutes parallelism levels of one VM
(``local[N]`` vs ``local[4N]``), which silently assumes the VM's N
vCPUs deliver N cores' worth of hardware at every N.  They do not:
this probe runs a pure-arithmetic numpy kernel (cache-resident
``sqrt().sum()``, no Spark, no JVM, no I/O) in 2/4/8/16/32 worker
processes, interleaved best-of-3, and reports the aggregate rate at
each width plus the 4x-span pair efficiencies.

Measured on this VM (2026-08-18, idle): per-core rate falls
655 -> 634 -> 551 -> 381 Mrows/s as width grows 2 -> 32, giving
hardware pair efficiencies 2->8 = 0.968, 4->16 = 0.862,
8->32 = 0.601.  The guest's "32 CPUs" physically deliver ~2.4x the
arithmetic of 8 — a virtualization/host-clock property that caps ANY
8->32 measurement, Spark or not.  BASELINE.md therefore reports
full-width job pairs both raw and normalized by this curve: on a real
cluster, 4x executors bring 4x machines (private memory buses and
clock domains), which is the regime the small-width pairs (2->8)
measure directly.

``--kernel mem`` swaps the arithmetic kernel for a 256 MB streaming
sum (memory-bandwidth bound; reports MB/s instead of Mrows/s) — on
this VM bandwidth scales 8->32 at 0.821, notably better than
arithmetic, which brackets where a scan+agg pipeline should land.

Usage: python scripts/host_curve.py [--levels 2,4,8,16,32]
                                    [--repeats 3] [--kernel cpu|mem]
Prints one JSON line: {"best_mrows": {...}, "per_core": {...},
"pair_eff": {"2->8": ..., "4->16": ..., "8->32": ...}}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _cpu_work(_):
    import numpy as np

    a = np.arange(1_000_000, dtype=np.float64)
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(60):
        s += np.sqrt(a).sum()
    dt = time.perf_counter() - t0
    return 60 * 1_000_000 / dt


def _mem_work(_):
    import numpy as np

    a = np.zeros(32_000_000, dtype=np.float64)  # 256 MB working set
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(6):
        s += a.sum()
    dt = time.perf_counter() - t0
    return 6 * a.nbytes / dt  # bytes/s; the /1e6 below renders MB/s


def _run(n: int, fn) -> float:
    with mp.Pool(n) as p:
        return sum(p.map(fn, range(n)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,4,8,16,32")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--kernel", choices=["cpu", "mem"], default="cpu")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    fn = _cpu_work if args.kernel == "cpu" else _mem_work

    _run(max(levels), fn)  # untimed governor ramp (same rationale as bench.py)
    agg: dict[int, list[float]] = {n: [] for n in levels}
    for _ in range(max(args.repeats, 1)):
        for n in levels:  # interleaved so window drift hits all levels alike
            agg[n].append(_run(n, fn))
    best = {n: max(v) for n, v in agg.items()}
    pairs = [(a, b) for a in levels for b in levels if b == 4 * a]
    print(json.dumps({
        "best_mrows": {n: round(v / 1e6, 1) for n, v in best.items()},
        "per_core": {n: round(v / 1e6 / n, 1) for n, v in best.items()},
        "pair_eff": {f"{a}->{b}": round((best[b] / best[a]) / (b // a), 3)
                     for a, b in pairs},
    }))


if __name__ == "__main__":
    main()
