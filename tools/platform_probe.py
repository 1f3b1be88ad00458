"""Platform scaling ceiling probe: what does THIS host give 32 workers
relative to 8, independent of Spark?

Two microbenchmarks, each run at 8 and 32 processes for ~15 s:
- alu: tight integer loop (registers only) — measures CPU scheduling
  capacity.
- mem: repeated numpy array copies over a 64 MB working set — measures
  memory-bandwidth capacity, the resource string-heavy extraction
  actually consumes.

The flagship's measured scaling efficiency must be read against these
ceilings: a job cannot scale past the platform. Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

DUR = 15


def alu(_):
    t0 = time.time()
    n = 0
    while time.time() - t0 < DUR:
        x = 0
        for i in range(100_000):
            x += i * i
        n += 1
    return n


def mem(_):
    a = np.random.default_rng(0).integers(0, 255, size=64 * 1024 * 1024 // 8, dtype=np.int64)
    t0 = time.time()
    n = 0
    while time.time() - t0 < DUR:
        b = a.copy()
        b[0] = n
        n += 1
    return n


def run(fn, procs: int) -> float:
    with mp.Pool(procs) as p:
        return float(sum(p.map(fn, range(procs))))


def main() -> None:
    out = {}
    for name, fn in (("alu", alu), ("mem", mem)):
        r8 = run(fn, 8)
        r32 = run(fn, 32)
        out[name] = {
            "agg_8": r8,
            "agg_32": r32,
            "speedup_8_to_32": round(r32 / r8, 2),
            "efficiency_vs_4x": round(r32 / r8 / 4.0, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
