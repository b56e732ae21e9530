"""Host parallelism calibration: measure the speedup the MACHINE gives a
pure-CPU embarrassingly-parallel job at two process widths (default 4 and
16).  On a clean dedicated host this reads ~4.0 for 16-vs-4; a hypervisor
that throttles wide parallelism (CPU steal) caps it lower, and no engine
measurement taken in that window can exceed the cap.  Ladder runs record
this alongside their legs so an engine-efficiency reading is interpretable:
engine_eff / host_ceiling_eff is the engine's true share.

Usage: python scripts/host_calibrate.py [narrow] [wide] [seconds_per_leg]
Prints one JSON line: {"narrow": N, "wide": W, "ops_narrow": .., "ops_wide":
.., "speedup": .., "ceiling_eff": speedup/(W/N)}.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _burn(args):
    seconds, = args
    import hashlib

    t0 = time.time()
    n = 0
    h = hashlib.sha256()
    buf = b"x" * 8192
    while time.time() - t0 < seconds:
        for _ in range(200):
            h.update(buf)
        n += 200
    return n


def _leg(width: int, seconds: float) -> float:
    with mp.Pool(width) as pool:
        t0 = time.time()
        counts = pool.map(_burn, [(seconds,)] * width)
        took = time.time() - t0
    return sum(counts) / took


def main():
    narrow = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    wide = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    secs = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    with open("/proc/loadavg") as f:
        la = f.read().split()[0]
    ops_n = _leg(narrow, secs)
    ops_w = _leg(wide, secs)
    speedup = ops_w / ops_n
    print(
        json.dumps(
            {
                "narrow": narrow,
                "wide": wide,
                "ops_narrow": round(ops_n),
                "ops_wide": round(ops_w),
                "speedup": round(speedup, 2),
                "ceiling_eff": round(speedup / (wide / narrow), 2),
                "loadavg_before": la,
            }
        )
    )


if __name__ == "__main__":
    main()
