"""Streaming memory-bandwidth ceiling at two process widths.

host_calibrate.py measures the pure-CPU ceiling (sha256 loops — L1-resident,
no memory traffic); this probe measures the opposite pole: large-array
memcpy, the regime parquet scans / Arrow transposes / python string churn
live in.  The round-4 post-mortem measured ~49 GB/s saturation on this VM,
capping 4-vs-16 streaming work at ~0.50 efficiency — a ceiling no engine
can exceed, which is why the crawl ladder also runs a 2-vs-8 pairing
(same 4x factor, below saturation).

Each worker repeatedly copies a 64 MB float64 array (read + write = 128 MB
per pass, far beyond L3) for `seconds`; reported GB/s counts both streams.

Usage: python scripts/bw_calibrate.py [narrow] [wide] [seconds_per_leg]
Prints one JSON line: {"narrow": N, "wide": W, "gbs_narrow": .., "gbs_wide":
.., "speedup": .., "ceiling_eff": speedup/(W/N)}.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _stream(args):
    seconds, = args
    import numpy as np

    src = np.ones(8 * 1024 * 1024, dtype=np.float64)  # 64 MB
    dst = np.empty_like(src)
    t0 = time.time()
    passes = 0
    while time.time() - t0 < seconds:
        np.copyto(dst, src)
        passes += 1
    return passes * src.nbytes * 2  # read + write


def _leg(width: int, seconds: float) -> float:
    with mp.Pool(width) as pool:
        t0 = time.time()
        totals = pool.map(_stream, [(seconds,)] * width)
        took = time.time() - t0
    return sum(totals) / took / 1e9


def main():
    narrow = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    wide = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    secs = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0
    with open("/proc/loadavg") as f:
        la = f.read().split()[0]
    gbs_n = _leg(narrow, secs)
    gbs_w = _leg(wide, secs)
    speedup = gbs_w / gbs_n
    print(
        json.dumps(
            {
                "narrow": narrow,
                "wide": wide,
                "gbs_narrow": round(gbs_n, 1),
                "gbs_wide": round(gbs_w, 1),
                "speedup": round(speedup, 2),
                "ceiling_eff": round(speedup / (wide / narrow), 2),
                "loadavg_start": la,
            }
        )
    )


if __name__ == "__main__":
    main()
