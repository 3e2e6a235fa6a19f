"""Host page-fault microbenchmark — the engine-independent evidence behind
BENCH.md's "Host caveat": on this sandbox VM the kernel serializes
first-touch page faults behind a global lock (~65 us each), so ANY
allocation-heavy workload anti-scales past ~8 threads, Spark or not.

Two measurements per thread count, both via ctypes.memset (the call
releases the GIL, so Python threads genuinely run concurrently):

  fresh — memset over a NEW anonymous mmap: every 4 KiB page takes a
          minor fault on first touch (what shuffle buffers, Arrow
          allocations and JVM heap growth do on first use)
  warm  — second memset over the same, now-resident buffer: no kernel
          involvement, pure memory bandwidth (the expected-parallel case)

A healthy host scales BOTH columns with threads (until the memory bus
saturates). This VM scales `warm` and collapses `fresh` to a flat, thread-
count-independent aggregate — a serial kernel term that caps local[32]
vs local[8] for any job faulting new memory inside the measured window.
The per-fault cost is estimated as (fresh_wall - warm_wall) / pages.

Usage: python scripts/fault_bench.py [threads ...]   (default: 1 2 8 32)
Prints one JSON line. Wall-clock varies 2-3x run-to-run on this host;
compare orders of magnitude, not percent.
"""

import ctypes
import json
import mmap
import sys
import threading
import time

PAGE = 4096
MB_PER_THREAD = 512


def _memset(buf: mmap.mmap, n_bytes: int, out: list, idx: int):
    addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
    t0 = time.perf_counter()
    ctypes.memset(addr, 1, n_bytes)              # GIL released in the call
    out[idx] = time.perf_counter() - t0


def _timed_round(bufs, n_bytes: int) -> float:
    times = [0.0] * len(bufs)
    ts = [threading.Thread(target=_memset, args=(b, n_bytes, times, i))
          for i, b in enumerate(bufs)]
    t0 = time.perf_counter()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return time.perf_counter() - t0


def run(threads: int) -> dict:
    n_bytes = MB_PER_THREAD * 1024 * 1024
    bufs = [mmap.mmap(-1, n_bytes) for _ in range(threads)]
    fresh_wall = _timed_round(bufs, n_bytes)     # faults + writes
    warm_wall = _timed_round(bufs, n_bytes)      # writes only
    for b in bufs:
        b.close()
    total_gb = threads * n_bytes / 1e9
    pages = threads * (n_bytes // PAGE)
    return {
        "threads": threads,
        "fresh_gbps": round(total_gb / fresh_wall, 3),
        "warm_gbps": round(total_gb / warm_wall, 3),
        "us_per_fault": round(max(0.0, fresh_wall - warm_wall)
                              / pages * 1e6, 2),
    }


def main():
    args = [int(a) for a in sys.argv[1:]] or [1, 2, 8, 32]
    rows = [run(t) for t in args]
    print(json.dumps({"page_size": PAGE, "mb_per_thread": MB_PER_THREAD,
                      "rows": rows}))


if __name__ == "__main__":
    main()
