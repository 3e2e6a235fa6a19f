"""py3dtiles_spark — PySpark-native spatial tiling + training-data engine.

On import, tune glibc malloc for the numpy kernels (Python processes
only — Spark executors fork Python workers which import this package):
large numpy temporaries otherwise mmap/munmap-cycle, and the kernel
page-fault path is globally serialized, which collapses throughput under
many concurrent workers (measured 20x on virtualized hosts). With
M_MMAP_MAX=0 + no trim, pages fault once and are reused; worker RSS
plateaus at its high-water mark (bounded by the largest Arrow group).
"""

from __future__ import annotations

import ctypes
import sys


def _tune_malloc() -> None:
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_MAX = -1, -4
        libc.mallopt(M_MMAP_MAX, 0)
        libc.mallopt(M_TRIM_THRESHOLD, 2**31 - 1)
    except OSError:
        pass


_tune_malloc()
