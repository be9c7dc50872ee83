"""sourmash_ray — Ray-Data-native near-duplicate engine with the query and
data-processing capabilities of sourmash-bio/sourmash, re-targeted at
conversation-transcript dedup plus the wider training-data toolkit.

See README.md for the architecture, COVERAGE.md for the operator map, and
BASELINE.md for measured performance.
"""

__version__ = "0.1.0"


def _pin_malloc_pages() -> None:
    """Keep freed large allocations in the process heap instead of
    returning them to the OS (glibc: disable malloc's mmap path and
    heap trimming). numpy buffers >128 KB otherwise round-trip through
    mmap/munmap, and every REUSE re-faults the pages — measured on this
    kernel at 0.3–3 s per 64 MB depending on machine state (a 42M-row
    int64 arange swung 0.05 s ↔ 13.5 s on identical code). This is the
    round-2 scratch-pool fix applied allocator-wide: the first
    allocation still faults once, every later one is pure malloc.

    Cost: each worker's RSS stays at its high-water mark (bounded by
    the peak batch working set — tens of MB for this engine's kernels).
    Runs in every process that imports the package, i.e. the driver and
    every Ray worker executing our UDFs. No-op off glibc."""
    import ctypes
    import os
    import sys

    if not sys.platform.startswith("linux"):
        return
    if os.environ.get("SOURMASH_RAY_NO_MALLOC_PIN"):
        return  # A/B kill-switch (benchmarking the allocator effect)
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_MAX = -1, -4
        libc.mallopt(M_MMAP_MAX, 0)
        libc.mallopt(M_TRIM_THRESHOLD, -1)
    except Exception:
        pass  # non-glibc / restricted env: keep default allocator


_pin_malloc_pages()
