"""dint_tpu: TPU-native rebuild of the DINT/ds2i indexing framework.

Importing the package applies two host-memory mitigations for
VM-backed guests with virtio free-page reporting (this box): the
hypervisor unbacks every page the guest frees, so re-touching memory
that glibc returned via munmap/trim costs a ~50 us cold fault per 4K
page (~20 MB/s — a 91M-element diff measured 68 s).  Fixes:

1. glibc mallopt(M_MMAP_MAX=0, M_TRIM_THRESHOLD=max): large
   allocations live on the brk heap and freed blocks are never
   returned to the kernel, so pages stay hypervisor-backed and warm.
   Steady-state large numpy temporaries drop 40-80 s -> ~1 s; only
   the first touch of new peak footprint pays the cold fault.
2. numpy's transparent-huge-page madvise is disabled (env +
   runtime toggle, effective even when numpy was imported first):
   with THP defrag=madvise, madvised first-touch additionally risks
   direct-compaction stalls, and the 2M fault granularity does not
   amortize the hypervisor cost (measured identical ~20 MB/s).

Set DINT_TPU_NO_MALLOPT=1 / NUMPY_MADVISE_HUGEPAGE=1 to opt out on
hosts with normally-backed memory.
"""

import ctypes as _ctypes
import os as _os

_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

if not _os.environ.get("DINT_TPU_NO_MALLOPT"):
    try:
        _libc = _ctypes.CDLL("libc.so.6")
        _libc.mallopt(-4, 0)  # M_MMAP_MAX = 0
        _libc.mallopt(-1, 2**31 - 1)  # M_TRIM_THRESHOLD = never
    except Exception:  # pragma: no cover - non-glibc platforms
        pass

if _os.environ.get("NUMPY_MADVISE_HUGEPAGE") == "0":
    try:
        try:
            from numpy._core import multiarray as _ma  # numpy >= 2
        except ImportError:  # pragma: no cover - numpy 1.x
            from numpy.core import multiarray as _ma
        _ma._set_madvise_hugepage(False)
    except Exception:  # pragma: no cover - future numpy internals drift
        pass
