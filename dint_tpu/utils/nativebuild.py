"""Compile-on-first-use machinery shared by the native C++ runtime.

Sources live in ``<checkout>/native`` — the package expects an editable
install (``pip install -e .``, see pyproject.toml).  When the sources
are absent (a plain wheel install), callers degrade to their pure
Python/numpy paths with a one-line stderr notice instead of failing
mid-build.

Builds are safe under concurrent processes: the sharded builders
(``dint_tpu/parallel/build.py``) spawn worker pools that can all hit a
cold checkout at once, so the compiler writes to a temp file that is
atomically renamed into place, and an exclusive ``flock`` serializes
rebuilds — no process ever ``dlopen``s a half-written shared object.
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import subprocess
import sys
import tempfile
from typing import Optional, Sequence

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REPO_ROOT = os.path.dirname(_PKG_ROOT)


def source_path(filename: str) -> Optional[str]:
    """Locate a native source file, or None with a stderr notice.

    ``DINT_TPU_NATIVE_DIR`` overrides the default ``<checkout>/native``
    (useful when the package is installed non-editable but a source
    tree is available elsewhere)."""
    for d in (os.environ.get("DINT_TPU_NATIVE_DIR"),
              os.path.join(_REPO_ROOT, "native")):
        if d:
            p = os.path.join(d, filename)
            if os.path.exists(p):
                return p
    print(
        f"dint_tpu: native source {filename} not found (expected under "
        f"{os.path.join(_REPO_ROOT, 'native')}; set DINT_TPU_NATIVE_DIR "
        "or install editable: pip install -e .) — using the pure-Python "
        "fallback path",
        file=sys.stderr,
    )
    return None


def _out_dir(src: str) -> str:
    d = os.path.dirname(src)
    if os.access(d, os.W_OK):
        return d
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "dint_tpu",
    )
    os.makedirs(cache, exist_ok=True)
    return cache


@contextlib.contextmanager
def _locked(path: str):
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def ensure_so(
    src: str,
    so_name: str,
    extra_args: Sequence[str] = (),
    force: bool = False,
    extra_srcs: Sequence[str] = (),
) -> Optional[str]:
    """Compile ``src`` (+ ``extra_srcs``) into ``so_name`` if stale;
    return the .so path.

    The compile is atomic (temp file + rename) and serialized across
    processes by a lock file, so concurrent first-use builders are
    safe.  ``force`` rebuilds even when fresh (used by the TLS-model
    fallback retry).  Returns None if the toolchain fails.  The
    freshness hash covers every source file."""
    out = os.path.join(_out_dir(src), so_name)
    if not force and _fresh(out, src, extra_srcs):
        return out
    with _locked(out + ".lock"):
        if not force and _fresh(out, src, extra_srcs):
            return out
        args = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                "-fPIC", *extra_args]
        fd, tmp = tempfile.mkstemp(
            suffix=".so.tmp", dir=os.path.dirname(out)
        )
        os.close(fd)
        try:
            subprocess.run(
                args + [src, *extra_srcs, "-o", tmp], check=True,
                capture_output=True,
            )
            os.replace(tmp, out)
            with open(out + ".srchash", "w") as f:
                f.write(_src_hash(src, extra_srcs))
            return out
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"native build of {so_name} failed: {e}", file=sys.stderr)
            # No toolchain but a prebuilt (hashless) binary exists:
            # adopt it once rather than silently dropping every native
            # fast path forever.  A stale-export binary fails loudly at
            # symbol lookup, which is strictly better than quiet
            # fallback; write the sidecar so the adoption is one-time.
            if os.path.exists(out):
                print(
                    f"dint_tpu: adopting prebuilt {so_name} without a "
                    "source-hash sidecar (toolchain unavailable) — "
                    "rebuild with g++ on PATH to refresh it",
                    file=sys.stderr,
                )
                with open(out + ".srchash", "w") as f:
                    f.write(_src_hash(src, extra_srcs))
                return out
            return None
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)


def _src_hash(src: str, extra_srcs: Sequence[str] = ()) -> str:
    import hashlib

    h = hashlib.sha256()
    for p in (src, *extra_srcs):
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _fresh(out: str, src: str, extra_srcs: Sequence[str] = ()) -> bool:
    """A binary is fresh only if its recorded source hash matches.

    mtime alone is NOT trustworthy: a git checkout stamps source and
    any stray binary with the same time, which once served a stale
    committed .so whose exports lagged the source (missing
    qh_dict_copy).  Binaries without a hash sidecar are rebuilt."""
    if not os.path.exists(out):
        return False
    try:
        with open(out + ".srchash") as f:
            return f.read().strip() == _src_hash(src, extra_srcs)
    except OSError:
        return False
