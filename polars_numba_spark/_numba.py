"""Optional Numba integration.

The reference hard-depends on Numba (`pyproject.toml:12-18`); this container
does not ship it, so the kernel layer degrades to plain-Python loops over
NumPy arrays when Numba is absent. Semantics are identical either way — only
throughput differs — and every public operator also offers a declarative
associative fast path that never enters Python at all.
"""

from __future__ import annotations

try:  # pragma: no cover - depends on environment
    from numba import jit as _numba_jit

    HAVE_NUMBA = True

    def maybe_jit(fn):
        """JIT-compile ``fn`` with the GIL released (ref: jit(nogil=True))."""
        return _numba_jit(nogil=True)(fn)

except ImportError:  # pragma: no cover
    HAVE_NUMBA = False

    def maybe_jit(fn):
        """Numba unavailable: run the kernel as plain Python."""
        return fn
