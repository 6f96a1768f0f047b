"""Shared timing protocol for the on-chip profiling scripts.

The session's remote-TPU tunnel makes naive timing lie (CLAUDE.md):
`block_until_ready` can return before remote completion, each dispatch and
each one-pixel fetch cost ~30 ms, and full-output fetches cost ~300 ms. The
amortized protocol here dispatches every iteration on distinct buffers and
then forces + verifies each execution by fetching one element per output —
the same protocol bench.py uses. Numbers still include the fixed
dispatch+fetch floor; subtract an identity measurement or use a chunked
mega-batch when that matters.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# make `import _timing` work when a sibling script is run from anywhere,
# and the repo importable when run as `python scripts/foo.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def timed(fn, bufs, extra=()):
    """Mean seconds per call of fn(*buf, *extra) over the distinct input
    tuples in ``bufs`` (each a tuple of args, or a bare array). Warm-up call
    + forced one-element fetch per output included."""
    import jax

    def _args(b):
        return b if isinstance(b, tuple) else (b,)

    def _force(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.ravel()[0])

    _force(fn(*_args(bufs[0]), *extra))
    t0 = time.perf_counter()
    outs = [fn(*_args(b), *extra) for b in bufs]
    for o in outs:
        _force(o)
    return (time.perf_counter() - t0) / len(bufs)
