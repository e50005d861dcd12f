"""Profiler hooks.

The reference's only tracing is ad-hoc ``time.time()`` prints
(``model/transfer.py:697,731,794``). Here: structured per-period timing goes
through :mod:`sml_tpu.utils.logging`, and XLA-level traces come from
``jax.profiler`` via this context manager (viewable in TensorBoard /
Perfetto).
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """Trace the enclosed block with jax.profiler when a dir is given."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up in the timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
