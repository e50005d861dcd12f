"""Async period prefetch: overlap host-side period IO with device training.

The reference ships (but never instantiates) a CUDA-stream batch prefetcher
(``data/dataset2.py:11-48``). The TPU-appropriate analogue works at PERIOD
granularity: while the device trains period t, a background thread already
reads period t+1's ``.npy`` files and assembles its ``StageData`` (including
the negative-pool selection), so ``next_train`` returns immediately at the
period boundary.

``PrefetchingFeeder`` wraps any feeder exposing ``next_train(d_time)`` /
``reinit()``. Periods MUST be requested in strictly increasing ``d_time``
order between ``reinit()`` calls (the SML driver's and the CLI resume
loop's contract): the inner feeder's test cursor advances on every call, so
once t+1 has been prefetched, serving anything other than t+1 next would
silently read the wrong test period — the wrapper raises instead.
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor
from typing import Optional


class PrefetchingFeeder:
    def __init__(self, inner, lookahead: bool = True):
        self._inner = inner
        self._enabled = lookahead
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="sml-prefetch")
        self._pending: Optional[Future] = None
        self._pending_time: Optional[int] = None
        # optional hook, called IN THE WORKER THREAD with (d_time, StageData)
        # right after a period is prefetched — the driver uses it to pad +
        # device_put the period's eval sets while the device still trains
        # the previous period (the (rows, 1001) uploads otherwise serialize
        # with training at each test-period boundary)
        self.on_prefetch = None

    # pass-through surface of PeriodFeeder
    @property
    def n_users(self) -> int:
        return self._inner.n_users

    @property
    def n_items(self) -> int:
        return self._inner.n_items

    @property
    def info(self):
        return self._inner.info

    def shape_bounds(self) -> dict:
        return self._inner.shape_bounds()

    def reinit(self) -> None:
        self._cancel()
        self._inner.reinit()

    def _cancel(self) -> None:
        if self._pending is not None:
            # the worker is read-only over period files; just await it
            try:
                self._pending.result()
            except Exception:
                pass
        self._pending = None
        self._pending_time = None

    def next_train(self, d_time: int):
        if self._pending is not None and self._pending_time == d_time:
            fut, self._pending, self._pending_time = self._pending, None, None
            sd = fut.result()
        elif self._pending is not None:
            # the prefetch already advanced the inner feeder's test cursor
            # for _pending_time; serving any other period now would read the
            # wrong test file — fail loudly instead
            raise RuntimeError(
                f"PrefetchingFeeder: period {self._pending_time} was "
                f"prefetched but {d_time} was requested; consume periods "
                f"sequentially or call reinit()")
        else:
            sd = self._inner.next_train(d_time)
        if self._enabled and sd.set_t is not None:
            self._pending_time = d_time + 1
            self._pending = self._pool.submit(self._fetch, d_time + 1)
        return sd

    def _fetch(self, d_time: int):
        sd = self._inner.next_train(d_time)
        hook = self.on_prefetch
        if hook is not None and sd.set_t is not None:
            try:
                hook(d_time, sd)
            except Exception:
                pass  # the hook is an optimization, never a requirement
        return sd

    def close(self) -> None:
        self._cancel()
        self._pool.shutdown(wait=False)
