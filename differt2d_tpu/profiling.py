"""Profiling and throughput observability.

The reference benchmarks externally (pytest-benchmark + CodSpeed CI) and
ships no in-library tracing; for a production TPU framework we provide:

* :func:`trace` -- context manager around :func:`jax.profiler.trace`
  (view with TensorBoard / xprof);
* :class:`Timer` -- wall-clock timing with ``block_until_ready``;
* :func:`throughput` -- steady-state grid-points/s measurement for any
  pixel-batched function (the number bench.py reports).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, **kwargs: Any) -> Iterator[None]:
    """Capture a device profile into ``log_dir`` for TensorBoard/xprof."""
    jax.profiler.start_trace(log_dir, **kwargs)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that waits for async dispatch to finish.

    >>> import jax.numpy as jnp
    >>> with Timer() as t:
    ...     out = t.block_on(jnp.arange(4) * 2)
    >>> t.elapsed > 0.0  # seconds
    True
    """

    def __enter__(self) -> "Timer":
        self.start = time.perf_counter()
        self.elapsed: Optional[float] = None
        return self

    def block_on(self, value: Any) -> Any:
        jax.block_until_ready(value)
        return value

    def __exit__(self, *exc_info: Any) -> None:
        self.elapsed = time.perf_counter() - self.start


def throughput(
    fn: Callable[..., Any],
    *args: Any,
    items: int,
    warmup: int = 2,
    iters: int = 5,
) -> dict[str, float]:
    """Steady-state items/s for ``fn(*args)`` (compile excluded).

    :param items: Number of work items one call processes (e.g. grid
        points), used to normalize the rate.
    :return: dict with ``items_per_s``, ``s_per_call``, ``calls``.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"items_per_s": items / dt, "s_per_call": dt, "calls": iters}
