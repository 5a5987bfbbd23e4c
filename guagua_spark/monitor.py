"""Compute timeout guard — reference @ComputableMonitor parity.

The reference wraps master/worker compute in a single-thread executor
with ``.get(timeout)`` (ComputableMonitor.java:54-73; enforcement
GuaguaMasterService.java:241-272, GuaguaWorkerService.java:270-297):
soft timeout → null result for the iteration; hard timeout → the task
kills itself so MR/YARN reattempts elsewhere.

On Spark the hard case is better served by ``spark.speculation`` (and
the engine's partial barrier), so the hard mode here raises — letting
Spark's task retry machinery take over — while soft mode returns None,
exactly like the reference's null result.
"""

from __future__ import annotations

import functools
from concurrent.futures import ThreadPoolExecutor
from concurrent.futures import TimeoutError as FutureTimeout
from typing import Any, Callable


class ComputeTimeout(RuntimeError):
    """Raised by a hard-mode monitor when compute exceeds its budget."""


def computable_monitor(
    seconds: float, is_soft: bool = True
) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
    """Decorator for a ``compute`` method: bound its wall-time.

    >>> class W(WorkerComputable):
    ...     @computable_monitor(60.0, is_soft=True)
    ...     def compute(self, ctx, batches): ...

    Soft: on timeout return ``None`` (the master sees a missing result,
    as with the reference's null — masters must already tolerate result
    lists shorter than num_workers under the partial barrier).
    Hard: raise ComputeTimeout — the Spark task fails and standard task
    retry / speculation applies.

    The underlying thread is not killed (Python cannot safely kill a
    thread); it finishes in the background and its result is discarded —
    identical caveat to the reference's executor ``.get(timeout)``.
    """

    def deco(fn: Callable[..., Any]) -> Callable[..., Any]:
        @functools.wraps(fn)
        def wrapped(*args: Any, **kwargs: Any) -> Any:
            ex = ThreadPoolExecutor(max_workers=1)
            try:
                fut = ex.submit(fn, *args, **kwargs)
                try:
                    return fut.result(timeout=seconds)
                except FutureTimeout:
                    if is_soft:
                        return None
                    raise ComputeTimeout(
                        f"{fn.__qualname__} exceeded {seconds}s"
                    ) from None
            finally:
                ex.shutdown(wait=False)

        return wrapped

    return deco
