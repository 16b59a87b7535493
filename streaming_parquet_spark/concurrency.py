"""Driver-side overlap of independent gate branches.

Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls
them sequentially (optimization guide §2.6 "Overlap independent
jobs").  The merged family gates build N independent branch plans,
and several branches run EAGER driver actions while being built —
persist+count staging (`similarity._materialize`), iterative
localCheckpoint rounds (connected components), streaming spin-ups,
store writes.  Built serially, each such action pays its full fixed
job latency while the rest of the cluster idles; built on a small
thread pool, the scheduler backfills those jobs onto idle cores.

The result is unchanged: builders are deterministic plan
constructors, their eager actions are idempotent stagings, and the
returned DataFrames are combined by the caller exactly as before.
This matters at every scale — on a cluster the staging jobs are
bigger and the idle capacity during a straggler tail is worth more.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import Any


def parallel_branches(*builders: Callable[[], Any]) -> list[Any]:
    """Run zero-arg branch builders concurrently, return their results
    in argument order.  Exceptions propagate (first raised wins, the
    pool drains the rest).

    Uses ``pyspark.inheritable_thread_target`` so JVM thread-local
    properties (job group/description) propagate to the worker
    threads and are cleaned up when each finishes — the documented
    way to submit Spark jobs from driver threads."""
    if len(builders) == 1:
        return [builders[0]()]
    try:
        from pyspark import inheritable_thread_target
        from pyspark.sql import SparkSession

        session = SparkSession.getActiveSession()
        if session is not None:
            # The session form inherits job group/description AND tags
            # (the bare-callable form warns that tags are dropped).
            deco = inheritable_thread_target(session)
            wrapped = [deco(b) for b in builders]
        else:
            wrapped = [inheritable_thread_target(b) for b in builders]
    except Exception:  # pragma: no cover - Connect-only signature drift
        wrapped = list(builders)
    with ThreadPoolExecutor(max_workers=len(builders)) as pool:
        futures = [pool.submit(w) for w in wrapped]
        return [f.result() for f in futures]
