"""Progress / throughput reporting — the Spark rendering of the
reference's ``GlobalProgress`` + ``ProgressTracker``
(/root/reference/src/progress.rs:6-197: files/bytes totals, MB/s,
ETA, percent, terminal bar).

Batch Spark exposes task-level progress through
``SparkContext.statusTracker()``; a sampler thread turns that into the
same fields the reference renders (percent, elapsed, ETA, MB/s vs the
known input byte total). Streaming runs get the richer
``StreamingQuery.lastProgress`` instead (see streaming/stream.py).
"""

from __future__ import annotations

import sys
import threading
import time
from dataclasses import dataclass, field


@dataclass
class ProgressSample:
    """One sampled snapshot (GlobalProgress fields, progress.rs:6-61)."""

    elapsed_sec: float
    tasks_done: int
    tasks_total: int
    percent: float
    eta_sec: float | None
    mb_per_sec: float | None


@dataclass
class ProgressReporter:
    """Samples Spark task progress on a background thread.

    Use as a context manager around a blocking action; ``samples``
    holds the trace afterwards. ``render=True`` draws a carriage-return
    progress line to stderr (the indicatif-bar analog,
    progress.rs:64-135).
    """

    spark: object
    input_bytes: int | None = None
    interval_sec: float = 0.5
    render: bool = False
    samples: list[ProgressSample] = field(default_factory=list)
    _stop: threading.Event = field(default_factory=threading.Event)
    _thread: threading.Thread | None = None
    _t0: float = 0.0

    def __enter__(self) -> "ProgressReporter":
        self._t0 = time.time()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2.0)
        if self.render:
            sys.stderr.write("\n")

    def _snapshot(self) -> ProgressSample | None:
        try:
            tracker = self.spark.sparkContext.statusTracker()
            done = total = 0
            for sid in tracker.getActiveStageIds():
                info = tracker.getStageInfo(sid)
                if info is None:
                    continue
                total += info.numTasks
                done += info.numCompletedTasks
        except Exception:
            return None
        if total == 0:
            return None
        elapsed = time.time() - self._t0
        pct = 100.0 * done / total
        eta = elapsed * (total - done) / done if done else None
        mbps = (
            self.input_bytes / 1e6 * (done / total) / elapsed
            if self.input_bytes and elapsed > 0
            else None
        )
        return ProgressSample(elapsed, done, total, pct, eta, mbps)

    def _run(self) -> None:
        while not self._stop.wait(self.interval_sec):
            s = self._snapshot()
            if s is None:
                continue
            self.samples.append(s)
            if self.render:
                eta = f" eta {s.eta_sec:.0f}s" if s.eta_sec is not None else ""
                mbps = f" {s.mb_per_sec:.0f} MB/s" if s.mb_per_sec else ""
                sys.stderr.write(
                    f"\r[maw-spark] {s.percent:5.1f}% "
                    f"({s.tasks_done}/{s.tasks_total} tasks,"
                    f" {s.elapsed_sec:.0f}s{eta}{mbps})   "
                )
                sys.stderr.flush()
