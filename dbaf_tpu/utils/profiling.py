"""First-class tracing/profiling (the observability gap SURVEY.md 5.1 flags).

* ``StageTimer`` -- per-stage wall-clock accounting with a one-line report
  (replaces the reference's log-timestamp archaeology, dbaf_frontend.py:164+).
* ``device_trace`` -- context manager around ``jax.profiler`` for XLA-level
  traces when the runtime supports it.
* ``dba_fusion`` file logger matching the reference's logging surface
  (depth_video.py:117-124).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Optional


def get_logger(path: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger("dba_fusion")
    if not logger.handlers:
        logger.setLevel(logging.DEBUG)
        handler = (
            logging.FileHandler(path) if path else logging.NullHandler()
        )
        handler.setFormatter(
            logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        )
        logger.addHandler(handler)
    return logger


class StageTimer:
    """Accumulating per-stage timer.

    >>> timer = StageTimer()
    >>> with timer("update"):
    ...     ...
    >>> timer.report()
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[stage] += time.perf_counter() - t0
            self.counts[stage] += 1

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        out = []
        for stage, total in rows:
            n = self.counts[stage]
            out.append(f"{stage}: {1000*total:.1f} ms total, "
                       f"{1000*total/max(n,1):.1f} ms/call x{n}")
        return "\n".join(out)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """XLA profiler trace (view with tensorboard/xprof where available)."""
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
