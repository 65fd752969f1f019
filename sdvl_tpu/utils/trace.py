"""Structured per-stage tracing and device profiling.

The reference's only observability is a ``gettimeofday`` stopwatch printed
per frame (reference extra/timer.h:31-62, used at main.cc:136-146 and
map.cc:86,133-140) — unstructured stdout that external tools must scrape.
Here tracing is structured and first-class:

  * :class:`Tracer` — named spans with host-side wall-clock aggregation
    (count / mean / p50 / p95 / max), exportable as JSON or JSONL, nestable,
    and cheap enough to leave on in production (two ``perf_counter`` calls
    per span; no allocation beyond one float append).
  * :func:`jax_profile` — context manager around ``jax.profiler`` producing
    a TensorBoard/Perfetto trace of the actual device execution (the
    XLA-level truth the host stopwatch can't see).

Spans measure *host-observed* latency: for spans enclosing a
``block_until_ready`` this is true end-to-end step latency; for spans around
dispatch-only code it measures enqueue cost (JAX is async) — pass
``block=True`` to synchronize the device at span exit.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional


class Tracer:
    """Named-span wall-clock tracer with summary statistics."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._spans: Dict[str, List[float]] = {}
        self._stack: List[str] = []
        self._events: List[dict] = []
        self._keep_events = False

    # ------------------------------------------------------------------ API
    @contextlib.contextmanager
    def span(self, name: str, block: bool = False):
        """Time a region. Nested spans get dotted names (``track.align``)."""
        if not self.enabled:
            yield
            return
        full = ".".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block:
                import jax

                (jax.device_put(0.0) + 0).block_until_ready()
            dt = (time.perf_counter() - t0) * 1e3
            self._stack.pop()
            self._spans.setdefault(full, []).append(dt)
            if self._keep_events:
                self._events.append({"name": full, "t0": t0, "ms": dt})

    def keep_events(self, on: bool = True):
        """Also retain the raw per-span event list (for timelines)."""
        self._keep_events = on

    # -------------------------------------------------------------- reports
    def summary(self) -> Dict[str, dict]:
        out = {}
        for name, xs in sorted(self._spans.items()):
            s = sorted(xs)
            n = len(s)
            out[name] = {
                "n": n,
                "mean_ms": round(sum(s) / n, 3),
                "p50_ms": round(s[n // 2], 3),
                "p95_ms": round(s[min(n - 1, int(n * 0.95))], 3),
                "max_ms": round(s[-1], 3),
                "total_ms": round(sum(s), 1),
            }
        return out

    def report(self) -> str:
        lines = [f"{'span':<28} {'n':>6} {'mean':>8} {'p50':>8} "
                 f"{'p95':>8} {'max':>8}  (ms)"]
        for name, st in self.summary().items():
            lines.append(
                f"{name:<28} {st['n']:>6} {st['mean_ms']:>8.3f} "
                f"{st['p50_ms']:>8.3f} {st['p95_ms']:>8.3f} "
                f"{st['max_ms']:>8.3f}"
            )
        return "\n".join(lines)

    def write_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)

    def write_events_jsonl(self, path: str) -> None:
        with open(path, "w") as f:
            for e in self._events:
                f.write(json.dumps(e) + "\n")

    def reset(self) -> None:
        self._spans.clear()
        self._events.clear()


@contextlib.contextmanager
def jax_profile(logdir: str):
    """Capture a device-level profiler trace viewable in TensorBoard or
    Perfetto (``jax.profiler.trace``)."""
    import jax

    with jax.profiler.trace(logdir):
        yield
