"""Opt-in wall-clock profiling scopes (role of the reference's
python/stillleben/profiling.py, rebuilt records-then-render for JAX).

Design: scopes don't build a live object tree. Each ``Timer`` exit appends a
flat ``(depth, label, seconds)`` record to a module buffer; when the last
open scope closes, the buffer is rendered as an indented report and cleared.
This keeps ``__exit__`` allocation-free inside hot loops and lets callers
fetch the raw records programmatically (``drain_records``) instead of
parsing stdout.

JAX twist: device work is async, so a wall clock around a dispatch measures
nothing. ``Timer(name, sync=x)`` calls ``jax.block_until_ready(x)`` on exit
before reading the clock — the analogue of the reference's explicit
``torch.cuda.synchronize()`` before timed blocks.
"""

from __future__ import annotations

import time
from contextlib import ContextDecorator

_records: list[tuple[int, str, float]] = []
_depth = 0


def drain_records() -> list[tuple[int, str, float]]:
    """Return and clear the accumulated (depth, label, seconds) records."""
    global _records
    out, _records = _records, []
    return out


def _render(records) -> str:
    lines = ["profile:"]
    for depth, label, secs in records:
        lines.append(f"{'  ' * (depth + 1)}{label} {secs * 1e3:.1f} ms")
    return "\n".join(lines)


class Timer(ContextDecorator):
    """``with Timer("stage"): ...`` or ``@Timer("fn")``; no-op unless
    ``Timer.enabled`` is True."""

    enabled = False

    def __init__(self, name: str, sync=None):
        self.name = name
        self._sync = sync
        self._t0 = 0.0
        self._slot = -1

    def __enter__(self):
        global _depth
        if Timer.enabled:
            _records.append((_depth, self.name, 0.0))
            self._slot = len(_records) - 1
            _depth += 1
            self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        global _depth
        if not Timer.enabled:
            return
        if self._sync is not None:
            import jax

            jax.block_until_ready(self._sync)
        elapsed = time.perf_counter() - self._t0
        _depth -= 1
        d, label, _ = _records[self._slot]
        _records[self._slot] = (d, label, elapsed)
        if _depth == 0:
            print(_render(drain_records()))
