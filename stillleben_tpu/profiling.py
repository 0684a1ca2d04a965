"""Nested wall-clock timing (reference python/stillleben/profiling.py).

Identical semantics: opt-in via ``Timer.enabled``, context manager or
decorator, tree printout when the outermost timer exits. For accurate device
timings wrap the block's outputs with ``jax.block_until_ready`` yourself
(the analogue of the reference's torch.cuda.synchronize calls)."""

from __future__ import annotations

import time
from contextlib import ContextDecorator


class Timer(ContextDecorator):
    active_timers: list["Timer"] = []
    enabled = False

    def __init__(self, name: str):
        self.name = name
        self.parent = None
        self.children: list["Timer"] = []

    def __enter__(self):
        if not Timer.enabled:
            return self
        self.start_time = time.time()
        Timer.active_timers.append(self)
        self.children = []
        return self

    def __exit__(self, exc_type, exc, exc_tb):
        if not Timer.enabled:
            return
        self.exit_time = time.time()
        self.duration = self.exit_time - self.start_time
        assert Timer.active_timers.pop() == self
        if len(Timer.active_timers) == 0:
            print("Timings:")
            self._print_result()
        else:
            Timer.active_timers[-1]._notify_child(self)

    def _notify_child(self, child: "Timer"):
        self.children.append(child)

    def _print_result(self, indent: int = 0):
        print(
            "{space}{name:{width}}{duration:8.3f}s".format(
                space=" " * indent,
                name=self.name,
                width=30 - indent,
                duration=self.duration,
            )
        )
        for child in self.children:
            child._print_result(indent=indent + 2)
