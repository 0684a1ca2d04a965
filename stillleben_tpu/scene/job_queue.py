"""Multi-threaded physics simulator façade (reference src/job_queue.cpp:30-144,
python/src/py_job_queue.cpp:18-48).

The reference runs one PhysX scene per CPU thread. Here each job's
``simulate_tabletop_scene`` already executes as a single device program, so
the thread pool mainly overlaps host-side prep with device compute; for real
throughput use ``stillleben_tpu.parallel.batch.generate_batch`` (the vmap
path) — this class exists for API compatibility.
"""

from __future__ import annotations

import os
import queue
import threading


class JobQueue:
    def __init__(self, num_threads: int | None = None):
        n = num_threads or max((os.cpu_count() or 2) // 2, 1)
        self._in: queue.Queue = queue.Queue()
        self._out: queue.Queue = queue.Queue()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True) for _ in range(n)
        ]
        for t in self._threads:
            t.start()

    def _worker(self):
        while True:
            scene = self._in.get()
            if scene is None:
                return
            try:
                scene.simulate_tabletop_scene()
                self._out.put(scene)
            except Exception as e:  # pragma: no cover
                self._out.put(e)

    def add_scene(self, scene) -> None:
        """Queue a scene for tabletop simulation."""
        self._in.put(scene)

    def retrieve_scene(self):
        """Block until a simulated scene is available and return it (FIFO)."""
        out = self._out.get()
        if isinstance(out, Exception):
            raise out
        return out

    # reference camelCase aliases
    addScene = add_scene
    retrieveScene = retrieve_scene

    def close(self):
        for _ in self._threads:
            self._in.put(None)
