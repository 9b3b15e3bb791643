"""Asynchronous mapping pipeline: the reference's 3-thread runtime, redesigned.

†src/System.cc spawns LocalMapping / LoopClosing threads that poll
mutex-guarded queues (SURVEY §2.2). Here tracking stays on the caller
thread (latency-critical) while one background worker drains a keyframe
queue through local mapping + loop closing (throughput-oriented). The
synchronization model is deliberately simpler than the reference's mutex
inventory:

  - the map is fixed-capacity arrays: concurrent element reads/writes cannot
    corrupt structure, only yield slightly stale values to the tracker (the
    same point-in-time semantics the reference's fine-grained locks give);
  - keyframes are published by setting kf_valid last;
  - back-pressure: while the queue is non-empty the tracker only inserts
    urgent keyframes (the SetAcceptKeyFrames handshake, †LocalMapping.cc).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

from .system import SlamSystem


class AsyncMappingMixin:
    """Adds a background mapping worker to SlamSystem."""

    def start_async_mapping(self: "SlamSystem"):
        if getattr(self, "_worker", None) is not None:
            return
        self._kf_queue: "queue.Queue[Optional[int]]" = queue.Queue()
        self._stop_evt = threading.Event()
        self._worker = threading.Thread(
            target=self._mapping_loop, name="local-mapping", daemon=True
        )
        self._worker.start()
        # tracker back-pressure hook
        self.tracker.mapping_busy = lambda: not self._kf_queue.empty()

    def _mapping_loop(self: "SlamSystem"):
        while not self._stop_evt.is_set():
            try:
                kf = self._kf_queue.get(timeout=0.05)
            except queue.Empty:
                continue
            if kf is None:
                break
            try:
                with self.map.lock:
                    self.local_mapper.process_keyframe(kf)
                    if self.loop_closer is not None and self.map.kf_valid[kf]:
                        self.loop_closer.process_keyframe(kf)
            except Exception as e:  # surface, don't kill the worker silently
                import traceback

                print(f"[mapping worker] error on kf {kf}: {e}")
                traceback.print_exc()

    def stop_async_mapping(self: "SlamSystem", drain: bool = True):
        if getattr(self, "_worker", None) is None:
            return
        if drain:
            import time

            while not self._kf_queue.empty():
                time.sleep(0.01)
        self._kf_queue.put(None)
        self._worker.join(timeout=5.0)
        self._worker = None
        self.tracker.mapping_busy = lambda: False


class AsyncSlamSystem(AsyncMappingMixin, SlamSystem):
    """SlamSystem with local mapping + loop closing off the tracking thread."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._worker = None
        self.start_async_mapping()

    def _track(self, img, timestamp, depth, right_img=None):
        pose = self.tracker.track(img, timestamp, depth_map=depth,
                                  right_img=right_img)
        kf = getattr(self.tracker, "pending_keyframe", None)
        if kf is not None and not self.localization_only:
            self._kf_queue.put(kf)
            self.tracker.pending_keyframe = None
        return pose

    def shutdown(self):
        self.stop_async_mapping(drain=True)
        super().shutdown()
