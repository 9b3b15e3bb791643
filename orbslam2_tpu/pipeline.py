"""Asynchronous mapping pipeline: the reference's 3-thread runtime, redesigned.

†src/System.cc spawns LocalMapping / LoopClosing threads that poll
mutex-guarded queues (SURVEY §2.2). Here tracking stays on the caller
thread (latency-critical) while two background workers mirror that
topology: a local-mapping worker drains the keyframe queue (culling,
triangulation, fusion, local BA) and hands finished keyframes to a
loop-closing worker (detection, Sim3, correction); global BA runs as a
detached transient task with staged write-back
(loop_closing.launch_global_ba_background — the †RunGlobalBundleAdjustment
thread). The synchronization model is deliberately simpler than the
reference's mutex inventory:

  - the map is fixed-capacity arrays: concurrent element reads/writes cannot
    corrupt structure, only yield slightly stale values to the tracker (the
    same point-in-time semantics the reference's fine-grained locks give);
  - keyframes are published by setting kf_valid last; structural mutation
    happens under one coarse map lock;
  - back-pressure: while the mapping queue is non-empty the tracker only
    inserts urgent keyframes (the SetAcceptKeyFrames handshake,
    †LocalMapping.cc);
  - a keyframe arriving mid-local-BA aborts the solve between LM chunks
    (†LocalMapping::InterruptBA / mbAbortBA).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

from .system import SlamSystem


class AsyncMappingMixin:
    """Adds background mapping + loop-closing workers to SlamSystem."""

    def start_async_mapping(self: "SlamSystem"):
        if getattr(self, "_map_worker", None) is not None:
            return
        self._kf_queue: "queue.Queue[Optional[int]]" = queue.Queue()
        self._loop_queue: "queue.Queue[Optional[int]]" = queue.Queue()
        self._stop_evt = threading.Event()
        self._map_worker = threading.Thread(
            target=self._mapping_loop, name="local-mapping", daemon=True
        )
        self._loop_worker = threading.Thread(
            target=self._loop_closing_loop, name="loop-closing", daemon=True
        )
        self._map_worker.start()
        self._loop_worker.start()
        # tracker back-pressure hook
        self.tracker.mapping_busy = lambda: not self._kf_queue.empty()
        # c1b pacing: the mapper's measured per-keyframe cost
        self.tracker.mapping_kf_cost = (
            lambda: self.local_mapper.kf_proc_ema_s
        )
        # local BA aborts when another keyframe is already waiting
        # (†InterruptBA)
        self.local_mapper.interrupt = lambda: not self._kf_queue.empty()
        # fuse + BA are skipped outright only under real backlog
        self.local_mapper.backlog = lambda: self._kf_queue.qsize() >= 2
        if self.loop_closer is not None:
            self.loop_closer.background_gba = True

    def _mapping_loop(self: "SlamSystem"):
        while not self._stop_evt.is_set():
            try:
                kf = self._kf_queue.get(timeout=0.05)
            except queue.Empty:
                continue
            if kf is None:
                self._loop_queue.put(None)
                break
            try:
                # phases manage the map lock internally: host mutation
                # sections hold it, device round trips (triangulation/fuse
                # kernels, LM chunks) run WITHOUT it, so the tracker's
                # keyframe insertion never waits on device latency
                import time

                t0 = time.perf_counter()
                for phase in self.local_mapper.keyframe_phases(kf):
                    phase()
                self.local_mapper.note_kf_processed(
                    time.perf_counter() - t0
                )
                if self.loop_closer is not None and self.map.kf_valid[kf]:
                    self._loop_queue.put(kf)
            except Exception as e:  # surface, don't kill the worker silently
                import traceback

                print(f"[mapping worker] error on kf {kf}: {e}")
                traceback.print_exc()

    def _loop_closing_loop(self: "SlamSystem"):
        while not self._stop_evt.is_set():
            try:
                kf = self._loop_queue.get(timeout=0.05)
            except queue.Empty:
                continue
            if kf is None:
                break
            try:
                # detection is read-only (stale-tolerant, like tracking
                # reads); only the correction mutates — process_keyframe
                # takes the map lock itself around that phase
                self.loop_closer.process_keyframe(kf)
            except Exception as e:
                import traceback

                print(f"[loop worker] error on kf {kf}: {e}")
                traceback.print_exc()

    def stop_async_mapping(self: "SlamSystem", drain: bool = True):
        if getattr(self, "_map_worker", None) is None:
            return
        if drain:
            import time

            while not (self._kf_queue.empty() and self._loop_queue.empty()):
                time.sleep(0.01)
        self._kf_queue.put(None)
        self._map_worker.join(timeout=10.0)
        self._loop_worker.join(timeout=10.0)
        if self.loop_closer is not None:
            self.loop_closer.wait_global_ba(timeout=60.0)
        self._map_worker = None
        self._loop_worker = None
        self.tracker.mapping_busy = lambda: False
        self.tracker.mapping_kf_cost = lambda: 0.0
        self.local_mapper.interrupt = lambda: False


class AsyncSlamSystem(AsyncMappingMixin, SlamSystem):
    """SlamSystem with mapping + loop closing + GBA off the tracking thread.

    By default tracking is software-pipelined (`pipelined_tracking=True`):
    each call dispatches the current frame's device work and retires the
    oldest in-flight frame(s), so the blocking device->host pull of the
    packed tracking result fully overlaps later frames' uploads. The
    returned pose is the freshest COMMITTED one — it lags the submitted
    frame by between `runtime.pipeline_depth` and
    `runtime.pipeline_depth_max` frames (exact lag of each return in
    `tracker.pose_lag`); after initialization a pose is returned for every
    frame unless tracking is lost. Per-frame (frame_id, timestamp, pose)
    association is exact in `tracker.trajectory` / `save_trajectory_tum`.
    Pass pipelined_tracking=False for synchronous same-frame returns.
    """

    def __init__(self, *args, pipelined_tracking: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self._map_worker = None
        self.pipelined_tracking = pipelined_tracking
        self.start_async_mapping()

    def _track(self, img, timestamp, depth, right_img=None):
        if self.pipelined_tracking:
            pose = self.tracker.track_pipelined(img, timestamp,
                                                depth_map=depth,
                                                right_img=right_img)
        else:
            pose = self.tracker.track(img, timestamp, depth_map=depth,
                                      right_img=right_img)
        if self.tracker.reset_requested:
            # early-loss reset: quiesce the workers against the old map,
            # rebuild, then restart them on the fresh one
            self.stop_async_mapping(drain=False)
            self.reset()
            self.start_async_mapping()
            return pose
        for kf in self._drain_keyframes():
            self._kf_queue.put(kf)
        return pose

    def shutdown(self):
        self.tracker.flush_pipeline()
        for kf in self._drain_keyframes():
            self._kf_queue.put(kf)
        self.stop_async_mapping(drain=True)
        super().shutdown()
