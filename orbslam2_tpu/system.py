"""SlamSystem facade — the public API (†src/System.cc, SURVEY §7.4).

Mirrors the reference's System class: track_monocular / track_stereo /
track_rgbd, localization-only mode, reset, shutdown, trajectory saving in TUM
and KITTI formats. Construction wires the map, tracker, and local mapper;
the reference's three threads become pipeline stages invoked in order (the
async scheduling lives above this layer).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .config import SlamConfig
from .local_mapping import LocalMapper
from .map.state import MapState
from .ops import geometry as geo
from .tracking import Tracker, TrackingState


class SlamSystem:
    def __init__(self, cfg: SlamConfig, enable_loop_closing: bool = True,
                 metrics_path: Optional[str] = None):
        self.cfg = cfg
        self.map = MapState.allocate(cfg)
        from .map.keyframe_database import KeyFrameDatabase
        from .loop_closing import LoopCloser

        self.kfdb = KeyFrameDatabase(self.map)
        self.tracker = Tracker(cfg, self.map, kfdb=self.kfdb)
        self.local_mapper = LocalMapper(cfg, self.map, self.tracker.cam)
        self.loop_closer = LoopCloser(cfg, self.map, self.tracker.cam, self.kfdb) \
            if enable_loop_closing else None
        if self.loop_closer is not None:  # else nothing consumes the futures
            self.local_mapper.bow_precompute = self.kfdb.precompute_async
        self.localization_only = False
        self._finished = False
        if metrics_path:
            from .utils.telemetry import MetricsLog

            self.tracker.metrics_log = MetricsLog(metrics_path)

    def warmup(self, verbose: bool = False) -> float:
        """Pre-trace + pre-load every hot device program (see warmup.py).
        Call once before the frame loop; returns elapsed seconds."""
        from .warmup import warmup_system

        return warmup_system(self, verbose=verbose)

    def render_snapshot(self, path: str, title: str = ""):
        """Export a top-down map/trajectory PNG (the viewer replacement)."""
        from .utils.telemetry import render_map_snapshot

        traj = np.stack(
            [np.linalg.inv(T)[:3, 3] for _, _, T in self.tracker.trajectory]
        ) if self.tracker.trajectory else None
        render_map_snapshot(self.map, path, trajectory=traj, title=title)

    # ------------------------------------------------------------------
    # Tracking entry points
    # ------------------------------------------------------------------
    def track_monocular(self, img: np.ndarray, timestamp: float) -> Optional[np.ndarray]:
        assert self.cfg.sensor == "monocular"
        return self._track(img, timestamp, None)

    def track_rgbd(self, img: np.ndarray, depth: np.ndarray,
                   timestamp: float) -> Optional[np.ndarray]:
        assert self.cfg.sensor == "rgbd"
        return self._track(img, timestamp, depth)

    def track_stereo(self, left: np.ndarray, right: np.ndarray,
                     timestamp: float) -> Optional[np.ndarray]:
        assert self.cfg.sensor == "stereo"
        return self._track(left, timestamp, None, right_img=right)

    def _track(self, img, timestamp, depth, right_img=None):
        pose = self.tracker.track(img, timestamp, depth_map=depth,
                                  right_img=right_img)
        if self.tracker.reset_requested:
            # lost within ~5 keyframes of init: the bootstrap map is junk
            # (†Tracking "Track lost soon after initialisation, reseting...")
            self.reset()
            return pose
        for kf in self._drain_keyframes():
            self.local_mapper.process_keyframe(kf)
            if self.loop_closer is not None and self.map.kf_valid[kf]:
                self.loop_closer.process_keyframe(kf)
        return pose

    def _drain_keyframes(self):
        kfs = self.tracker.pending_keyframes
        if kfs and not self.localization_only:
            self.tracker.pending_keyframes = []
            return kfs
        kfs.clear()
        return ()

    # ------------------------------------------------------------------
    # Modes / lifecycle (†System::ActivateLocalizationMode / Reset / Shutdown)
    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        self.localization_only = True
        self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False
        self.tracker.localization_only = False

    @property
    def tracking_state(self) -> TrackingState:
        return self.tracker.state

    def reset(self):
        from .map.keyframe_database import KeyFrameDatabase
        from .loop_closing import LoopCloser

        enable_lc = self.loop_closer is not None
        self.map = MapState.allocate(self.cfg)
        self.kfdb = KeyFrameDatabase(self.map)
        self.tracker = Tracker(self.cfg, self.map, kfdb=self.kfdb)
        self.local_mapper = LocalMapper(self.cfg, self.map, self.tracker.cam)
        self.loop_closer = LoopCloser(
            self.cfg, self.map, self.tracker.cam, self.kfdb
        ) if enable_lc else None
        if self.loop_closer is not None:
            self.local_mapper.bow_precompute = self.kfdb.precompute_async

    def shutdown(self):
        self._finished = True

    # ------------------------------------------------------------------
    # Trajectory export (†System::SaveTrajectoryTUM / SaveTrajectoryKITTI /
    # SaveKeyFrameTrajectoryTUM)
    # ------------------------------------------------------------------
    def trajectory(self) -> List[Tuple[int, float, np.ndarray]]:
        return self.tracker.trajectory

    def keyframe_trajectory(self) -> List[Tuple[float, np.ndarray]]:
        m = self.map
        out = []
        for k in m.valid_keyframes():
            out.append((float(m.kf_timestamp[k]), m.kf_pose[k].copy()))
        return out

    def save_trajectory_tum(self, path: str):
        """timestamp tx ty tz qx qy qz qw (camera-to-world), TUM format."""
        import jax.numpy as jnp

        with open(path, "w") as f:
            for _, ts, Tcw in self.tracker.trajectory:
                Twc = np.linalg.inv(Tcw)
                q = np.asarray(geo.rotmat_to_quat(jnp.asarray(Twc[:3, :3])))
                t = Twc[:3, 3]
                f.write(
                    f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
                )

    def save_keyframe_trajectory_tum(self, path: str):
        import jax.numpy as jnp

        with open(path, "w") as f:
            for ts, Tcw in self.keyframe_trajectory():
                Twc = np.linalg.inv(Tcw)
                q = np.asarray(geo.rotmat_to_quat(jnp.asarray(Twc[:3, :3])))
                t = Twc[:3, 3]
                f.write(
                    f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
                )

    # ------------------------------------------------------------------
    # Map persistence (capability the reference lacks — SURVEY §5.4)
    # ------------------------------------------------------------------
    def save_map(self, path: str):
        from .utils.checkpoint import save_map

        save_map(path, self.map, self.kfdb)

    def load_map(self, path: str, localization_only: bool = True):
        """Load a saved map; by default enter localization-only mode with
        tracking set LOST so the next frame relocalizes against it."""
        from .utils.checkpoint import load_map
        from .tracking import TrackingState

        self.map = load_map(path, self.cfg, self.kfdb)
        self.tracker.map = self.map
        self.local_mapper.map = self.map
        if self.loop_closer is not None:
            self.loop_closer.map = self.map
        self.kfdb.map = self.map
        if localization_only:
            self.activate_localization_mode()
        self.tracker.state = TrackingState.LOST
        self.tracker.ref_kf = int(self.map.valid_keyframes()[0]) if len(
            self.map.valid_keyframes()
        ) else -1

    def save_trajectory_kitti(self, path: str):
        """Row-major 3x4 Twc per line (KITTI format)."""
        with open(path, "w") as f:
            for _, _, Tcw in self.tracker.trajectory:
                Twc = np.linalg.inv(Tcw)
                row = Twc[:3, :4].reshape(-1)
                f.write(" ".join(f"{v:.9e}" for v in row) + "\n")
