"""Live-camera stream node: the reference's ROS wrappers, redesigned.

The reference ships ROS nodes (†Examples/ROS/ORB_SLAM2/src/ros_mono.cc,
ros_stereo.cc, ros_rgbd.cc — SURVEY §2.1 row 21) that subscribe to image
topics, pair stereo/depth messages with message_filters time sync, and feed
`System::TrackX` from the callback. This image has no ROS, so the equivalent
live surface is a small length-prefixed binary protocol over TCP: a sensor
process (or another machine) streams frames in, the node tracks them on the
TPU, and the tracked pose comes back on the same connection.

Wire format (little-endian), one request per frame:

    u32   magic   0x534C414D ("SLAM")
    u8    kind    1=mono  2=rgbd  3=stereo
    f64   timestamp (seconds)
    u16   height, u16 width
    bytes gray image  (h*w u8)
    rgbd:   bytes depth (h*w u16, millimeters)   — the message_filters
    stereo: bytes right gray (h*w u8)              pairing is implicit: one
                                                   message carries the pair

Response:

    u8    status  0=no pose (initializing/lost)  1=tracked
    u8    state   TrackingState value
    u16   lag     frames the returned pose lags the submitted frame
                  (0 = same frame; with pipelined tracking the freshest
                  committed pose is returned, lag <= pipeline_depth_max)
    16xf32 Tcw row-major (zeros when status=0)

The node runs tracking on the receiving thread (frames must be processed in
arrival order — same discipline as the reference's image callback) with
mapping/loop closing on the AsyncSlamSystem workers. One client at a time
owns the tracker, mirroring the single-subscriber reference nodes; follow-on
connections queue behind the socket accept.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
from typing import Optional, Tuple

import numpy as np

MAGIC = 0x534C414D
KIND_MONO, KIND_RGBD, KIND_STEREO = 1, 2, 3
_HDR = struct.Struct("<IBdHH")
_DEPTH_SCALE = 1000.0  # u16 millimeters on the wire


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-message")
        buf.extend(chunk)
    return bytes(buf)


class _FrameHandler(socketserver.BaseRequestHandler):
    def handle(self):
        srv: "SlamStreamServer" = self.server.node  # type: ignore[attr-defined]
        sock = self.request
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        while not srv._stopping.is_set():
            try:
                hdr = _recv_exact(sock, _HDR.size)
            except (ConnectionError, OSError):
                break
            magic, kind, ts, h, w = _HDR.unpack(hdr)
            if magic != MAGIC:
                break  # protocol desync: drop the connection
            img = np.frombuffer(_recv_exact(sock, h * w), np.uint8).reshape(h, w)
            depth = right = None
            if kind == KIND_RGBD:
                depth = np.frombuffer(
                    _recv_exact(sock, h * w * 2), "<u2"
                ).reshape(h, w).astype(np.float32) / _DEPTH_SCALE
            elif kind == KIND_STEREO:
                right = np.frombuffer(
                    _recv_exact(sock, h * w), np.uint8
                ).reshape(h, w)
            pose = srv._track(kind, img, ts, depth, right)
            state = srv.slam.tracking_state.value
            lag = int(getattr(srv.slam.tracker, "pose_lag", 0))
            if pose is None:
                sock.sendall(struct.pack("<BBH", 0, state, 0) + b"\x00" * 64)
            else:
                sock.sendall(
                    struct.pack("<BBH", 1, state, lag)
                    + np.asarray(pose, np.float32).tobytes()
                )


class SlamStreamServer:
    """Serve a SlamSystem over TCP (the ros_mono/ros_stereo/ros_rgbd analog).

    >>> node = SlamStreamServer(slam, port=0)   # port=0: pick a free port
    >>> node.start(); ...; node.stop()
    """

    def __init__(self, slam, host: str = "127.0.0.1", port: int = 5590):
        self.slam = slam
        self._stopping = threading.Event()
        self._tcp = socketserver.ThreadingTCPServer(
            (host, port), _FrameHandler, bind_and_activate=True
        )
        self._tcp.daemon_threads = True
        self._tcp.node = self  # type: ignore[attr-defined]
        self._thread: Optional[threading.Thread] = None
        self._track_lock = threading.Lock()  # one tracker, arrival order

    @property
    def address(self) -> Tuple[str, int]:
        return self._tcp.server_address  # resolved port when port=0

    def _track(self, kind, img, ts, depth, right):
        with self._track_lock:
            if kind == KIND_RGBD:
                return self.slam.track_rgbd(img, depth, ts)
            if kind == KIND_STEREO:
                return self.slam.track_stereo(img, right, ts)
            return self.slam.track_monocular(img, ts)

    def start(self):
        self._thread = threading.Thread(
            target=self._tcp.serve_forever, name="slam-stream", daemon=True
        )
        self._thread.start()

    def stop(self):
        self._stopping.set()
        self._tcp.shutdown()
        self._tcp.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None


class SlamStreamClient:
    """Feed frames to a SlamStreamServer; the sensor-side helper."""

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        # frames the last returned pose lagged its frame (see module doc)
        self.last_lag = 0

    def _roundtrip(self, kind: int, img: np.ndarray, ts: float,
                   extra: bytes) -> Tuple[Optional[np.ndarray], int]:
        h, w = img.shape
        self.sock.sendall(
            _HDR.pack(MAGIC, kind, ts, h, w)
            + np.ascontiguousarray(img, np.uint8).tobytes() + extra
        )
        resp = _recv_exact(self.sock, 4 + 64)
        status, state, self.last_lag = struct.unpack("<BBH", resp[:4])
        pose = (
            np.frombuffer(resp[4:], np.float32).reshape(4, 4).copy()
            if status else None
        )
        return pose, state

    def track_monocular(self, img, ts):
        return self._roundtrip(KIND_MONO, img, ts, b"")

    def track_rgbd(self, img, depth, ts):
        d = np.clip(
            np.asarray(depth, np.float32) * _DEPTH_SCALE, 0, 65535
        ).astype("<u2")
        return self._roundtrip(KIND_RGBD, img, ts, d.tobytes())

    def track_stereo(self, left, right, ts):
        return self._roundtrip(
            KIND_STEREO, left, ts,
            np.ascontiguousarray(right, np.uint8).tobytes(),
        )

    def close(self):
        self.sock.close()
