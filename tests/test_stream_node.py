"""Live-camera TCP node (the ROS ros_mono/ros_rgbd wrapper analog): frames
stream in over a socket, tracked poses come back, trajectories accumulate in
the server-side SlamSystem exactly as with direct API calls."""

import numpy as np

from orbslam2_tpu.config import CameraConfig, ExtractorConfig, SlamConfig
from orbslam2_tpu.pipeline import AsyncSlamSystem
from orbslam2_tpu.utils.stream_node import SlamStreamClient, SlamStreamServer
from orbslam2_tpu.utils.synthetic import render_sequence

K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]], np.float32)


def _cfg():
    return SlamConfig(
        sensor="rgbd",
        camera=CameraConfig(fx=260, fy=260, cx=160, cy=120, width=320,
                            height=240, bf=26.0, fps=30),
        extractor=ExtractorConfig(n_features=500, n_levels=4),
    )


def test_rgbd_stream_roundtrip():
    frames, poses = render_sequence(16, K, width=320, height=240,
                                    with_depth=True)
    slam = AsyncSlamSystem(_cfg())
    node = SlamStreamServer(slam, port=0)
    node.start()
    try:
        client = SlamStreamClient(*node.address, timeout=60.0)
        tracked = 0
        for i, (img, depth) in enumerate(frames):
            pose, state = client.track_rgbd(img, depth, i / 30.0)
            if pose is not None:
                assert pose.shape == (4, 4)
                assert np.isfinite(pose).all()
                # live-pose contract: the returned pose lags the submitted
                # frame by at most the elastic pipeline bound
                assert client.last_lag <= 10, client.last_lag
                tracked += 1
        client.close()
        # live-pose contract: every frame after initialization gets a pose
        # (the freshest committed one), even while the elastic pipelined
        # queue is stretched
        assert tracked >= len(frames) - 1, tracked
    finally:
        node.stop()
        slam.shutdown()
    # server-side trajectory matches what streamed in
    assert len(slam.tracker.trajectory) >= len(frames) - 1
    assert len(slam.map.valid_keyframes()) >= 1


def test_protocol_rejects_bad_magic():
    import socket
    import struct

    slam = AsyncSlamSystem(_cfg())
    node = SlamStreamServer(slam, port=0)
    node.start()
    try:
        s = socket.create_connection(node.address, timeout=10)
        s.sendall(struct.pack("<IBdHH", 0xDEAD, 1, 0.0, 4, 4) + b"\x00" * 16)
        # server drops the connection instead of tracking garbage
        s.settimeout(10)
        assert s.recv(1) == b""
        s.close()
    finally:
        node.stop()
        slam.shutdown()
