"""ROS adapter tests with a stubbed rospy (reference:
ros/src/openvslam/src/run_slam.cc image-topic subscriber)."""

import types

import numpy as np
import pytest

from structure_plp_slam_tpu.config import Config
from structure_plp_slam_tpu.camera import CameraSetup
from structure_plp_slam_tpu.ros import RosNode, _decode_image
from structure_plp_slam_tpu.system import TrackerState
from tests import synthetic_scene
from tests.test_system_e2e import _camera, _orb


class _FakeRospy:
    def __init__(self):
        self.subscriptions = []

    def init_node(self, name):
        self.node_name = name

    def Subscriber(self, topic, msg_type, cb, queue_size=1):
        self.subscriptions.append((topic, cb))
        return ("sub", topic)


def _img_msg(img: np.ndarray):
    msg = types.SimpleNamespace()
    msg.height, msg.width = img.shape
    msg.step = img.shape[1]
    msg.encoding = "mono8"
    msg.data = np.clip(img, 0, 255).astype(np.uint8).tobytes()
    msg.header = "hdr"
    return msg


def test_decode_image_encodings():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert np.allclose(_decode_image(_img_msg(g.astype(np.float32))), g)
    # bgr8: luma of a pure-green image is 0.587 * 200.
    msg = types.SimpleNamespace(height=2, width=3, step=9, encoding="bgr8")
    px = np.zeros((2, 3, 3), np.uint8)
    px[..., 1] = 200
    msg.data = px.tobytes()
    out = _decode_image(msg)
    assert out.shape == (2, 3) and np.allclose(out, 0.587 * 200, atol=0.5)
    msg.encoding = "yuv422"
    with pytest.raises(ValueError):
        _decode_image(msg)


@pytest.mark.slow
def test_ros_node_tracks_and_publishes(rng):
    cam = _camera(CameraSetup.MONOCULAR)
    cfg = Config(camera=cam, orb=_orb(), raw={})
    frames, _ = synthetic_scene.make_sequence(rng, cam, num_frames=8, step=0.08)

    fake = _FakeRospy()
    node = RosNode(
        cfg, image_topic="cam0/raw", rospy_module=fake,
        system_kwargs=dict(max_keyframes=32, max_landmarks=8192,
                           max_kf_interval=3),
    )
    # Bypass sensor_msgs import: the fake subscriber ignores the type.
    node._image_msg_type = lambda: object
    poses = []
    node.start(pose_publish_fn=lambda header, position, orientation:
               poses.append((header, position, orientation)))
    assert fake.node_name == "structure_plp_slam_tpu"
    topic, cb = fake.subscriptions[0]
    assert topic == "cam0/raw"
    for img, _depth, _ts in frames:
        cb(_img_msg(img))
    assert node.system.tracking_state is TrackerState.TRACKING
    assert len(node.track_times) == len(frames)
    assert len(poses) >= 1
    hdr, C, q = poses[-1]
    assert hdr == "hdr"
    assert np.isfinite(C).all() and abs(np.linalg.norm(q) - 1.0) < 1e-5
