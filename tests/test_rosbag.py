"""Pure-python rosbag reader/converter (runtime/rosbag.py).

A minimal bag WRITER lives in this test (the library only reads): it emits
the documented v2.0 container byte-for-byte — magic, bag-header record,
connection records, message records, plain and bz2-compressed chunks — and
ROS1-serialized LaserScan / Odometry / PointCloud2 / Image / CameraInfo
messages, so the reader is validated against independently-constructed
bytes, not its own output.
"""
import bz2
import struct

import numpy as np
import pytest

from gie_mapping_tpu.runtime.rosbag import (
    bag_to_frames,
    convert_bag,
    pointcloud2_xyz,
    read_bag,
    topics,
)
from gie_mapping_tpu.runtime.datasets import load_frames_npz


# ---------------------------------------------------------------------------
# test-local bag writer
# ---------------------------------------------------------------------------

def _hdr(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        f = k.encode() + b"=" + v
        out += struct.pack("<I", len(f)) + f
    return out


def _rec(fields: dict, data: bytes = b"") -> bytes:
    h = _hdr(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _conn_rec(cid: int, topic: str, msg_type: str) -> bytes:
    info = _hdr({"topic": topic.encode(), "type": msg_type.encode(),
                 "md5sum": b"0" * 32, "message_definition": b""})
    return _rec({"op": b"\x07", "conn": struct.pack("<I", cid),
                 "topic": topic.encode()}, info)


def _msg_rec(cid: int, t: float, body: bytes) -> bytes:
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return _rec({"op": b"\x02", "conn": struct.pack("<I", cid),
                 "time": struct.pack("<II", secs, nsecs)}, body)


def _chunk(records: bytes, compression: str = "none") -> bytes:
    payload = records if compression == "none" else bz2.compress(records)
    return _rec({"op": b"\x05", "compression": compression.encode(),
                 "size": struct.pack("<I", len(records))}, payload)


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _ros_header(t: float, frame: str = "map") -> bytes:
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return struct.pack("<III", 7, secs, nsecs) + _string(frame)


def _laserscan(t, ranges, tmin=-np.pi, tinc=2 * np.pi / 360):
    r = np.asarray(ranges, np.float32)
    body = _ros_header(t, "laser")
    body += struct.pack("<7f", tmin, tmin + tinc * (len(r) - 1), tinc,
                        0.0, 0.1, 0.02, 30.0)
    body += struct.pack("<I", len(r)) + r.tobytes()
    body += struct.pack("<I", 0)  # intensities
    return body


def _odometry(t, pos, quat_wxyz):
    w, x, y, z = quat_wxyz
    body = _ros_header(t, "odom") + _string("base")
    body += struct.pack("<3d", *pos) + struct.pack("<4d", x, y, z, w)
    body += struct.pack("<36d", *([0.0] * 36))          # pose covariance
    body += struct.pack("<6d", *([0.0] * 6))            # twist
    body += struct.pack("<36d", *([0.0] * 36))          # twist covariance
    return body


def _pointcloud2(t, xyz, ring=None):
    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1)]
    step = 12
    if ring is not None:
        fields.append(("ring", 12, 4, 1))  # uint16
        step = 14
    body = _ros_header(t, "lidar")
    body += struct.pack("<II", 1, n)  # height, width
    body += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        body += _string(name) + struct.pack("<IBI", off, dt, cnt)
    data = np.zeros((n, step), np.uint8)
    data[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
    if ring is not None:
        data[:, 12:14] = (np.asarray(ring, np.uint16)
                          .view(np.uint8).reshape(n, 2))
    body += struct.pack("<B", 0)                       # is_bigendian
    body += struct.pack("<II", step, step * n)          # point_step, row_step
    body += struct.pack("<I", data.size) + data.tobytes()
    body += struct.pack("<B", 1)                        # is_dense
    return body


def _depth_image(t, depth_m):
    d = np.asarray(depth_m, np.float32)
    body = _ros_header(t, "cam")
    body += struct.pack("<II", d.shape[0], d.shape[1])
    body += _string("32FC1") + struct.pack("<B", 0)
    body += struct.pack("<I", d.shape[1] * 4)
    body += struct.pack("<I", d.nbytes) + d.tobytes()
    return body


def _camera_info(t, fx, fy, cx, cy, h, w):
    body = _ros_header(t, "cam")
    body += struct.pack("<II", h, w) + _string("plumb_bob")
    body += struct.pack("<I", 0)  # D
    K = np.array([fx, 0, cx, 0, fy, cy, 0, 0, 1], np.float64)
    body += K.tobytes()
    body += np.eye(3, dtype=np.float64).tobytes()
    body += np.zeros(12, np.float64).tobytes()
    body += struct.pack("<II", 0, 0)
    body += struct.pack("<IIIIB", 0, 0, 0, 0, 0)
    return body


def _write_bag(path, chunks, conns):
    """chunks: list of (compression, [record bytes]) — conns written first."""
    blob = b"#ROSBAG V2.0\n"
    blob += _rec({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                  "conn_count": struct.pack("<I", len(conns)),
                  "chunk_count": struct.pack("<I", len(chunks))},
                 b"\x20" * 128)
    for comp, recs in chunks:
        body = b"".join(conns) + b"".join(recs)
        conns = []  # connections only needed once, in the first chunk
        blob += _chunk(body, comp)
    path.write_bytes(blob)


# ---------------------------------------------------------------------------


@pytest.fixture
def scan_bag(tmp_path):
    conns = [_conn_rec(0, "/scan", "sensor_msgs/LaserScan"),
             _conn_rec(1, "/odom", "nav_msgs/Odometry")]
    recs_a, recs_b = [], []
    for i in range(4):
        t = 10.0 + i * 0.5
        pos = (0.1 * i, 0.2 * i, 1.0)
        recs = recs_a if i < 2 else recs_b
        recs.append(_msg_rec(1, t, _odometry(t, pos, (1.0, 0, 0, 0))))
        recs.append(_msg_rec(0, t + 0.01,
                             _laserscan(t + 0.01, np.full(360, 1.2))))
    p = tmp_path / "scan.bag"
    # one plain chunk + one bz2 chunk exercises both decoders
    _write_bag(p, [("none", recs_a), ("bz2", recs_b)], conns)
    return p


def test_topics_introspection(scan_bag):
    t = topics(scan_bag)
    assert t["/scan"] == ("sensor_msgs/LaserScan", 4)
    assert t["/odom"] == ("nav_msgs/Odometry", 4)


def test_read_bag_messages(scan_bag):
    msgs = list(read_bag(scan_bag))
    assert len(msgs) == 8
    scan = next(m for m in msgs if m.topic == "/scan").parse()
    assert scan["ranges"].shape == (360,)
    assert np.allclose(scan["ranges"], 1.2)
    assert scan["angle_increment"] == pytest.approx(2 * np.pi / 360)
    odom = next(m for m in msgs if m.topic == "/odom").parse()
    assert odom["quat_wxyz"][0] == pytest.approx(1.0)


def test_bag_to_frames_pairs_nearest_pose(scan_bag):
    frames = bag_to_frames(scan_bag, "/scan", "/odom", slop=0.1)
    assert len(frames) == 4
    for i, fr in enumerate(frames):
        assert fr["position"] == pytest.approx(
            np.array([0.1 * i, 0.2 * i, 1.0], np.float32), abs=1e-6)
        assert "ranges" in fr and fr["ranges"].shape == (360,)
    # slop smaller than the 10 ms stamp offset pairs nothing
    assert bag_to_frames(scan_bag, "/scan", "/odom", slop=0.001) == []


def test_convert_scan_bag_and_replay(scan_bag, tmp_path):
    out = tmp_path / "frames.npz"
    n = convert_bag(scan_bag, out, "/scan", "/odom")
    assert n == 4
    frames = load_frames_npz(out)
    assert len(frames) == 4 and "ranges" in frames[0]

    # drive the real scan2D pipeline from the converted frames
    from gie_mapping_tpu.models.mapper import VolumetricMapper
    from gie_mapping_tpu.utils import geometry as geo
    from gie_mapping_tpu.utils.config import scan2d_config

    cfg = scan2d_config(local_size_m=(3.2, 3.2, 1.6), voxel_width=0.2,
                        max_blocks=512, for_motion_planner=False)
    mapper = VolumetricMapper(cfg)
    for fr in frames[:2]:
        proj = geo.Projection.from_pose(fr["position"], fr["quat_wxyz"])
        out_fr = mapper.process_scan2d(proj, fr["ranges"],
                                       float(fr["theta_min"]),
                                       float(fr["theta_inc"]))
    assert int((out_fr.glb_type == 2).sum()) > 0


def test_pointcloud2_with_ring_converts_to_rings(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-4, 4, (256, 3)).astype(np.float32)
    ring = rng.integers(0, 16, 256)
    conns = [_conn_rec(0, "/velodyne", "sensor_msgs/PointCloud2"),
             _conn_rec(1, "/odom", "nav_msgs/Odometry")]
    recs = [_msg_rec(1, 5.0, _odometry(5.0, (0, 0, 0), (1, 0, 0, 0))),
            _msg_rec(0, 5.0, _pointcloud2(5.0, xyz, ring))]
    p = tmp_path / "vlp.bag"
    _write_bag(p, [("none", recs)], conns)

    msg = next(m for m in read_bag(p) if m.topic == "/velodyne").parse()
    pts, rg = pointcloud2_xyz(msg, ring_field="ring")
    assert np.allclose(pts, xyz, atol=1e-6)
    assert np.array_equal(rg, ring)

    out = tmp_path / "vlp.npz"
    n = convert_bag(p, out, "/velodyne", "/odom", ring_field="ring")
    assert n == 1
    fr = load_frames_npz(out)[0]
    assert fr["rings"].shape == (16, 360)
    assert "phi_min" in fr and "theta_inc" in fr


def test_depth_image_with_camera_info(tmp_path):
    depth = np.full((8, 12), 2.5, np.float32)
    conns = [_conn_rec(0, "/depth", "sensor_msgs/Image"),
             _conn_rec(1, "/odom", "nav_msgs/Odometry"),
             _conn_rec(2, "/cam_info", "sensor_msgs/CameraInfo")]
    recs = [_msg_rec(2, 4.9, _camera_info(4.9, 100.0, 110.0, 6.0, 4.0, 8, 12)),
            _msg_rec(1, 5.0, _odometry(5.0, (1, 2, 3), (1, 0, 0, 0))),
            _msg_rec(0, 5.0, _depth_image(5.0, depth))]
    p = tmp_path / "depth.bag"
    _write_bag(p, [("bz2", recs)], conns)

    frames = bag_to_frames(p, "/depth", "/odom",
                           camera_info_topic="/cam_info")
    assert len(frames) == 1
    fr = frames[0]
    assert fr["depth"].shape == (8, 12)
    assert fr["depth"][0, 0] == pytest.approx(2.5)
    assert (fr["fx"], fr["fy"], fr["cx"], fr["cy"]) == (100.0, 110.0, 6.0, 4.0)


def test_extrinsic_applied(scan_bag):
    # body->sensor: +1 m in body x
    T = np.eye(4)
    T[0, 3] = 1.0
    frames = bag_to_frames(scan_bag, "/scan", "/odom", extrinsic=T)
    assert frames[0]["position"] == pytest.approx(
        np.array([1.0, 0.0, 1.0], np.float32), abs=1e-6)


def test_handmade_frozen_fixture():
    """Frozen byte-level fixture (VERDICT r3 item 7): a bag assembled
    field-by-field from the published v2.0 container spec + LZ4 frame spec
    by tests/fixtures/make_handmade_bag.py, committed as BYTES so the reader
    is pinned to an independently-assembled artifact — not to any codepath
    shared with this repo's writer.  Covers: 4096-byte padded bag-header
    record, a bz2 chunk (stdlib compressor), and a HAND-BUILT LZ4 frame
    (stored blocks split mid-record, header + content xxh32 checksums)."""
    import os

    bag = os.path.join(os.path.dirname(__file__), "fixtures",
                       "handmade_v2.bag")
    msgs = list(read_bag(bag))
    assert [(m.topic, m.msg_type, m.t) for m in msgs] == [
        ("/scan", "sensor_msgs/LaserScan", 100.5),
        ("/odom", "nav_msgs/Odometry", 101.0),
    ]
    scan = msgs[0].parse()
    assert scan["header"]["seq"] == 7
    assert scan["header"]["frame_id"] == "laser"
    assert scan["header"]["stamp"] == pytest.approx(100.5)
    assert scan["angle_min"] == pytest.approx(-1.5707964)
    assert scan["range_max"] == pytest.approx(10.0)
    np.testing.assert_array_equal(
        scan["ranges"],
        np.array([1.0, 2.5, np.inf, 0.5, 3.25], np.float32))
    assert scan["intensities"].size == 0
    odom = msgs[1].parse()
    assert odom["child_frame_id"] == "base"
    np.testing.assert_allclose(
        odom["position"], np.array([1.5, -2.0, 0.25], np.float32))
    np.testing.assert_allclose(
        odom["quat_wxyz"],
        np.array([0.7071068, 0.0, 0.0, 0.7071068], np.float32))


def test_handmade_pc2_fixture():
    """Second frozen byte-level fixture (VERDICT r4 item 6): a PointCloud2 +
    Odometry pair across none + bz2 + lz4 chunks, where the LZ4 frame's
    first block is COMPRESSED — hand-built literal/match sequences from the
    LZ4 block spec (tests/fixtures/make_handmade_pc2_bag.py), so the pure-
    python block decoder (runtime/lz4f.py) is pinned to independently-
    authored sequence bytes, not to its own compressor's output.  Also
    covers: a trailing index-data record (op 0x04, must be skipped) and the
    4096-byte space-padded bag header."""
    import os

    bag = os.path.join(os.path.dirname(__file__), "fixtures",
                       "handmade_v2_pc2.bag")
    msgs = list(read_bag(bag))
    assert [(m.topic, m.msg_type, round(m.t, 3)) for m in msgs] == [
        ("/velodyne_points", "sensor_msgs/PointCloud2", 200.25),
        ("/odom", "nav_msgs/Odometry", 200.3),
        ("/velodyne_points", "sensor_msgs/PointCloud2", 201.0),
        ("/odom", "nav_msgs/Odometry", 201.1),
    ]
    pc_a = msgs[0].parse()
    assert pc_a["header"]["seq"] == 3
    assert pc_a["header"]["frame_id"] == "velodyne"
    assert (pc_a["height"], pc_a["width"]) == (1, 2)
    assert [f["name"] for f in pc_a["fields"]] == ["x", "y", "z", "intensity"]
    assert pc_a["point_step"] == 16 and pc_a["is_dense"] == 1
    xyz, ring = pointcloud2_xyz(pc_a)
    np.testing.assert_allclose(
        xyz, np.array([[1.0, 2.0, 3.0], [-4.0, 0.25, 1.5]], np.float32))
    assert ring is None

    odo_a = msgs[1].parse()
    assert odo_a["child_frame_id"] == "base_link"
    np.testing.assert_allclose(
        odo_a["position"], np.array([0.5, -1.0, 0.125], np.float32))
    np.testing.assert_allclose(
        odo_a["quat_wxyz"], np.array([1.0, 0.0, 0.0, 0.0], np.float32))

    # the lz4 chunk's messages: first cloud repeats its first point — the
    # hand-encoded back-reference the compressed block exercises
    pc_b = msgs[2].parse()
    xyz_b, _ = pointcloud2_xyz(pc_b)
    np.testing.assert_allclose(
        xyz_b, np.array([[7.0, -8.0, 9.0], [7.0, -8.0, 9.0],
                         [0.0, 0.0, -2.5]], np.float32))
    odo_b = msgs[3].parse()
    np.testing.assert_allclose(
        odo_b["position"], np.array([2.0, 3.0, 0.0], np.float32))
    np.testing.assert_allclose(
        odo_b["quat_wxyz"],
        np.array([0.7071068, 0.0, 0.0, 0.7071068], np.float32))


def test_rot_quat_roundtrip():
    from gie_mapping_tpu.utils import geometry as geo

    rng = np.random.default_rng(3)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = geo.quat_to_rot(*q)
        q2 = geo.rot_to_quat(R)
        if np.dot(q2, q) < 0:
            q2 = -q2
        assert np.allclose(q2, q, atol=1e-5)
