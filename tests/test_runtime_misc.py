"""Runtime helpers: message sync, CSV logger, npz frame replay."""
import numpy as np

from gie_mapping_tpu.runtime.datasets import load_frames_npz, save_frames_npz
from gie_mapping_tpu.runtime.logger import CsvLogger
from gie_mapping_tpu.runtime.sync import ApproximateTimeSync, MsgMgr


def test_approximate_time_sync():
    s = ApproximateTimeSync(slop=0.05)
    for t in (0.0, 0.1, 0.2, 0.3):
        s.push_odom(t, f"pose@{t}")
    assert s.match(0.21)[1] == "pose@0.2"
    assert s.match(0.26)[0] == 0.3
    assert s.match(0.9) is None  # beyond slop
    assert ApproximateTimeSync().match(1.0) is None  # empty queue


def test_sync_queue_bound():
    s = ApproximateTimeSync(queue_size=5)
    for t in range(10):
        s.push_odom(float(t), t)
    assert len(s._odom_t) == 5
    assert s.match(9.0)[1] == 9


def test_msg_mgr_gate():
    m = MsgMgr()
    assert not m.is_ready
    m.offer("frame1")
    assert m.is_ready
    assert m.take() == "frame1"
    assert not m.is_ready


def test_csv_logger_schema():
    log = CsvLogger()
    log.log_rmse(0.125)
    log.log_frame(1.5, 2.5, log.take_pending_rmse())
    log.log_frame(1.0, 2.0, log.take_pending_rmse())
    lines = log.getvalue().strip().splitlines()
    assert lines[0] == ("Occupancy time,EDT time,RMSE,arch dropped,"
                        "stream leftover")
    assert lines[1].split(",")[2] == "0.125000"
    assert lines[2].split(",")[2] == "-1.000000"  # consumed, resets


def test_npz_frame_roundtrip(tmp_path, rng):
    frames = [
        {"position": rng.normal(size=3).astype(np.float32),
         "quat_wxyz": np.asarray([1, 0, 0, 0], np.float32),
         "ranges": rng.random(90).astype(np.float32),
         "theta_min": np.float32(-np.pi), "theta_inc": np.float32(0.07)},
        {"position": np.zeros(3, np.float32),
         "quat_wxyz": np.asarray([1, 0, 0, 0], np.float32),
         "points": rng.normal(size=(100, 3)).astype(np.float32)},
    ]
    p = str(tmp_path / "frames.npz")
    save_frames_npz(p, frames)
    back = load_frames_npz(p)
    assert len(back) == 2
    np.testing.assert_array_equal(back[0]["ranges"], frames[0]["ranges"])
    np.testing.assert_array_equal(back[1]["points"], frames[1]["points"])
