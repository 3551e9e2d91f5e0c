"""Generate a cow-lady-scale synthetic rosbag and rehearse the replay path.

The real dataset bags (reference README.md:102-145) cannot be downloaded in
this zero-egress container; this script produces a bag with the SAME
structure as launch/cow_dataset.launch's inputs — PointCloud2 frames at
10 Hz on /camera/depth_registered/points + vicon TransformStamped poses at
100 Hz — so the full pipeline is rehearsed end-to-end:

  python examples/make_synthetic_bag.py /tmp/cow_synth.bag --frames 60
  python -m gie_mapping_tpu.runtime.rosbag /tmp/cow_synth.bag \
      /tmp/cow_synth.npz --sensor /camera/depth_registered/points \
      --odom /kinect/vrpn_client/estimated_transform
  python examples/run_case.py cow_lady --replay /tmp/cow_synth.npz

With --run, the convert + replay steps execute in-process after writing.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SENSOR_TOPIC = "/camera/depth_registered/points"
POSE_TOPIC = "/kinect/vrpn_client/estimated_transform"


def make_bag(path, n_frames=60, n_rays=16384, hz=10.0, pose_hz=100.0,
             seed=0, chunk_messages=200, compression="bz2"):
    from gie_mapping_tpu.runtime import rosbag_writer as w
    from gie_mapping_tpu.runtime.datasets import BoxWorld, circular_trajectory
    from gie_mapping_tpu.utils import geometry as geo

    world = BoxWorld.corridor(seed=seed, n_pillars=8, extent=4.0, height=2.5)
    poses = circular_trajectory(n_frames=n_frames, radius=1.5, height=1.2)
    bag = w.BagWriter(chunk_messages=chunk_messages,
                      compression=compression)
    t0 = 1600000000.0
    # vicon poses at pose_hz (linear interpolation between frame poses)
    n_pose = int(n_frames * pose_hz / hz)
    for i in range(n_pose):
        t = t0 + i / pose_hz
        fi = min(int(i * hz / pose_hz), n_frames - 1)
        fj = min(fi + 1, n_frames - 1)
        a = (i * hz / pose_hz) - fi
        pos = (1 - a) * np.asarray(poses[fi].trans) + a * np.asarray(poses[fj].trans)
        quat = geo.rot_to_quat(np.asarray(poses[fi].rot))
        bag.add(POSE_TOPIC, "geometry_msgs/TransformStamped", t,
                w.transform_stamped(t, pos, quat, child_frame="kinect"))
    for i, proj in enumerate(poses):
        t = t0 + i / hz
        pts = world.pointcloud(proj, n_rays=n_rays, max_range=8.0, seed=i)
        bag.add(SENSOR_TOPIC, "sensor_msgs/PointCloud2", t,
                w.pointcloud2(t, pts))
    n = bag.write(path)
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output .bag path")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--compression", default="bz2",
                    choices=("none", "bz2", "lz4"),
                    help="chunk compression (lz4 = pure-python runtime/lz4f)")
    ap.add_argument("--run", action="store_true",
                    help="convert + replay in-process after writing")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    n = make_bag(args.out, n_frames=args.frames, n_rays=args.rays,
                 compression=args.compression)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out}: {n} messages, {size_mb:.1f} MB "
          f"({args.frames} cloud frames @10 Hz + poses @100 Hz)")
    if not args.run:
        print("next:\n  python -m gie_mapping_tpu.runtime.rosbag "
              f"{args.out} {args.out}.npz --sensor {SENSOR_TOPIC} "
              f"--odom {POSE_TOPIC}\n  python examples/run_case.py cow_lady "
              f"--replay {args.out}.npz --frames {args.frames}")
        return

    from gie_mapping_tpu.runtime.rosbag import convert_bag

    npz = args.out + ".npz"
    k = convert_bag(args.out, npz, SENSOR_TOPIC, POSE_TOPIC)
    print(f"converted: {k} frames -> {npz}")
    import subprocess
    run_case = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "run_case.py")
    cmd = [sys.executable, run_case, "cow_lady",
           "--replay", npz, "--frames", str(args.frames)]
    if args.cpu:
        cmd.append("--cpu")
    sys.exit(subprocess.call(cmd))


if __name__ == "__main__":
    main()
