"""One-off: hand-assemble a ROS1 v2.0 bag byte-by-byte from the published
container spec (wiki.ros.org/Bags/Format/2.0) + the LZ4 frame spec.
Emits base64 for embedding as a frozen fixture in tests/test_rosbag.py."""
import base64
import bz2
import struct

U32 = lambda v: struct.pack("<I", v)
U64 = lambda v: struct.pack("<Q", v)
F32 = lambda *v: struct.pack("<%df" % len(v), *v)
F64 = lambda *v: struct.pack("<%dd" % len(v), *v)


def field(name: bytes, value: bytes) -> bytes:
    body = name + b"=" + value
    return U32(len(body)) + body


def record(fields: list, data: bytes) -> bytes:
    hdr = b"".join(field(n, v) for n, v in fields)
    return U32(len(hdr)) + hdr + U32(len(data)) + data


def rstring(s: bytes) -> bytes:
    return U32(len(s)) + s


# --- xxh32 (LZ4 frame checksums; algorithm from the published xxHash spec) --
P1, P2, P3, P4, P5 = (2654435761, 2246822519, 3266489917, 668265263,
                      374761393)
M = 0xFFFFFFFF
rotl = lambda x, r: ((x << r) | (x >> (32 - r))) & M


def xxh32(data: bytes, seed: int = 0) -> int:
    i, n = 0, len(data)
    if n >= 16:
        v1, v2, v3, v4 = ((seed + P1 + P2) & M, (seed + P2) & M, seed,
                          (seed - P1) & M)
        while i + 16 <= n:
            for k, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<I", data, i + 4 * k)
                v = (v + lane * P2) & M
                v = (rotl(v, 13) * P1) & M
                if k == 0: v1 = v
                elif k == 1: v2 = v
                elif k == 2: v3 = v
                else: v4 = v
            i += 16
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, i)
        h = (h + lane * P3) & M
        h = (rotl(h, 17) * P4) & M
        i += 4
    while i < n:
        h = (h + data[i] * P5) & M
        h = (rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 15
    h = (h * P2) & M
    h ^= h >> 13
    h = (h * P3) & M
    h ^= h >> 16
    return h


# sanity: published xxh32 test vectors
assert xxh32(b"") == 0x02CC5D05
assert xxh32(b"Hello World") == 0xB1FD16EE, hex(xxh32(b"Hello World"))

# --------------------------------------------------------------- messages --
def ros_header(seq, secs, nsecs, frame_id: bytes) -> bytes:
    return U32(seq) + U32(secs) + U32(nsecs) + rstring(frame_id)


laserscan = (
    ros_header(7, 100, 500000000, b"laser")
    + F32(-1.5707964, 1.5707964, 0.7853982, 0.0, 0.1, 0.2, 10.0)
    + U32(5) + F32(1.0, 2.5, float("inf"), 0.5, 3.25)      # ranges
    + U32(0)                                                # intensities
)

odometry = (
    ros_header(8, 101, 0, b"odom")
    + rstring(b"base")
    + F64(1.5, -2.0, 0.25)                  # pose.position
    + F64(0.0, 0.0, 0.7071068, 0.7071068)   # orientation x y z w
    + F64(*([0.0] * 36))                    # pose covariance
    + F64(0.0, 0.0, 0.0) + F64(0.0, 0.0, 0.0)  # twist linear/angular
    + F64(*([0.0] * 36))                    # twist covariance
)

# ---------------------------------------------------------------- records --
conn_scan = record(
    [(b"op", b"\x07"), (b"conn", U32(0)), (b"topic", b"/scan")],
    field(b"topic", b"/scan")
    + field(b"type", b"sensor_msgs/LaserScan")
    + field(b"md5sum", b"90c7ef2dc6895d81024acba2ac42f369")
    + field(b"message_definition", b"float32[] ranges\n"))
msg_scan = record(
    [(b"op", b"\x02"), (b"conn", U32(0)),
     (b"time", U32(100) + U32(500000000))], laserscan)
inner1 = conn_scan + msg_scan

conn_odom = record(
    [(b"op", b"\x07"), (b"conn", U32(1)), (b"topic", b"/odom")],
    field(b"topic", b"/odom")
    + field(b"type", b"nav_msgs/Odometry")
    + field(b"md5sum", b"cd5e73d190d741a2f92e81eda573aca7")
    + field(b"message_definition", b"geometry_msgs/PoseWithCovariance pose\n"))
msg_odom = record(
    [(b"op", b"\x02"), (b"conn", U32(1)), (b"time", U32(101) + U32(0))],
    odometry)
inner2 = conn_odom + msg_odom

# chunk 1: bz2 (stdlib compressor = independent of the repo's codecs)
chunk1 = record(
    [(b"op", b"\x05"), (b"compression", b"bz2"),
     (b"size", U32(len(inner1)))], bz2.compress(inner1))

# chunk 2: LZ4 frame, hand-assembled: magic, FLG(v1, indep, content-chksum),
# BD(4MB), header checksum, TWO stored blocks split mid-record, end mark,
# content checksum
FLG = 0x64  # 01 1 0 0 1 0 0
BD = 0x70
split = len(inner2) // 2
frame = struct.pack("<I", 0x184D2204) + bytes([FLG, BD])
frame += bytes([(xxh32(bytes([FLG, BD])) >> 8) & 0xFF])
for blk in (inner2[:split], inner2[split:]):
    frame += U32(len(blk) | 0x80000000) + blk
frame += U32(0)
frame += U32(xxh32(inner2))
chunk2 = record(
    [(b"op", b"\x05"), (b"compression", b"lz4"),
     (b"size", U32(len(inner2)))], frame)

# bag header record: padded to 4096 bytes total with ASCII spaces per spec
bh_fields = [(b"op", b"\x03"), (b"index_pos", U64(0)),
             (b"conn_count", U32(2)), (b"chunk_count", U32(2))]
bh_hdr = b"".join(field(n, v) for n, v in bh_fields)
pad = 4096 - 4 - len(bh_hdr) - 4
bag_header = U32(len(bh_hdr)) + bh_hdr + U32(pad) + b" " * pad
assert len(bag_header) == 4096

bag = b"#ROSBAG V2.0\n" + bag_header + chunk1 + chunk2
print(len(bag))
b64 = base64.b64encode(bag).decode()
with open("/tmp/fixture_b64.txt", "w") as f:
    for i in range(0, len(b64), 72):
        f.write(b64[i:i + 72] + "\n")
print("wrote /tmp/fixture_b64.txt")

# smoke: run the repo reader over it
import sys
sys.path.insert(0, "/root/repo")
with open("/tmp/handmade.bag", "wb") as f:
    f.write(bag)
from gie_mapping_tpu.runtime.rosbag import read_bag
for m in read_bag("/tmp/handmade.bag"):
    p = m.parse()
    print(m.topic, m.msg_type, m.t, list(p.keys())[:4])
