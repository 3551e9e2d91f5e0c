"""One-off: hand-assemble a SECOND frozen bag fixture (VERDICT r4 item 6)
byte-by-byte from the published specs, covering what handmade_v2.bag does
not: a none-compressed chunk, a sensor_msgs/PointCloud2 + nav_msgs/Odometry
pair, and an LZ4 frame whose first block is COMPRESSED (hand-built
sequences with a real back-reference match) rather than stored.

Everything here is transcribed from wiki.ros.org/Bags/Format/2.0, the ROS1
serialization rules (wiki.ros.org/msg), the LZ4 frame spec and the LZ4
block spec — independently of gie_mapping_tpu/runtime/{rosbag,lz4f,
rosbag_writer}.py, so the committed bytes pin the reader to the published
formats, not to a codepath this repo could share with its writer.

Run: python tests/fixtures/make_handmade_pc2_bag.py   (writes
tests/fixtures/handmade_v2_pc2.bag and prints a parse smoke)
"""
import bz2
import os
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


# --- xxh32 (LZ4 frame checksums; transcribed from the xxHash spec) ---------
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
            vs = [v1, v2, v3, v4]
            for k in range(4):
                (lane,) = struct.unpack_from("<I", data, i + 4 * k)
                v = (vs[k] + lane * P2) & M
                vs[k] = (rotl(v, 13) * P1) & M
            v1, v2, v3, v4 = vs
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


assert xxh32(b"") == 0x02CC5D05  # published test vector


# --- LZ4 block format: one sequence with a real match, then the mandatory
# literal-only terminal sequence (block spec end conditions: last 5 bytes
# are literals; a match may not start within the last 12 bytes) -------------
def lz4_compressed_block(data: bytes, lit1: int, off: int, mlen: int) -> bytes:
    assert 4 <= mlen and 1 <= off <= 0xFFFF
    assert data[lit1:lit1 + mlen] == data[lit1 - off:lit1 - off + mlen]
    tail = data[lit1 + mlen:]
    assert len(tail) >= 12, "match must end >= 12 bytes before block end"

    def ext(count: int) -> bytes:
        out = b""
        while count >= 255:
            out += b"\xff"
            count -= 255
        return out + bytes([count])

    lit_tok = min(lit1, 15)
    mt = mlen - 4
    out = bytes([(lit_tok << 4) | min(mt, 15)])
    if lit_tok == 15:
        out += ext(lit1 - 15)
    out += data[:lit1]
    out += struct.pack("<H", off)
    if mt >= 15:
        out += ext(mt - 15)
    lt = min(len(tail), 15)
    out += bytes([lt << 4])
    if lt == 15:
        out += ext(len(tail) - 15)
    out += tail
    return out


# --------------------------------------------------------------- messages --
def ros_header(seq, secs, nsecs, frame_id: bytes) -> bytes:
    return U32(seq) + U32(secs) + U32(nsecs) + rstring(frame_id)


def pc2_fields() -> bytes:
    # x/y/z/intensity float32 (datatype 7), count 1 each, offsets 0/4/8/12
    out = U32(4)
    for i, name in enumerate((b"x", b"y", b"z", b"intensity")):
        out += rstring(name) + U32(4 * i) + bytes([7]) + U32(1)
    return out


def pointcloud2(seq, secs, nsecs, points) -> bytes:
    data = b"".join(F32(*p) for p in points)
    return (ros_header(seq, secs, nsecs, b"velodyne")
            + U32(1) + U32(len(points))          # height, width
            + pc2_fields()
            + bytes([0])                          # is_bigendian
            + U32(16) + U32(16 * len(points))     # point_step, row_step
            + U32(len(data)) + data
            + bytes([1]))                         # is_dense


def odometry(seq, secs, nsecs, pos, qxyzw) -> bytes:
    return (ros_header(seq, secs, nsecs, b"odom")
            + rstring(b"base_link")
            + F64(*pos) + F64(*qxyzw)
            + F64(*([0.0] * 36))
            + F64(0.0, 0.0, 0.0) + F64(0.0, 0.0, 0.0)
            + F64(*([0.0] * 36)))


# ---------------------------------------------------------------- records --
conn_pc = record(
    [(b"op", b"\x07"), (b"conn", U32(0)), (b"topic", b"/velodyne_points")],
    field(b"topic", b"/velodyne_points")
    + field(b"type", b"sensor_msgs/PointCloud2")
    + field(b"md5sum", b"1158d486dd51d683ce2f1be655c3c181")
    + field(b"message_definition", b"PointField[] fields\n"))
conn_odom = record(
    [(b"op", b"\x07"), (b"conn", U32(1)), (b"topic", b"/odom")],
    field(b"topic", b"/odom")
    + field(b"type", b"nav_msgs/Odometry")
    + field(b"md5sum", b"cd5e73d190d741a2f92e81eda573aca7")
    + field(b"message_definition", b"geometry_msgs/PoseWithCovariance pose\n"))

pc_a = pointcloud2(3, 200, 250000000,
                   [(1.0, 2.0, 3.0, 0.5), (-4.0, 0.25, 1.5, 0.125)])
msg_pc_a = record(
    [(b"op", b"\x02"), (b"conn", U32(0)),
     (b"time", U32(200) + U32(250000000))], pc_a)
odo_a = odometry(4, 200, 300000000, (0.5, -1.0, 0.125),
                 (0.0, 0.0, 0.0, 1.0))
msg_odo_a = record(
    [(b"op", b"\x02"), (b"conn", U32(1)),
     (b"time", U32(200) + U32(300000000))], odo_a)

# chunk 1: uncompressed ("none")
inner1 = conn_pc + msg_pc_a
chunk1 = record(
    [(b"op", b"\x05"), (b"compression", b"none"),
     (b"size", U32(len(inner1)))], inner1)

# chunk 2: bz2 (stdlib compressor)
inner2 = conn_odom + msg_odo_a
chunk2 = record(
    [(b"op", b"\x05"), (b"compression", b"bz2"),
     (b"size", U32(len(inner2)))], bz2.compress(inner2))

# chunk 3: LZ4 frame with a COMPRESSED first block.  The second cloud
# repeats its first point, giving a known 16-byte back-reference (offset 16)
# for the hand-built sequence.
pt = (7.0, -8.0, 9.0, 1.0)
pc_b = pointcloud2(5, 201, 0, [pt, pt, (0.0, 0.0, -2.5, 0.0)])
msg_pc_b = record(
    [(b"op", b"\x02"), (b"conn", U32(0)), (b"time", U32(201) + U32(0))], pc_b)
odo_b = odometry(6, 201, 100000000, (2.0, 3.0, 0.0),
                 (0.0, 0.0, 0.7071068, 0.7071068))
msg_odo_b = record(
    [(b"op", b"\x02"), (b"conn", U32(1)),
     (b"time", U32(201) + U32(100000000))], odo_b)
inner3 = msg_pc_b + msg_odo_b

ptbytes = F32(*pt)
i0 = inner3.index(ptbytes)
assert inner3[i0 + 16:i0 + 32] == ptbytes  # the repeated point
blk1 = lz4_compressed_block(inner3[:i0 + 64], lit1=i0 + 16, off=16, mlen=16)
blk2 = inner3[i0 + 64:]  # second block: stored (high bit set)

FLG = 0x64  # version 01, block-independence 1, content-checksum 1
BD = 0x70   # block max size 7 (4 MB)
frame = struct.pack("<I", 0x184D2204) + bytes([FLG, BD])
frame += bytes([(xxh32(bytes([FLG, BD])) >> 8) & 0xFF])
frame += U32(len(blk1)) + blk1                     # compressed block
frame += U32(len(blk2) | 0x80000000) + blk2        # stored block
frame += U32(0)                                    # end mark
frame += U32(xxh32(inner3))                        # content checksum
chunk3 = record(
    [(b"op", b"\x05"), (b"compression", b"lz4"),
     (b"size", U32(len(inner3)))], frame)

# index-data record (op 0x04): readers that stream chunks must skip it
index = record(
    [(b"op", b"\x04"), (b"ver", U32(1)), (b"conn", U32(0)),
     (b"count", U32(1))], U32(200) + U32(250000000) + U32(0))

# bag header record, space-padded to 4096 bytes total per spec
bh_hdr = b"".join(field(n, v) for n, v in
                  [(b"op", b"\x03"), (b"index_pos", U64(0)),
                   (b"conn_count", U32(2)), (b"chunk_count", U32(3))])
pad = 4096 - 4 - len(bh_hdr) - 4
bag_header = U32(len(bh_hdr)) + bh_hdr + U32(pad) + b" " * pad
assert len(bag_header) == 4096

bag = b"#ROSBAG V2.0\n" + bag_header + chunk1 + chunk2 + chunk3 + index

out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "handmade_v2_pc2.bag")
with open(out, "wb") as f:
    f.write(bag)
print(f"wrote {out} ({len(bag)} bytes)")

if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from gie_mapping_tpu.runtime.rosbag import read_bag

    for m in read_bag(out):
        p = m.parse()
        print(m.topic, m.msg_type, m.t, list(p.keys())[:4])
