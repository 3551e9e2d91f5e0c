"""LZ4 bag chunks + malformed-bag fuzz (VERDICT r2 item 6).

The reference's dataset bags arrive lz4-chunked as often as bz2 (roslz4 is
rosbag's default tool compression); this environment has no `lz4` wheel, so
runtime/lz4f.py implements the published LZ4 frame/block formats in pure
python.  These tests pin:

* the xxHash32 primitive against published vectors,
* block/frame roundtrips incl. stored-block frames and a hand-built
  compressed block (reader validated against independently-constructed
  bytes, not its own compressor),
* lz4-chunked bags end-to-end through read_bag/bag_to_frames,
* clean ValueError diagnostics on malformed bags: truncated records,
  truncated chunks, unknown compression, messages referencing unknown
  connections (rosbag v1 spec; runtime/rosbag.py).
"""
import struct

import numpy as np
import pytest

from gie_mapping_tpu.runtime import lz4f
from gie_mapping_tpu.runtime.rosbag import bag_to_frames, read_bag
from gie_mapping_tpu.runtime.rosbag_writer import (
    BagWriter,
    chunk_record,
    conn_record,
    laserscan,
    msg_record,
    odometry,
)

# ---------------------------------------------------------------------------
# lz4f codec
# ---------------------------------------------------------------------------


def test_xxh32_published_vectors():
    assert lz4f.xxh32(b"") == 0x02CC5D05
    assert lz4f.xxh32(b"a") == 0x550D7456
    assert lz4f.xxh32(b"abc") == 0x32D153FF
    assert lz4f.xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F
    assert lz4f.xxh32(b"", seed=1) == 0x0B2CB792


@pytest.mark.parametrize("stored", [False, True])
def test_frame_roundtrip(stored):
    rng = np.random.default_rng(7)
    for data in (b"", b"x", b"hello world " * 400,
                 rng.integers(0, 256, 3000, dtype=np.uint8).tobytes(),
                 b"\x00" * 70000):
        frame = lz4f.compress(data, block_size=1 << 14,
                              store_uncompressed=stored)
        assert lz4f.decompress(frame) == data


def test_compressed_block_smaller():
    data = b"abcd" * 10000
    frame = lz4f.compress(data)
    assert len(frame) < len(data) // 10
    assert lz4f.decompress(frame) == data


def test_decode_hand_built_block():
    # independently-constructed LZ4 block: literals "abcdef", then a match of
    # length 6 at offset 4 ("cdefcd"), then 5 trailing literals "XYZWV":
    # token (lit=6, match=6-4=2), 6 literals, offset LE 4,
    # then final token (lit=5), 5 literals
    block = bytes([0x62]) + b"abcdef" + bytes([0x04, 0x00])
    block += bytes([0x50]) + b"XYZWV"
    out = bytearray()
    lz4f.decompress_block(block, out)
    assert bytes(out) == b"abcdef" + b"cdefcd" + b"XYZWV"


def test_decode_overlapping_match():
    # RLE via offset 1: literal "A", match len 8 offset 1 -> "A"*9
    block = bytes([0x14]) + b"A" + bytes([0x01, 0x00])
    block += bytes([0x50]) + b"BCDEF"
    out = bytearray()
    lz4f.decompress_block(block, out)
    assert bytes(out) == b"A" * 9 + b"BCDEF"


def test_frame_malformed():
    good = lz4f.compress(b"payload data " * 100)
    with pytest.raises(ValueError, match="magic"):
        lz4f.decompress(b"\x00\x00\x00\x00" + good[4:])
    with pytest.raises(ValueError, match="header checksum"):
        bad = bytearray(good)
        bad[4] ^= 0x08  # flip a FLG bit -> checksum mismatch
        lz4f.decompress(bytes(bad))
    with pytest.raises(ValueError):
        lz4f.decompress(good[:10])  # truncated
    with pytest.raises(ValueError, match="content checksum"):
        bad = bytearray(good)
        bad[-1] ^= 0xFF
        lz4f.decompress(bytes(bad))


def test_frame_truncated_in_header_fields():
    """Truncations inside the optional content-size field / header checksum
    must raise ValueError, not struct.error / IndexError (ADVICE r3)."""
    full = lz4f.compress(b"x" * 64)
    # build a frame with the content-size flag set, then truncate inside it
    flg = full[4] | (1 << 3)
    hdr = bytes([flg, full[5]])
    with_size = bytearray(full[:4])
    with_size += hdr
    with_size += struct.pack("<Q", 64)
    with_size.append((lz4f.xxh32(hdr + struct.pack("<Q", 64)) >> 8) & 0xFF)
    for cut in (7, 10, 13):  # mid content-size / just before checksum byte
        with pytest.raises(ValueError):
            lz4f.decompress(bytes(with_size[:cut]))


def test_decompress_output_cap():
    """max_output bounds a hostile frame's expansion (ADVICE r3)."""
    payload = b"A" * 100_000
    frame = lz4f.compress(payload)  # tiny frame, 100 kB decoded
    assert lz4f.decompress(frame, max_output=len(payload)) == payload
    with pytest.raises(ValueError, match="size limit"):
        lz4f.decompress(frame, max_output=1_000)


def test_block_malformed():
    with pytest.raises(ValueError, match="zero match offset"):
        lz4f.decompress_block(bytes([0x14]) + b"A" + bytes([0x00, 0x00]),
                              bytearray())
    with pytest.raises(ValueError, match="before output start"):
        lz4f.decompress_block(bytes([0x14]) + b"A" + bytes([0x05, 0x00]),
                              bytearray())
    with pytest.raises(ValueError, match="literal"):
        lz4f.decompress_block(bytes([0xF0, 0xFF]), bytearray())


# ---------------------------------------------------------------------------
# lz4 chunks in bags
# ---------------------------------------------------------------------------


def _scan_bag(compression: str) -> BagWriter:
    w = BagWriter(chunk_messages=3, compression=compression)
    for i in range(6):
        t = 10.0 + i * 0.5
        w.add("/odom", "nav_msgs/Odometry", t,
              odometry(t, (0.1 * i, 0.0, 1.0), (1.0, 0, 0, 0)))
        w.add("/scan", "sensor_msgs/LaserScan", t + 0.01,
              laserscan(t + 0.01, np.full(360, 1.5)))
    return w


def test_lz4_chunked_bag_roundtrip(tmp_path):
    p = tmp_path / "scan_lz4.bag"
    _scan_bag("lz4").write(p)
    msgs = list(read_bag(p))
    assert len(msgs) == 12
    scan = next(m for m in msgs if m.topic == "/scan").parse()
    assert np.allclose(scan["ranges"], 1.5)
    frames = bag_to_frames(p, "/scan", "/odom", slop=0.1)
    assert len(frames) == 6
    assert frames[2]["position"][0] == pytest.approx(0.2, abs=1e-6)
    # the lz4 chunks really are LZ4 frames (magic present in the file)
    blob = p.read_bytes()
    assert struct.pack("<I", lz4f.MAGIC) in blob


def test_lz4_matches_bz2_frames(tmp_path):
    pa = tmp_path / "a.bag"
    pb = tmp_path / "b.bag"
    _scan_bag("lz4").write(pa)
    _scan_bag("bz2").write(pb)
    fa = bag_to_frames(pa, "/scan", "/odom")
    fb = bag_to_frames(pb, "/scan", "/odom")
    assert len(fa) == len(fb) == 6
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(a["ranges"], b["ranges"])
        np.testing.assert_array_equal(a["position"], b["position"])


# ---------------------------------------------------------------------------
# malformed-bag fuzz
# ---------------------------------------------------------------------------


def _tiny_bag(tmp_path, name, records: bytes) -> str:
    p = tmp_path / name
    p.write_bytes(b"#ROSBAG V2.0\n" + records)
    return p


def test_fuzz_truncated_record(tmp_path):
    w = BagWriter(compression="none")
    w.add("/scan", "sensor_msgs/LaserScan", 1.0, laserscan(1.0, [1.0] * 8))
    p = tmp_path / "t.bag"
    w.write(p)
    blob = p.read_bytes()
    p.write_bytes(blob[:-7])  # cut into the last record's data
    with pytest.raises(ValueError, match="runs past end|corrupt"):
        list(read_bag(p))


def test_fuzz_truncated_lz4_chunk(tmp_path):
    recs = msg_record(0, 1.0, laserscan(1.0, [1.0] * 64))
    chunk = chunk_record(conn_record(0, "/scan", "sensor_msgs/LaserScan")
                         + recs, "lz4")
    # truncate INSIDE the lz4 payload but keep the record framing valid
    hdr_len = struct.unpack_from("<I", chunk, 0)[0]
    data_off = 4 + hdr_len + 4
    data_len = struct.unpack_from("<I", chunk, 4 + hdr_len)[0]
    cut = chunk[:data_off] + chunk[data_off:data_off + data_len - 9]
    cut = cut[:4 + hdr_len] + struct.pack("<I", data_len - 9) + \
        cut[4 + hdr_len + 4:]
    p = _tiny_bag(tmp_path, "c.bag", cut)
    with pytest.raises(ValueError):
        list(read_bag(p))


def test_fuzz_unknown_compression(tmp_path):
    rec = (conn_record(0, "/scan", "sensor_msgs/LaserScan")
           + msg_record(0, 1.0, laserscan(1.0, [1.0] * 8)))
    hdr = {"op": b"\x05", "compression": b"zstd",
           "size": struct.pack("<I", len(rec))}
    from gie_mapping_tpu.runtime.rosbag_writer import _rec

    p = _tiny_bag(tmp_path, "z.bag", _rec(hdr, rec))
    with pytest.raises(ValueError, match="unknown chunk compression"):
        list(read_bag(p))


def test_fuzz_message_before_connection(tmp_path):
    # message record with a conn id that has no connection record
    p = _tiny_bag(tmp_path, "m.bag",
                  msg_record(3, 1.0, laserscan(1.0, [1.0] * 8)))
    with pytest.raises(ValueError, match="unknown connection"):
        list(read_bag(p))


def test_fuzz_not_a_bag(tmp_path):
    p = tmp_path / "x.bag"
    p.write_bytes(b"GIF89a not a bag at all")
    with pytest.raises(ValueError, match="not a rosbag"):
        list(read_bag(p))


def test_fuzz_unknown_op_skipped(tmp_path):
    # index/chunk-info style records (op 0x04/0x06) and vendor ops must be
    # ignored, not fatal
    from gie_mapping_tpu.runtime.rosbag_writer import _rec

    recs = (_rec({"op": b"\x04", "ver": struct.pack("<I", 1)}, b"\x00" * 12)
            + conn_record(0, "/scan", "sensor_msgs/LaserScan")
            + msg_record(0, 1.0, laserscan(1.0, [2.0] * 8))
            + _rec({"op": b"\x42"}, b"vendor"))
    p = _tiny_bag(tmp_path, "ops.bag", recs)
    msgs = list(read_bag(p))
    assert len(msgs) == 1
    assert np.allclose(msgs[0].parse()["ranges"], 2.0)
