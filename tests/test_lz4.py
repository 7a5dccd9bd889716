"""LZ4 frame/block codec (bus.lz4 + native lz4_block_decode).

The decoder is written from the public LZ4 specs (no reference
implementation available in this image), so correctness rests on
hand-assembled vectors that exercise every format feature: plain and
extended literal runs, non-overlapping and overlapping (pattern-replicating)
matches, stored blocks, and multi-block frames.
"""
import struct

import numpy as np
import pytest

from trajectory_optimization_tpu.bus import lz4


def _decode_block(src: bytes, expect_len: int) -> bytes:
    dst = np.zeros(expect_len + 16, np.uint8)
    pos = lz4._decode_block_py(src, dst, 0)
    out_py = dst[:pos].tobytes()
    # the native kernel (when built) must agree byte-for-byte
    from trajectory_optimization_tpu.native import lz4_block_decode_native

    dst2 = np.zeros(expect_len + 16, np.uint8)
    pos2 = lz4_block_decode_native(src, dst2, 0)
    if pos2 is not None:
        assert pos2 == pos
        assert dst2[:pos2].tobytes() == out_py
    return out_py


def test_block_literals_and_match():
    # "abcd" + match(offset 4, len 8) + literals "abcd" = "abcd" * 4
    src = bytes([0x44]) + b"abcd" + struct.pack("<H", 4) + bytes([0x40]) + b"abcd"
    assert _decode_block(src, 16) == b"abcd" * 4


def test_block_overlapping_match_replicates():
    # 1 literal 'a' + match(offset 1, len 9): the RLE trick
    src = bytes([0x15]) + b"a" + struct.pack("<H", 1)
    assert _decode_block(src, 10) == b"a" * 10


def test_block_extended_lengths():
    lit = bytes(range(20))
    # extended literal length: 15 in token + 5 in the extension byte
    src = bytes([0xF0, 5]) + lit
    assert _decode_block(src, 20) == lit
    # extended match length: 15+4 in token + 250 extension -> 269
    src = bytes([0x1F]) + b"x" + struct.pack("<H", 1) + bytes([250])
    assert _decode_block(src, 270) == b"x" * 270


def test_block_malformed_rejected():
    dst = np.zeros(64, np.uint8)
    with pytest.raises(ValueError):  # match offset beyond decoded output
        lz4._decode_block_py(bytes([0x04]) + struct.pack("<H", 9), dst, 0)
    from trajectory_optimization_tpu.native import lz4_block_decode_native

    if lz4_block_decode_native(b"", dst, 0) is not None:
        with pytest.raises(ValueError):
            lz4_block_decode_native(bytes([0x04]) + struct.pack("<H", 9), dst, 0)


def test_xxh32_known_vectors():
    assert lz4._xxh32(b"") == 0x02CC5D05
    assert lz4._xxh32(b"abc") == 0x32D153FF


def test_frame_roundtrip_stored_blocks():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=9_000_000, dtype=np.uint8).tobytes()
    framed = lz4.compress(data, block_size=4 << 20)  # 3 blocks
    assert lz4.decompress(framed) == data
    assert lz4.decompress(lz4.compress(b"")) == b""


def test_frame_with_compressed_blocks():
    """Hand-built frame containing a real compressed block (+ a stored one),
    with content-size and checksum fields present (skipped by the decoder) —
    the roslz4-shaped input path."""
    part1 = b"abcd" * 4
    block1 = bytes([0x44]) + b"abcd" + struct.pack("<H", 4) + bytes([0x40]) + b"abcd"
    part2 = b"STORED-TAIL"
    flg = 0x60 | 0x10 | 0x08 | 0x04  # v01 indep + block-sums + csize + csum
    desc = bytes([flg, 0x40]) + struct.pack("<Q", len(part1) + len(part2))
    hc = (lz4._xxh32(desc) >> 8) & 0xFF
    frame = (
        struct.pack("<I", 0x184D2204) + desc + bytes([hc])
        + struct.pack("<I", len(block1)) + block1 + b"\x00\x00\x00\x00"  # bsum
        + struct.pack("<I", 0x80000000 | len(part2)) + part2 + b"\x00\x00\x00\x00"
        + struct.pack("<I", 0)  # EndMark
        + b"\x00\x00\x00\x00"  # content checksum
    )
    assert lz4.decompress(frame) == part1 + part2


def test_bag_roundtrip_lz4(tmp_path):
    from trajectory_optimization_tpu.bus.messages import CloudMsg, Header
    from trajectory_optimization_tpu.bus.rosbag import read_bag, write_bag

    pts = np.random.default_rng(1).normal(size=(5000, 3)).astype(np.float32)
    msgs = [("/pc", CloudMsg(Header(stamp=float(i), frame_id="map"), pts + i))
            for i in range(4)]
    bag = tmp_path / "session_lz4.bag"
    write_bag(str(bag), msgs, compression="lz4")
    got = list(read_bag(str(bag)))
    assert len(got) == 4
    for i, (_, topic, msg) in enumerate(got):
        assert topic == "/pc"
        np.testing.assert_array_equal(msg.xyz, (pts + i).astype(np.float64)[:, :3])
