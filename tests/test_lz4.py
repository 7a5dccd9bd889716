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


def _lz4_compress_block(data: bytes) -> bytes:
    """Minimal spec-conforming greedy LZ4 block ENCODER (tests only): finds
    matches via a 4-byte hash table, honors the end-of-block rules (last 5
    bytes literal, no match starting within 12 of the end). Exists to
    property-test the decoder on realistic match structures the hand
    vectors cannot cover."""
    n = len(data)
    out = bytearray()
    table = {}
    anchor = 0
    i = 0

    def emit(lit: bytes, match_len: int = -1, offset: int = 0):
        lit_len = len(lit)
        tok_lit = min(lit_len, 15)
        tok_mat = min(match_len - 4, 15) if match_len >= 4 else 0
        out.append((tok_lit << 4) | tok_mat)
        rest = lit_len - 15
        while rest >= 0:
            out.append(min(rest, 255))
            if rest < 255:
                break
            rest -= 255
        out.extend(lit)
        if match_len >= 4:
            out.extend(offset.to_bytes(2, "little"))
            rest = match_len - 4 - 15
            while rest >= 0:
                out.append(min(rest, 255))
                if rest < 255:
                    break
                rest -= 255

    while i < n - 12:
        key = data[i : i + 4]
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j <= 0xFFFF and data[j : j + 4] == key:
            m = 4
            limit = n - 5  # last 5 bytes must stay literal
            while i + m < limit and data[j + m] == data[i + m]:
                m += 1
            emit(data[anchor:i], m, i - j)
            i += m
            anchor = i
        else:
            i += 1
    emit(data[anchor:])  # trailing literals-only sequence
    return bytes(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_block_decoder_property_vs_encoder(seed):
    """Random compressible payloads through a real greedy encoder: both
    decoders must reproduce the original bytes exactly (covers arbitrary
    offsets, overlapping matches, extended literal and match lengths)."""
    rng = np.random.default_rng(seed)
    chunks = []
    for _ in range(60):
        kind = rng.integers(0, 3)
        if kind == 0:  # repeated motif -> long matches, small offsets
            motif = rng.integers(0, 256, rng.integers(1, 9), dtype=np.uint8).tobytes()
            chunks.append(motif * int(rng.integers(2, 120)))
        elif kind == 1:  # noise -> literals
            chunks.append(rng.integers(0, 256, rng.integers(1, 400), dtype=np.uint8).tobytes())
        else:  # re-reference earlier content -> far offsets
            prev = b"".join(chunks)
            if prev:
                k = int(rng.integers(1, min(len(prev), 300) + 1))
                s = int(rng.integers(0, len(prev) - k + 1))
                chunks.append(prev[s : s + k])
    data = b"".join(chunks)
    comp = _lz4_compress_block(data)
    assert len(comp) < len(data)  # it actually compressed
    assert _decode_block(comp, len(data)) == data


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


def _varied_payloads():
    rng = np.random.default_rng(42)
    payloads = [
        b"", b"a", b"hello", bytes(12), bytes(13), bytes(14), bytes(64),
        b"abcabcabcabcabcabcabc",
        b"the quick brown fox jumps over the lazy dog. " * 500,
        bytes(100000),                                          # long matches
        rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(),   # pure noise
        rng.integers(0, 4, 70000, dtype=np.uint8).tobytes(),    # small alphabet
        rng.integers(0, 256, 80, dtype=np.uint8).tobytes() * 1000,
    ]
    # far-reference structure: 2 KB of noise repeated ~70 KB later — the
    # repeat sits beyond the 65535 offset cap, so it must stay literal
    blob = rng.integers(0, 256, 70000, dtype=np.uint8).tobytes()
    payloads.append(blob[:2000] + blob + blob[:2000])
    return payloads


def test_encode_block_backends_bit_identical():
    """The C++ and pure-Python block encoders share hash, probe order and
    acceleration schedule by design — their outputs must be byte-equal
    (native b'' = 'did not shrink' maps to the Python encoder's None)."""
    from trajectory_optimization_tpu.native import (
        lz4_block_encode_native,
        native_available,
    )

    if not native_available():
        pytest.skip("no native toolchain")
    for i, data in enumerate(_varied_payloads()):
        nat = lz4_block_encode_native(data)
        assert nat is not None  # library present
        py = lz4._encode_block_py(data) if data else None
        assert (nat or None) == py, f"payload #{i} ({len(data)} B) diverged"


def test_encode_block_roundtrip_both_decoders():
    """Everything the encoder emits must decode back exactly, through both
    the Python and (when built) native block decoders."""
    from trajectory_optimization_tpu.native import lz4_block_decode_native

    for i, data in enumerate(_varied_payloads()):
        if not data:
            continue
        comp = lz4._encode_block_py(data)
        if comp is None:
            continue  # incompressible: stored-block path, nothing to decode
        assert len(comp) < len(data)
        out = np.empty(len(data), np.uint8)
        assert lz4._decode_block_py(comp, out, 0) == len(data)
        assert out.tobytes() == data, f"payload #{i}"
        nat = lz4_block_decode_native(comp, out, 0)
        if nat is not None:
            assert nat == len(data) and out.tobytes() == data


def test_frame_compress_real_ratio():
    """compress() now actually compresses: repetitive payloads shrink
    (stored blocks only where data doesn't), and everything round-trips.
    Blocks stay under _PY_ENCODE_MAX so the pure-Python fallback engages
    on toolchain-less hosts too."""
    text = b"scan %05d: all systems nominal; " * 40000
    framed = lz4.compress(text, block_size=200_000)
    assert len(framed) < len(text) // 4
    assert lz4.decompress(framed) == text

    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, 150000, dtype=np.uint8).tobytes()
    mixed = text[:150000] + noise  # one compressible + one stored block
    framed = lz4.compress(mixed, block_size=150000)
    assert lz4.decompress(framed) == mixed
    assert len(framed) < len(mixed)


def test_bag_lz4_actually_compresses(tmp_path):
    """An lz4 bag of structured clouds must come out smaller than its
    chunks (rosbag parity: the reference session bag is lz4 at 79.5%).
    Bag chunks are ~1 MB — above the Python encoder's size gate — so this
    needs the native encoder (frame-level ratios without it are covered
    by test_frame_compress_real_ratio)."""
    from trajectory_optimization_tpu.native import native_available

    if not native_available():
        pytest.skip("no native toolchain: 1 MB chunks store without it")
    from trajectory_optimization_tpu.bus.messages import CloudMsg, Header
    from trajectory_optimization_tpu.bus.rosbag import bag_info, read_bag, write_bag

    # organized-grid cloud: smooth coordinates, the repetitive structure a
    # real sensor stream has (random floats would be entropy-limited)
    g = np.mgrid[0:100, 0:120].astype(np.float32)
    pts = np.stack([g[0].ravel(), g[1].ravel(), np.zeros(12000, np.float32)], 1)
    msgs = [("/pc", CloudMsg(Header(stamp=float(i), frame_id="map"), pts))
            for i in range(8)]
    bag = tmp_path / "compressed.bag"
    write_bag(str(bag), msgs, compression="lz4")
    info = bag_info(str(bag))
    assert info.compression.get("lz4", 0) >= 1
    assert info.compressed < 0.75 * info.uncompressed
    got = list(read_bag(str(bag)))
    assert len(got) == 8
    np.testing.assert_array_equal(got[3][2].xyz, pts.astype(np.float64))


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
