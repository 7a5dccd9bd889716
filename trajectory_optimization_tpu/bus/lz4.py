"""LZ4 *frame* codec for rosbag chunks — no external lz4 package needed.

The reference's recorded session bag is lz4-compressed (15.1 GB, 2691 lz4
chunks — `launch/rosbag_info.txt`), and ROS's roslz4 writes standard LZ4
frames. This module implements, from the public LZ4 frame/block specs:

* :func:`decompress` — full frame decoder. Handles stored and compressed
  blocks, block-dependent and independent frames, and skips (does not
  verify) the optional xxHash checksums. Block decoding uses the native C
  decoder (``native.lz4_block_decode_native``) when built, else a pure-
  Python fallback with identical semantics.
* :func:`compress` — spec-valid frame writer using STORED blocks (every
  block flagged uncompressed). Any conformant LZ4 decoder reads it; the
  trade is ratio 1.0 for zero encoder complexity — bz2 remains the choice
  when bag size matters. The frame-descriptor checksum byte is a real
  XXH32, so strict decoders (the lz4 CLI) accept the output.

Written from the format specifications; decompression validated against
hand-assembled vectors covering literals, extended lengths, and
overlapping matches (tests/test_lz4.py).
"""
from __future__ import annotations

import struct

import numpy as np

_MAGIC = 0x184D2204
# BD byte block-max-size code → bytes (codes 4-7 per the spec)
_BD_SIZES = {4: 64 << 10, 5: 256 << 10, 6: 1 << 20, 7: 4 << 20}


def _xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 (needed for the frame-descriptor checksum byte)."""
    P1, P2, P3, P4, P5 = (
        2654435761, 2246822519, 3266489917, 668265263, 374761393,
    )
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i <= n - 16:
            for _ in range(1):
                k1, k2, k3, k4 = struct.unpack_from("<IIII", data, i)
            v1 = (rotl((v1 + k1 * P2) & M, 13) * P1) & M
            v2 = (rotl((v2 + k2 * P2) & M, 13) * P1) & M
            v3 = (rotl((v3 + k3 * P2) & M, 13) * P1) & M
            v4 = (rotl((v4 + k4 * P2) & M, 13) * P1) & M
            i += 16
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (rotl((h + k * P3) & M, 17) * P4) & M
        i += 4
    while i < n:
        h = (rotl((h + data[i] * P5) & M, 11) * P1) & M
        i += 1
    h ^= h >> 15
    h = (h * P2) & M
    h ^= h >> 13
    h = (h * P3) & M
    h ^= h >> 16
    return h


def _decode_block_py(src: bytes, dst: np.ndarray, pos: int) -> int:
    """Pure-Python LZ4 block decoder (mirror of the C kernel)."""
    ip, n, cap = 0, len(src), dst.shape[0]
    while ip < n:
        token = src[ip]
        ip += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[ip]
                ip += 1
                lit += b
                if b != 255:
                    break
        if ip + lit > n or pos + lit > cap:
            raise ValueError("malformed LZ4 block (literal run)")
        dst[pos : pos + lit] = np.frombuffer(src, np.uint8, lit, ip)
        ip += lit
        pos += lit
        if ip == n:
            break
        offset = src[ip] | (src[ip + 1] << 8)
        ip += 2
        if offset == 0 or offset > pos:
            raise ValueError("malformed LZ4 block (match offset)")
        mlen = token & 0x0F
        if mlen == 15:
            while True:
                b = src[ip]
                ip += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        if pos + mlen > cap:
            raise ValueError("LZ4 output buffer too small")
        if offset >= mlen:  # non-overlapping: vector copy
            dst[pos : pos + mlen] = dst[pos - offset : pos - offset + mlen]
        else:  # overlapping match replicates a pattern
            for k in range(mlen):
                dst[pos + k] = dst[pos - offset + k]
        pos += mlen
    return pos


def _decode_block(src: bytes, dst: np.ndarray, pos: int) -> int:
    from trajectory_optimization_tpu.native import lz4_block_decode_native

    new_pos = lz4_block_decode_native(src, dst, pos)
    if new_pos is None:
        new_pos = _decode_block_py(src, dst, pos)
    return new_pos


def decompress(data: bytes) -> bytes:
    """Decode a (sequence of) LZ4 frame(s) to bytes."""
    view = memoryview(data)
    out = np.empty(max(4 * len(data), 1 << 16), np.uint8)
    pos = 0
    ip = 0
    while ip + 4 <= len(view):
        (magic,) = struct.unpack_from("<I", view, ip)
        ip += 4
        if (magic & 0xFFFFFFF0) == 0x184D2A50:  # skippable frame
            (skip,) = struct.unpack_from("<I", view, ip)
            ip += 4 + skip
            continue
        if magic != _MAGIC:
            raise ValueError(f"not an LZ4 frame (magic {magic:#x})")
        flg = view[ip]
        bd = view[ip + 1]
        ip += 2
        if (flg >> 6) != 0b01:
            raise ValueError("unsupported LZ4 frame version")
        has_bsum = bool(flg & 0x10)
        has_csize = bool(flg & 0x08)
        has_csum = bool(flg & 0x04)
        has_dict = bool(flg & 0x01)
        if has_csize:
            (content_size,) = struct.unpack_from("<Q", view, ip)
            ip += 8
            need = pos + content_size
            if need > out.shape[0]:
                out = np.concatenate([out[:pos], np.empty(need - pos + 64, np.uint8)])
        if has_dict:
            ip += 4  # dictionary ID (external dicts unsupported but rare)
        ip += 1  # header-checksum byte (not verified)
        bmax = _BD_SIZES.get((bd >> 4) & 0x7, 4 << 20)
        while True:
            (bsize,) = struct.unpack_from("<I", view, ip)
            ip += 4
            if bsize == 0:  # EndMark
                break
            stored = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            if pos + bmax + 64 > out.shape[0]:  # grow ahead of the block
                grow = max(out.shape[0], bmax + 64)
                out = np.concatenate([out, np.empty(grow, np.uint8)])
            block = bytes(view[ip : ip + bsize])
            ip += bsize
            if stored:
                out[pos : pos + bsize] = np.frombuffer(block, np.uint8)
                pos += bsize
            else:
                pos = _decode_block(block, out, pos)
            if has_bsum:
                ip += 4  # per-block checksum (not verified)
        if has_csum:
            ip += 4  # content checksum (not verified)
    return out[:pos].tobytes()


def compress(data: bytes, block_size: int = 4 << 20) -> bytes:
    """Encode ``data`` as an LZ4 frame of STORED blocks (ratio 1.0)."""
    parts = [struct.pack("<I", _MAGIC)]
    # FLG: version 01, block-independent, no checksums/size/dict
    flg, bd = 0x60, 0x70  # BD code 7 = 4 MB max block
    desc = bytes([flg, bd])
    hc = (_xxh32(desc) >> 8) & 0xFF
    parts.append(desc + bytes([hc]))
    for i in range(0, len(data), block_size):
        chunk = data[i : i + block_size]
        parts.append(struct.pack("<I", 0x80000000 | len(chunk)))
        parts.append(chunk)
    parts.append(struct.pack("<I", 0))  # EndMark
    return b"".join(parts)
