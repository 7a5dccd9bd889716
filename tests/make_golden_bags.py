"""Hand-assemble golden ROS1 .bag fixtures from the format spec.

DELIBERATELY INDEPENDENT of trajectory_optimization_tpu: every byte here
comes from the public rosbag 2.0 / ROS serialization / LZ4 frame specs
(stdlib + a tiny from-spec LZ4 encoder + from-spec XXH32), written with
FOREIGN layout choices our own writer never makes — scrambled header-field
order, extra connection-header fields (callerid/latching), non-contiguous
connection ids, an LZ4 frame with content-size/block-checksum/content-
checksum flags set and a mix of compressed+stored blocks. A reader that
merely mirrors our writer's habits fails on these; a reader of the SPEC
passes. Run: python tests/make_golden_bags.py  (regenerates
tests/data/rosbag_golden/*.bag deterministically).
"""
from __future__ import annotations

import bz2
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "data", "rosbag_golden")

# --------------------------------------------------------------------------
# XXH32 (from the xxHash spec) — for the LZ4 frame checksums
# --------------------------------------------------------------------------

_P1, _P2, _P3, _P4, _P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393)
_M = 0xFFFFFFFF


def _rotl(x, r):
    return ((x << r) | (x >> (32 - r))) & _M


def xxh32(data: bytes, seed: int = 0) -> int:
    i, n = 0, len(data)
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 16 <= n:
            for _v in range(4):
                (lane,) = struct.unpack_from("<I", data, i)
                if _v == 0:
                    v1 = (_rotl((v1 + lane * _P2) & _M, 13) * _P1) & _M
                elif _v == 1:
                    v2 = (_rotl((v2 + lane * _P2) & _M, 13) * _P1) & _M
                elif _v == 2:
                    v3 = (_rotl((v3 + lane * _P2) & _M, 13) * _P1) & _M
                else:
                    v4 = (_rotl((v4 + lane * _P2) & _M, 13) * _P1) & _M
                i += 4
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, i)
        h = (_rotl((h + lane * _P3) & _M, 17) * _P4) & _M
        i += 4
    while i < n:
        h = (_rotl((h + data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M
    h ^= h >> 13
    h = (h * _P3) & _M
    h ^= h >> 16
    return h


# --------------------------------------------------------------------------
# LZ4: from-spec block encoder (naive hash-dict greedy — NOT the package's
# encoder) + frame writer with all optional fields set
# --------------------------------------------------------------------------


def lz4_block(data: bytes) -> bytes:
    """One spec-valid LZ4 compressed block (independent implementation)."""
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    # spec: last match must start >= 12 bytes from end; last 5 = literals
    limit = n - 12
    seqs = []
    while i <= limit:
        key = data[i:i + 4]
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j <= 0xFFFF and data[j:j + 4] == key:
            ml = 4
            while (i + ml < n - 5 and ml < 0xFFFF
                   and data[j + ml] == data[i + ml]):
                ml += 1
            seqs.append((anchor, i - anchor, i - j, ml))
            i += ml
            anchor = i
        else:
            i += 1
    # emit sequences + trailing literals
    def lens(first: int, v: int) -> bytes:
        if v < first:
            return b""
        v -= first
        b = bytearray()
        while v >= 255:
            b.append(255)
            v -= 255
        b.append(v)
        return bytes(b)

    for lit_off, lit_n, off, ml in seqs:
        tok_lit = min(lit_n, 15)
        tok_ml = min(ml - 4, 15)
        out.append((tok_lit << 4) | tok_ml)
        out += lens(15, lit_n)
        out += data[lit_off:lit_off + lit_n]
        out += struct.pack("<H", off)
        out += lens(15, ml - 4)
    tail = data[anchor:]
    out.append(min(len(tail), 15) << 4)
    out += lens(15, len(tail))
    out += tail
    return bytes(out)


def lz4_frame(data: bytes) -> bytes:
    """LZ4 frame: block-independent, 64 KB blocks, WITH content size,
    block checksums and content checksum (flags our writer leaves off)."""
    flg = (1 << 6) | (1 << 5) | (1 << 4) | (1 << 3)  # v1, indep, B.cksum, C.size
    flg |= 1 << 2  # content checksum
    bd = 4 << 4  # 64 KB max block size
    desc = bytes([flg, bd]) + struct.pack("<Q", len(data))
    hc = (xxh32(desc) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", 0x184D2204) + desc + bytes([hc]))
    bs = 65536
    for i in range(0, len(data), bs):
        blk = data[i:i + bs]
        comp = lz4_block(blk)
        if len(comp) < len(blk):
            out += struct.pack("<I", len(comp)) + comp
            out += struct.pack("<I", xxh32(comp))
        else:  # stored block (high bit set)
            out += struct.pack("<I", len(blk) | 0x80000000) + blk
            out += struct.pack("<I", xxh32(blk))
    out += struct.pack("<I", 0)  # end mark
    out += struct.pack("<I", xxh32(data))  # content checksum
    return bytes(out)


# --------------------------------------------------------------------------
# rosbag 2.0 records (foreign field ORDER: our writer emits op first;
# real rosbag and this generator put it elsewhere)
# --------------------------------------------------------------------------


def header(fields: list[tuple[str, bytes]]) -> bytes:
    out = b""
    for k, v in fields:
        e = k.encode() + b"=" + v
        out += struct.pack("<I", len(e)) + e
    return out


def record(fields: list[tuple[str, bytes]], data: bytes) -> bytes:
    h = header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def t_bytes(sec: int, nsec: int) -> bytes:
    return struct.pack("<II", sec, nsec)


def ros_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def ros_header(seq: int, sec: int, nsec: int, frame: str) -> bytes:
    return struct.pack("<I", seq) + t_bytes(sec, nsec) + ros_string(frame)


def pose_stamped(seq, sec, nsec, frame, pos, quat_xyzw) -> bytes:
    return (ros_header(seq, sec, nsec, frame)
            + struct.pack("<3d", *pos) + struct.pack("<4d", *quat_xyzw))


def pointcloud2(seq, sec, nsec, frame, pts) -> bytes:
    import numpy as np

    data = np.asarray(pts, "<f4").tobytes()
    n = len(pts)
    buf = ros_header(seq, sec, nsec, frame)
    buf += struct.pack("<II", 1, n)  # height, width
    buf += struct.pack("<I", 3)
    for name, off in (("x", 0), ("y", 4), ("z", 8)):
        buf += ros_string(name) + struct.pack("<IBI", off, 7, 1)
    buf += struct.pack("<B", 0)           # is_bigendian
    buf += struct.pack("<II", 12, 12 * n)  # point_step, row_step
    buf += struct.pack("<I", len(data)) + data
    buf += struct.pack("<B", 1)           # is_dense
    return buf


# connection DATA = a ROS connection header, with foreign extras
def conn_data(topic, ros_type, md5, definition, extras) -> bytes:
    fields = [("callerid", b"/golden_producer"),
              ("topic", topic.encode()),
              ("latching", b"0"),
              ("md5sum", md5.encode()),
              ("type", ros_type.encode()),
              ("message_definition", definition.encode())]
    fields += extras
    return header(fields)


POSE_CONN, CLOUD_CONN = 3, 11
POSES = [  # (bag sec, nsec, seq, position, quat xyzw)
    (100, 500000000, 1, (1.5, -2.25, 3.0), (0.0, 0.0, 0.7071067811865476,
                                            0.7071067811865476)),
    (102, 0, 2, (4.0, 5.0, -6.5), (0.0, 0.0, 0.0, 1.0)),
    (103, 750000000, 3, (-7.125, 8.0, 9.5), (0.5, 0.5, 0.5, 0.5)),
]
CLOUD_PTS = [(0.0, 0.0, 0.0), (1.0, 2.0, 3.0), (-1.0, 0.5, 2.0),
             (10.0, 20.0, 30.0)]
CLOUD_T = (101, 250000000)


def conn_record(conn_id, topic, data) -> bytes:
    # foreign order: topic before op, conn last
    return record([("topic", topic.encode()),
                   ("op", bytes([0x07])),
                   ("conn", struct.pack("<I", conn_id))], data)


def msg_record(conn_id, sec, nsec, data) -> bytes:
    return record([("time", t_bytes(sec, nsec)),
                   ("conn", struct.pack("<I", conn_id)),
                   ("op", bytes([0x02]))], data)


def chunk_record(body: bytes, compression: str) -> bytes:
    if compression == "bz2":
        payload = bz2.compress(body)
    elif compression == "lz4":
        payload = lz4_frame(body)
    else:
        payload = body
    return record([("compression", compression.encode()),
                   ("size", struct.pack("<I", len(body))),
                   ("op", bytes([0x05]))], payload)


def index_record(conn_id, entries) -> bytes:
    data = b"".join(t_bytes(s, ns) + struct.pack("<I", off)
                    for s, ns, off in entries)
    return record([("ver", struct.pack("<I", 1)),
                   ("conn", struct.pack("<I", conn_id)),
                   ("count", struct.pack("<I", len(entries))),
                   ("op", bytes([0x04]))], data)


def chunk_info_record(pos, t0, t1, counts) -> bytes:
    data = b"".join(struct.pack("<II", c, k) for c, k in counts)
    return record([("chunk_pos", struct.pack("<Q", pos)),
                   ("op", bytes([0x06])),
                   ("ver", struct.pack("<I", 1)),
                   ("start_time", t_bytes(*t0)),
                   ("end_time", t_bytes(*t1)),
                   ("count", struct.pack("<I", len(counts)))], data)


def bag_header_record(index_pos, conn_count, chunk_count) -> bytes:
    h = header([("chunk_count", struct.pack("<I", chunk_count)),
                ("conn_count", struct.pack("<I", conn_count)),
                ("index_pos", struct.pack("<Q", index_pos)),
                ("op", bytes([0x03]))])
    pad = 4096 - (4 + len(h) + 4)
    return (struct.pack("<I", len(h)) + h
            + struct.pack("<I", pad) + b" " * pad)


POSE_MD5 = "d3812c3cbc69362b77dc0b19b345f8f5"
CLOUD_MD5 = "1158d486dd51d683ce2f1be655c3c181"


def build_indexed() -> bytes:
    magic = b"#ROSBAG V2.0\n"
    pose_conn_data = conn_data("/golden/pose", "geometry_msgs/PoseStamped",
                               POSE_MD5, "# golden definition\n", [])
    cloud_conn_data = conn_data("/golden/cloud", "sensor_msgs/PointCloud2",
                                CLOUD_MD5, "# golden definition\n",
                                [("extra_unknown_field", b"keepme")])

    # ---- chunk bodies (record offsets inside the UNCOMPRESSED body) ----
    s, ns, seq, pos, q = POSES[0]
    c1_conn = conn_record(POSE_CONN, "/golden/pose", pose_conn_data)
    c1_msg = msg_record(POSE_CONN, s, ns, pose_stamped(seq, s, ns, "map",
                                                       pos, q))
    chunk1_body = c1_conn + c1_msg
    c1_off = [len(c1_conn)]

    c2_conn = conn_record(CLOUD_CONN, "/golden/cloud", cloud_conn_data)
    c2_cloud = msg_record(CLOUD_CONN, *CLOUD_T,
                          pointcloud2(7, *CLOUD_T, "odom", CLOUD_PTS))
    s, ns, seq, pos, q = POSES[1]
    c2_pose = msg_record(POSE_CONN, s, ns, pose_stamped(seq, s, ns, "map",
                                                        pos, q))
    chunk2_body = c2_conn + c2_cloud + c2_pose
    c2_cloud_off = len(c2_conn)
    c2_pose_off = len(c2_conn) + len(c2_cloud)

    s, ns, seq, pos, q = POSES[2]
    c3_msg = msg_record(POSE_CONN, s, ns, pose_stamped(seq, s, ns, "map",
                                                       pos, q))
    chunk3_body = c3_msg

    out = bytearray(magic)
    bh_at = len(out)
    out += bag_header_record(0, 0, 0)  # placeholder, patched below

    chunk_pos = []
    for body, comp, idx in (
        (chunk1_body, "none",
         [(POSE_CONN, [(100, 500000000, c1_off[0])])]),
        (chunk2_body, "bz2",
         [(CLOUD_CONN, [(101, 250000000, c2_cloud_off)]),
          (POSE_CONN, [(102, 0, c2_pose_off)])]),
        (chunk3_body, "lz4",
         [(POSE_CONN, [(103, 750000000, 0)])]),
    ):
        chunk_pos.append(len(out))
        out += chunk_record(body, comp)
        for cid, entries in idx:
            out += index_record(cid, entries)

    index_pos = len(out)
    out += conn_record(POSE_CONN, "/golden/pose", pose_conn_data)
    out += conn_record(CLOUD_CONN, "/golden/cloud", cloud_conn_data)
    out += chunk_info_record(chunk_pos[0], (100, 500000000),
                             (100, 500000000), [(POSE_CONN, 1)])
    out += chunk_info_record(chunk_pos[1], (101, 250000000), (102, 0),
                             [(CLOUD_CONN, 1), (POSE_CONN, 1)])
    out += chunk_info_record(chunk_pos[2], (103, 750000000),
                             (103, 750000000), [(POSE_CONN, 1)])
    out[bh_at:bh_at + 4096] = bag_header_record(index_pos, 2, 3)
    return bytes(out)


def build_truncated(indexed: bytes) -> bytes:
    """A crash-truncated recording: unindexed bag header (index_pos=0),
    first chunk intact, second chunk cut mid-record."""
    magic = b"#ROSBAG V2.0\n"
    body = indexed[len(magic) + 4096:]  # chunks of the indexed bag
    # find the second chunk's start: parse records forward
    i = 0
    seen_chunks = 0
    cut = None
    while i < len(body):
        (hlen,) = struct.unpack_from("<I", body, i)
        h = body[i + 4:i + 4 + hlen]
        (dlen,) = struct.unpack_from("<I", body, i + 4 + hlen)
        op = None
        j = 0
        while j < len(h):
            (n,) = struct.unpack_from("<I", h, j)
            e = h[j + 4:j + 4 + n]
            k, _, v = e.partition(b"=")
            if k == b"op":
                op = v[0]
            j += 4 + n
        rec_end = i + 4 + hlen + 4 + dlen
        if op == 0x05:
            seen_chunks += 1
            if seen_chunks == 2:
                cut = i + 4 + hlen + 4 + dlen // 2  # mid-chunk-data
                break
        i = rec_end
    assert cut is not None
    return magic + bag_header_record(0, 0, 0) + body[:cut]


def main():
    os.makedirs(OUT, exist_ok=True)
    indexed = build_indexed()
    with open(os.path.join(OUT, "golden_indexed.bag"), "wb") as f:
        f.write(indexed)
    with open(os.path.join(OUT, "golden_truncated.bag"), "wb") as f:
        f.write(build_truncated(indexed))
    print("wrote", OUT, len(indexed), "bytes indexed")


if __name__ == "__main__":
    main()
