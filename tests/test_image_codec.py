"""From-spec JPEG/PNG codecs (bus.jpeg, bus.png, native jpeg_decode).

The reference's real session bag carries its six camera streams as
sensor_msgs/CompressedImage JPEG (reference launch/rosbag_info.txt:15) and
decodes them with cv_bridge/cv2 (src/tools.py:199-204). Fixtures in
tests/data/imgcodec were encoded once with PIL/cv2 (libjpeg/libpng) and
committed together with those libraries' own decoded output as oracles, so
this file needs no image library at runtime. Live PIL/cv2 oracle sweeps
run additionally when available.
"""
import os

import numpy as np
import pytest

from trajectory_optimization_tpu.bus.jpeg import (
    JpegError,
    UnsupportedJpegError,
    decode_jpeg,
    probe_jpeg,
)
from trajectory_optimization_tpu.bus.png import (
    PngError,
    UnsupportedPngError,
    decode_png,
    probe_png,
)
from trajectory_optimization_tpu.native import jpeg_decode_native, native_available

FIXDIR = os.path.join(os.path.dirname(__file__), "data", "imgcodec")


def _fixture(name):
    with open(os.path.join(FIXDIR, name), "rb") as f:
        data = f.read()
    oracles = np.load(os.path.join(FIXDIR, "oracles.npz"))
    return data, oracles[name]


JPEG_FIXTURES = ["rgb_q85_420.jpg", "rgb_q90_444.jpg", "rgb_q75_422.jpg",
                 "gray_q90.jpg", "rgb_rst.jpg", "progressive.jpg"]


@pytest.mark.parametrize("name", JPEG_FIXTURES)
def test_jpeg_numpy_vs_committed_oracle(name):
    """The decoder reproduces libjpeg's own integer pipeline (islow IDCT +
    fancy upsample + 16.16 color) BIT-FOR-BIT on these libjpeg-generated
    oracles — the T.81 conformance criterion is far looser, so any nonzero
    diff here is a real numerics regression, not tolerance drift."""
    data, oracle = _fixture(name)
    img = decode_jpeg(data)
    assert img.shape == oracle.shape and img.dtype == np.uint8
    np.testing.assert_array_equal(img, oracle)


@pytest.mark.parametrize("name", JPEG_FIXTURES)
def test_jpeg_native_matches_numpy(name):
    """C++ and NumPy paths are integer end to end — bit-identical, no
    FMA/summation-order caveats."""
    if not native_available():
        pytest.skip("no native toolchain")
    data, _ = _fixture(name)
    nat = jpeg_decode_native(data)
    ref = decode_jpeg(data)
    assert nat.shape == ref.shape
    np.testing.assert_array_equal(nat, ref)


def test_jpeg_probe():
    data, oracle = _fixture("rgb_q85_420.jpg")
    assert probe_jpeg(data) == (oracle.shape[0], oracle.shape[1], 3)
    gdata, goracle = _fixture("gray_q90.jpg")
    assert probe_jpeg(gdata) == (goracle.shape[0], goracle.shape[1], 1)


# minimal SOF3 (lossless) stream: valid container, unsupported coding —
# the representative "keep the compressed passthrough" payload now that
# progressive decodes
LOSSLESS_STUB = bytes([
    0xFF, 0xD8,                                     # SOI
    0xFF, 0xC3, 0x00, 0x0B, 8, 0, 8, 0, 8, 1,       # SOF3 8x8 1-comp
    0x01, 0x11, 0x00,
    0xFF, 0xD9,                                     # EOI
])


def test_jpeg_non_dct_raises_unsupported():
    """Lossless / arithmetic-coded SOFs stay UnsupportedJpegError (the
    compressed-passthrough contract); progressive now probes + decodes."""
    with pytest.raises(UnsupportedJpegError):
        decode_jpeg(LOSSLESS_STUB)
    with pytest.raises(UnsupportedJpegError):
        probe_jpeg(LOSSLESS_STUB)
    arith = bytearray(LOSSLESS_STUB)
    arith[3] = 0xC9  # SOF9: arithmetic-coded sequential
    with pytest.raises(UnsupportedJpegError):
        decode_jpeg(bytes(arith))
    if native_available():
        with pytest.raises(UnsupportedJpegError):
            jpeg_decode_native(LOSSLESS_STUB)
    with open(os.path.join(FIXDIR, "progressive.jpg"), "rb") as f:
        data = f.read()
    assert probe_jpeg(data) == (48, 64, 3)


def test_jpeg_malformed_raises():
    data, _ = _fixture("rgb_q85_420.jpg")
    with pytest.raises(JpegError):
        decode_jpeg(b"\x00" + data)
    with pytest.raises(JpegError):
        decode_jpeg(data[:40])  # truncated before SOS
    if native_available():
        with pytest.raises(JpegError):
            jpeg_decode_native(data[:40])
    # truncated SEGMENTS must also surface as JpegError, not IndexError —
    # decode_compressed_payload's bag-read error contract depends on it
    for bad in (
        b"\xff\xd8\xff\xc0\x00\x02\xff\xd9",        # empty SOF
        b"\xff\xd8\xff\xda\x00\x02\xff\xd9",        # empty SOS
        b"\xff\xd8\xff\xdd\x00\x03\x01\xff\xd9",    # short DRI
        b"\xff\xd8\xff\xdb\x00\x04\x01\x02\xff\xd9",  # odd 16-bit DQT
    ):
        with pytest.raises(JpegError):
            decode_jpeg(bad)
        with pytest.raises(JpegError):
            probe_jpeg(bad)


def test_png_short_ihdr_raises_pngerror():
    import struct

    bad = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 12) + b"IHDR"
           + b"\x00" * 12 + b"\x00" * 4)
    with pytest.raises(PngError):
        decode_png(bad)
    with pytest.raises(PngError):
        probe_png(bad)


@pytest.mark.parametrize("name", ["rgb.png", "depth16.png"])
def test_png_exact(name):
    """PNG is lossless: decode must be bit-exact against the source array."""
    data, oracle = _fixture(name)
    img = decode_png(data)
    assert img.dtype == oracle.dtype
    np.testing.assert_array_equal(img, oracle)


def test_png_probe_and_errors():
    data, oracle = _fixture("rgb.png")
    assert probe_png(data) == (oracle.shape[0], oracle.shape[1], 3, 8)
    with pytest.raises(PngError):
        decode_png(data[:20])
    with pytest.raises(PngError):
        decode_png(b"nonsense")
    # flipping the IHDR interlace byte alone leaves the IDAT payload laid
    # out non-interlaced -> the Adam7 pass walk must reject it (size
    # mismatch), not decode garbage
    adam7 = bytearray(data)
    adam7[28] = 1
    with pytest.raises(PngError):
        decode_png(bytes(adam7))
    bad = bytearray(data)
    bad[28] = 2  # undefined interlace method
    with pytest.raises(PngError):
        decode_png(bytes(bad))


def _encode_adam7(img):
    """Minimal Adam7 writer (filter 0 everywhere) for decoder fixtures."""
    import struct
    import zlib

    from trajectory_optimization_tpu.bus.png import _ADAM7

    h, w = img.shape[:2]
    channels = 1 if img.ndim == 2 else img.shape[2]
    depth = 16 if img.dtype == np.uint16 else 8
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    raw = img.astype(">u2").view(np.uint8) if depth == 16 else img
    raw = raw.reshape(h, w, -1)
    payload = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = raw[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for r in range(sub.shape[0]):
            payload += b"\x00" + sub[r].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(payload)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("shape,dtype", [
    ((23, 37, 3), np.uint8),   # odd dims: ragged pass widths/heights
    ((16, 16, 3), np.uint8),
    ((5, 3), np.uint16),       # tiny 16-bit gray: several empty passes
    ((21, 29, 4), np.uint8),   # RGBA
    ((1, 1, 3), np.uint8),     # single pixel: only pass 1 non-empty
])
def test_png_adam7_decode(shape, dtype):
    """Adam7-interlaced PNGs decode exactly; PIL cross-checks the writer."""
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, np.iinfo(dtype).max + 1, shape, dtype=dtype)
    data = _encode_adam7(img)
    np.testing.assert_array_equal(decode_png(data), img)
    try:
        from PIL import Image
    except ImportError:
        return
    import io

    pil = np.asarray(Image.open(io.BytesIO(data)))
    np.testing.assert_array_equal(pil.astype(dtype), img)


def test_compressed_image_record_decodes_to_pixels():
    """A sensor_msgs/CompressedImage bag record now lands as ImageMsg
    pixels (VERDICT r2 item 1); undecodable payloads keep the passthrough."""
    from trajectory_optimization_tpu.bus.messages import Header
    from trajectory_optimization_tpu.bus.rosbag import (
        _Writer,
        _decode_compressed_image,
    )

    data, oracle = _fixture("rgb_q85_420.jpg")
    w = _Writer()
    w.header(Header(stamp=3.5, frame_id="camera_0", seq=7))
    w.string("bgr8; jpeg compressed bgr8")  # compressed_image_transport style
    w.u32(len(data))
    w.raw(data)
    msg = _decode_compressed_image(w.bytes())
    assert msg.encoding == "rgb8"
    assert msg.data.shape == oracle.shape
    np.testing.assert_array_equal(msg.data, oracle)

    # 16-bit PNG depth stream
    pdata, poracle = _fixture("depth16.png")
    w = _Writer()
    w.header(Header(stamp=4.0, frame_id="depth", seq=1))
    w.string("16UC1; png compressed ")
    w.u32(len(pdata))
    w.raw(pdata)
    msg = _decode_compressed_image(w.bytes())
    assert msg.encoding == "mono16"
    np.testing.assert_array_equal(msg.data, poracle)

    # progressive JPEG decodes too (round-3: SOF2 support in both backends)
    prog, prog_oracle = _fixture("progressive.jpg")
    w = _Writer()
    w.header(Header(stamp=5.0, frame_id="camera_1", seq=2))
    w.string("jpeg")
    w.u32(len(prog))
    w.raw(prog)
    msg = _decode_compressed_image(w.bytes())
    assert msg.encoding == "rgb8"
    np.testing.assert_array_equal(msg.data, prog_oracle)

    # genuinely undecodable coding -> honest passthrough, bag read survives
    w = _Writer()
    w.header(Header(stamp=5.5, frame_id="camera_1", seq=3))
    w.string("jpeg")
    w.u32(len(LOSSLESS_STUB))
    w.raw(LOSSLESS_STUB)
    msg = _decode_compressed_image(w.bytes())
    assert msg.encoding == "jpeg" and msg.data.ndim == 1


def test_jpeg_encoder_roundtrip_self():
    """Self-encoded fixtures: our encoder's streams decode with our own
    decoder (both backends) to within quantization error of the source."""
    from trajectory_optimization_tpu.bus.jpeg import encode_jpeg

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:45, 0:59]
    img = np.stack([(xx * 4) % 256, (yy * 5) % 256, (xx + yy) % 256], -1)
    img = np.clip(img + rng.integers(-10, 10, img.shape), 0, 255).astype(np.uint8)
    data = encode_jpeg(img, quality=95)
    out = decode_jpeg(data)
    rms = np.sqrt(((out.astype(int) - img.astype(int)) ** 2).mean())
    assert rms < 8.0, f"q95 roundtrip rms {rms}"
    if native_available():
        nat = jpeg_decode_native(data)
        np.testing.assert_array_equal(nat, out)
    # grayscale
    gdata = encode_jpeg(img[:, :, 0], quality=95)
    gout = decode_jpeg(gdata)
    grms = np.sqrt(((gout.astype(int) - img[:, :, 0].astype(int)) ** 2).mean())
    assert gout.ndim == 2 and grms < 6.0


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_jpeg_encoder_native_matches_python(subsampling):
    """The C++ and Python encoders share tables and numerics; their
    streams must decode identically to within +-1 count (double FDCT
    summation order is the only difference; sizes track within noise)."""
    if not native_available():
        pytest.skip("no native toolchain")
    import trajectory_optimization_tpu.native as nat
    from trajectory_optimization_tpu.bus.jpeg import encode_jpeg
    from trajectory_optimization_tpu.native import jpeg_encode_native

    rng = np.random.default_rng(15)
    img = _structured_image_for_fixtures(rng, 61, 83)
    blob_native = jpeg_encode_native(img, 90, subsampling=subsampling)
    real = nat._load
    nat._load = lambda: None  # force the Python bit-writer
    try:
        blob_py = encode_jpeg(img, 90, subsampling=subsampling)
    finally:
        nat._load = real
    a = decode_jpeg(blob_native).astype(int)
    b = decode_jpeg(blob_py).astype(int)
    assert np.abs(a - b).max() <= 1
    assert abs(len(blob_native) - len(blob_py)) <= 64  # headers identical


def test_jpeg_encode_420(tmp_path):
    """4:2:0 encoding: meaningfully smaller than 4:4:4 on photo-like
    content, correct at odd dims, argument validation, gray ignores the
    knob. (The PIL bit-identity oracle for 420 streams lives in
    test_encoders_vs_live_pil_decode.)"""
    from trajectory_optimization_tpu.bus.jpeg import encode_jpeg

    rng = np.random.default_rng(4)
    g = np.mgrid[0:97, 0:121]
    img = np.stack([
        128 + 80 * np.sin(g[0] / 17.0) + rng.normal(0, 5, g[0].shape),
        128 + 80 * np.cos(g[1] / 23.0) + rng.normal(0, 5, g[0].shape),
        (g[0] + g[1]) % 200,
    ], -1).clip(0, 255).astype(np.uint8)
    b420 = encode_jpeg(img, quality=85, subsampling="420")
    b444 = encode_jpeg(img, quality=85, subsampling="444")
    assert len(b420) < 0.8 * len(b444)
    out = decode_jpeg(b420)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err < 6.0, err
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img, subsampling="422")
    # gray ignores the knob
    assert encode_jpeg(img[:, :, 0], subsampling="420") == encode_jpeg(
        img[:, :, 0], subsampling="444")


def test_jpeg_encode_noise_q100_and_dtype_guard():
    """Entropy-coded noise at quality 100 exceeds the raw size (~2.2x) —
    the native encoder must retry with a larger buffer or hand the frame
    to the growable Python encoder, never raise; and non-uint8 inputs
    must be rejected, not silently truncated to garbage."""
    from trajectory_optimization_tpu.bus.jpeg import encode_jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (256, 256, 3)).astype(np.uint8)
    data = encode_jpeg(img, quality=100)
    out = decode_jpeg(data)
    assert out.shape == img.shape
    rms = np.sqrt(((out.astype(int) - img.astype(int)) ** 2).mean())
    assert rms < 12.0, f"q100 noise roundtrip rms {rms}"
    if native_available():
        from trajectory_optimization_tpu.native import jpeg_encode_native

        with pytest.raises(ValueError, match="uint8"):
            jpeg_encode_native(rng.random((8, 8, 3)), 85)
        with pytest.raises(ValueError, match="uint8"):
            jpeg_encode_native(img.astype(np.int16), 85)


def _structured_image_for_fixtures(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 // w), (yy * 255 // h), ((xx + yy) % 256)], -1)
    img = img + rng.integers(-20, 20, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_png_encoder_roundtrip_exact():
    from trajectory_optimization_tpu.bus.png import encode_png

    rng = np.random.default_rng(12)
    rgb = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(rgb)), rgb)
    g16 = rng.integers(0, 65536, (21, 29), dtype=np.uint16)
    out = decode_png(encode_png(g16))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, g16)
    rgba = rng.integers(0, 256, (10, 11, 4), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(rgba)), rgba)


def test_bag_roundtrip_compressed_streams(tmp_path):
    """Bag->bag copy semantics for camera streams: baseline JPEG payloads
    written as passthrough come back as decoded pixels; undecodable
    payloads survive byte-identical (reference bag interop)."""
    from trajectory_optimization_tpu.bus.jpeg import encode_jpeg
    from trajectory_optimization_tpu.bus.messages import Header, ImageMsg
    from trajectory_optimization_tpu.bus.rosbag import read_bag, write_bag

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    jpg = encode_jpeg(img, quality=92)
    prog, prog_oracle = _fixture("progressive.jpg")
    msgs = [
        ("/viz/camera_0/image/compressed",
         ImageMsg(Header(stamp=1.0, frame_id="camera_0"),
                  np.frombuffer(jpg, np.uint8), encoding="jpeg")),
        ("/viz/camera_1/image/compressed",
         ImageMsg(Header(stamp=1.1, frame_id="camera_1"),
                  np.frombuffer(LOSSLESS_STUB, np.uint8), encoding="jpeg")),
        ("/viz/camera_2/image/compressed",
         ImageMsg(Header(stamp=1.2, frame_id="camera_2"),
                  np.frombuffer(prog, np.uint8), encoding="jpeg")),
    ]
    path = str(tmp_path / "cams.bag")
    assert write_bag(path, msgs) == 3
    out = list(read_bag(path))
    assert len(out) == 3
    by_topic = {topic: m for _, topic, m in out}
    dec = by_topic["/viz/camera_0/image/compressed"]
    assert dec.encoding == "rgb8" and dec.data.shape == img.shape
    rms = np.sqrt(((dec.data.astype(int) - img.astype(int)) ** 2).mean())
    assert rms < 30.0  # random noise at q92: quantization error only
    keep = by_topic["/viz/camera_1/image/compressed"]
    assert keep.encoding == "jpeg" and bytes(keep.data) == LOSSLESS_STUB
    pm = by_topic["/viz/camera_2/image/compressed"]
    assert pm.encoding == "rgb8"
    np.testing.assert_array_equal(pm.data, prog_oracle)

    # bag -> bag copy: decoded pixels re-compress into their original
    # container (CompressedImage at compressed size), not raw Image
    copy_path = str(tmp_path / "copy.bag")
    assert write_bag(copy_path, [(t, m) for _, t, m in out]) == 3
    assert os.path.getsize(copy_path) < 4 * os.path.getsize(path)
    out2 = {topic: m for _, topic, m in read_bag(copy_path)}
    dec2 = out2["/viz/camera_0/image/compressed"]
    assert dec2.encoding == "rgb8" and dec2.data.shape == img.shape
    rms2 = np.sqrt(((dec2.data.astype(int) - img.astype(int)) ** 2).mean())
    # transcode re-encodes at 4:2:0 (the camera-stream default): on pure
    # random noise the 2x2 chroma average discards per-pixel chroma by
    # design — the adversarial case (structured content transcodes at
    # rms ~3, pinned below on camera_2). Luma must stay q-error only.
    assert rms2 < 65.0

    def _luma(a):
        a = np.asarray(a, np.float64)
        return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]

    yerr = np.abs(_luma(dec2.data) - _luma(dec.data)).mean()
    assert yerr < 12.0, yerr  # luma is NOT subsampled: q-error only
    assert bytes(out2["/viz/camera_1/image/compressed"].data) == LOSSLESS_STUB
    pm2 = out2["/viz/camera_2/image/compressed"]
    assert pm2.encoding == "rgb8"  # progressive -> baseline transcode on copy
    rms3 = np.sqrt(
        ((pm2.data.astype(int) - prog_oracle.astype(int)) ** 2).mean())
    assert rms3 < 12.0  # one q90 transcode generation on camera content


def test_bag_image_decoding_toggle(tmp_path):
    """set_image_decoding(False) restores passthrough delivery (replays
    that only need clouds/paths skip the decode cost)."""
    from trajectory_optimization_tpu.bus.jpeg import encode_jpeg
    from trajectory_optimization_tpu.bus.messages import Header, ImageMsg
    from trajectory_optimization_tpu.bus.rosbag import (
        read_bag,
        set_image_decoding,
        write_bag,
    )

    rng = np.random.default_rng(14)
    jpg = encode_jpeg(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
    path = str(tmp_path / "img.bag")
    write_bag(path, [("/cam", ImageMsg(Header(stamp=1.0, frame_id="c"),
                                       np.frombuffer(jpg, np.uint8),
                                       encoding="jpeg"))])
    prev = set_image_decoding(False)
    try:
        [(_, _, m)] = list(read_bag(path))
        assert m.data.ndim == 1 and bytes(m.data) == jpg
    finally:
        set_image_decoding(prev)
    [(_, _, m)] = list(read_bag(path))
    assert m.data.ndim == 3 and m.wire_format == "jpeg"


@pytest.mark.parametrize("backend", ["numpy", "native"])
def test_jpeg_fuzz_mutations(backend):
    """Robustness: random byte mutations of a valid stream must decode or
    raise JpegError — never crash, hang, or read out of bounds (the native
    path runs in-process; a bounds bug here is a segfault, and one was
    found this way: SOS table ids 4-15 indexed a 4-entry array)."""
    if backend == "native" and not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(99)
    decode = decode_jpeg if backend == "numpy" else jpeg_decode_native
    for name in ("rgb_q85_420.jpg", "progressive.jpg"):
        data, _ = _fixture(name)
        for trial in range(150):
            buf = bytearray(data)
            for _ in range(rng.integers(1, 6)):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
            try:
                out = decode(bytes(buf))
                assert out.dtype == np.uint8 and out.ndim in (2, 3)
            except JpegError:
                pass  # malformed/unsupported is the expected failure mode
        # truncations at every region of the stream
        for cut in range(2, len(data), max(1, len(data) // 64)):
            try:
                decode(data[:cut])
            except JpegError:
                pass


def test_jpeg_fuzz_backends_agree():
    """Differential fuzz: the NumPy and C++ decoders are designed to agree
    even on corrupt streams (int32 predictor wrap, shared error points) —
    a mutation where one backend decodes and the other errors, or where
    both decode to different pixels, is a divergence bug."""
    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(123)
    for name in ("rgb_q85_420.jpg", "progressive.jpg"):
        data, _ = _fixture(name)
        for trial in range(80):
            buf = bytearray(data)
            for _ in range(rng.integers(1, 6)):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
            raw = bytes(buf)
            try:
                py = decode_jpeg(raw)
            except JpegError:
                py = None
            try:
                cc = jpeg_decode_native(raw)
            except JpegError:
                cc = None
            if py is None or cc is None:
                assert py is None and cc is None, (name, trial)
            else:
                np.testing.assert_array_equal(py, cc, err_msg=f"{name} #{trial}")


def test_jpeg_single_component_subsampled_noninterleaved():
    """T.81 A.2.2: an ns==1 scan is ALWAYS non-interleaved — a grayscale
    frame declaring sampling factors h=v=2 still codes one block per MCU
    over the true ceil(w/8) x ceil(h/8) grid (for nf=1 the component spans
    the full image regardless of h,v since h/hmax == 1). Routing such
    frames to the interleaved fast path desyncs the bitstream on files
    libjpeg/PIL decode fine (regression: dispatch in bus/jpeg.py and
    trajopt_native.cpp::decode_all)."""
    from trajectory_optimization_tpu.bus.jpeg import encode_jpeg

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (23, 17), dtype=np.uint8)  # odd dims on purpose
    data = encode_jpeg(img, quality=90)
    idx = data.find(b"\xff\xc0")
    assert idx >= 0 and data[idx + 11] == 0x11  # SOF0 comp-0 sampling byte
    patched = bytes(bytearray(data[:idx + 11]) + b"\x22" + data[idx + 12:])
    ref = decode_jpeg(data)
    np.testing.assert_array_equal(decode_jpeg(patched), ref)
    if native_available():
        np.testing.assert_array_equal(jpeg_decode_native(patched), ref)


def test_png_fuzz_mutations():
    data, _ = _fixture("rgb.png")
    rng = np.random.default_rng(100)
    for trial in range(150):
        buf = bytearray(data)
        for _ in range(rng.integers(1, 6)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        try:
            out = decode_png(bytes(buf))
            assert out.ndim in (2, 3)
        except PngError:
            pass
    for cut in range(1, len(data), max(1, len(data) // 64)):
        try:
            decode_png(data[:cut])
        except PngError:
            pass


# ---------------------------------------------------------------------------
# live library-oracle sweeps (stronger coverage where PIL/cv2 exist)
# ---------------------------------------------------------------------------

PIL = pytest.importorskip("PIL.Image", reason="PIL oracle not available")


def _structured_image(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 // w), (yy * 255 // h), ((xx + yy) % 256)], -1)
    img = img + rng.integers(-20, 20, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("quality", [95, 80, 50])
@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_jpeg_vs_live_pil_oracle(quality, subsampling):
    import io

    from PIL import Image

    rng = np.random.default_rng(quality * 10 + subsampling)
    # odd dims exercise MCU edge cropping on every sampling layout
    img = _structured_image(rng, 61, 83)
    b = io.BytesIO()
    Image.fromarray(img).save(b, "JPEG", quality=quality, subsampling=subsampling)
    data = b.getvalue()
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    # both backends reproduce libjpeg's integer pipeline bit-for-bit
    # (islow IDCT + fancy upsample + 16.16 color), odd dims included
    np.testing.assert_array_equal(decode_jpeg(data), ref)
    if native_available():
        np.testing.assert_array_equal(jpeg_decode_native(data), ref)


@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_jpeg_progressive_vs_live_pil_oracle(subsampling):
    """SOF2 spectral-selection + successive-approximation scans decode
    bit-identically to libjpeg in both backends (odd dims, all sampling
    layouts, gray, and progressive-with-restart via cv2 when present)."""
    import io

    from PIL import Image

    rng = np.random.default_rng(500 + subsampling)
    img = _structured_image(rng, 61, 83)
    b = io.BytesIO()
    Image.fromarray(img).save(b, "JPEG", quality=80, subsampling=subsampling,
                              progressive=True)
    data = b.getvalue()
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(decode_jpeg(data), ref)
    if native_available():
        np.testing.assert_array_equal(jpeg_decode_native(data), ref)
    if subsampling == 0:
        g = io.BytesIO()
        Image.fromarray(img[..., 0]).save(g, "JPEG", quality=85,
                                          progressive=True)
        gdata = g.getvalue()
        gref = np.asarray(Image.open(io.BytesIO(gdata)).convert("L"))
        np.testing.assert_array_equal(decode_jpeg(gdata), gref)
        if native_available():
            np.testing.assert_array_equal(jpeg_decode_native(gdata), gref)
    try:
        import cv2
    except ImportError:
        return
    flags = [cv2.IMWRITE_JPEG_QUALITY, 80, cv2.IMWRITE_JPEG_PROGRESSIVE, 1,
             cv2.IMWRITE_JPEG_RST_INTERVAL, 2]
    ok, enc = cv2.imencode(".jpg", img[..., ::-1], flags)
    assert ok
    rdata = enc.tobytes()
    rref = np.asarray(Image.open(io.BytesIO(rdata)).convert("RGB"))
    np.testing.assert_array_equal(decode_jpeg(rdata), rref)
    if native_available():
        np.testing.assert_array_equal(jpeg_decode_native(rdata), rref)


def test_encoders_vs_live_pil_decode():
    """Independent-implementation check: PIL (libjpeg/libpng) decodes our
    encoders' streams and agrees with our own decode."""
    import io

    from PIL import Image

    from trajectory_optimization_tpu.bus.jpeg import encode_jpeg
    from trajectory_optimization_tpu.bus.png import encode_png

    rng = np.random.default_rng(21)
    img = _structured_image(rng, 37, 51)
    data = encode_jpeg(img, quality=88)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(decode_jpeg(data), pil)
    # 4:2:0 too: a spec misinterpretation shared by our encoder AND
    # decoder (MCU block order, sampling semantics) would round-trip
    # internally — only an external decoder catches it
    d420 = encode_jpeg(img, quality=88, subsampling="420")
    pil420 = np.asarray(Image.open(io.BytesIO(d420)).convert("RGB"))
    np.testing.assert_array_equal(decode_jpeg(d420), pil420)
    pdata = encode_png(img)
    np.testing.assert_array_equal(
        np.asarray(Image.open(io.BytesIO(pdata)).convert("RGB")), img)
    g16 = rng.integers(0, 65536, (19, 27), dtype=np.uint16)
    p16 = np.asarray(Image.open(io.BytesIO(encode_png(g16))))
    np.testing.assert_array_equal(p16, g16)


def test_png_vs_live_roundtrip():
    import io

    from PIL import Image

    rng = np.random.default_rng(7)
    img = _structured_image(rng, 41, 53)
    b = io.BytesIO()
    Image.fromarray(img).save(b, "PNG")
    np.testing.assert_array_equal(decode_png(b.getvalue()), img)
    # RGBA and gray
    rgba = rng.integers(0, 256, (17, 23, 4), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(rgba, "RGBA").save(b, "PNG")
    np.testing.assert_array_equal(decode_png(b.getvalue()), rgba)
    g = img[:, :, 0]
    b = io.BytesIO()
    Image.fromarray(g).save(b, "PNG")
    np.testing.assert_array_equal(decode_png(b.getvalue()), g)
