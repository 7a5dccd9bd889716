"""GIF89a codec: self-roundtrip, LZW stress, live PIL oracle.

The reference documents every demo mode with an rviz-recorded GIF
(`/root/reference/README.md:27,52,64,71,80`); bus/gif.py packages headless
renders into the same artifact. Same test discipline as the JPEG/PNG
codecs (tests/test_image_codec.py): runtime code is library-free, PIL
serves as the independent-implementation oracle where present.
"""
import io

import numpy as np
import pytest

from trajectory_optimization_tpu.bus.gif import (
    GifError,
    decode_gif,
    encode_gif,
    median_cut_palette,
    quantize_to_palette,
)


def _checker(h, w, colors, block=4):
    """Deterministic multi-color checkerboard frame (H, W, 3) uint8."""
    yy, xx = np.mgrid[0:h, 0:w]
    idx = ((yy // block) + (xx // block)) % len(colors)
    return np.asarray(colors, np.uint8)[idx]


def test_index_frame_roundtrip_exact():
    """Palette-index frames survive encode→decode bit-exactly (no
    quantization in the loop)."""
    rng = np.random.default_rng(0)
    pal = rng.integers(0, 256, (256, 3), np.uint8)
    frames = [rng.integers(0, 256, (37, 53), np.uint8) for _ in range(3)]
    buf = encode_gif(frames, palette=pal, delay_cs=7)
    out, delays = decode_gif(buf)
    assert len(out) == 3 and delays == [7, 7, 7]
    for f, o in zip(frames, out):
        np.testing.assert_array_equal(o, pal[f])


def test_lzw_table_overflow_and_width_growth():
    """A large noise frame forces LZW through every code width up to 12
    bits and multiple CLEAR/reset cycles — the classic off-by-one trap."""
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, (256, 3), np.uint8)
    frame = rng.integers(0, 256, (200, 300), np.uint8)
    buf = encode_gif([frame], palette=pal)
    out, _ = decode_gif(buf)
    np.testing.assert_array_equal(out[0], pal[frame])


def test_small_palette_min_code_size():
    """2-color palettes still use the spec minimum LZW code size of 2."""
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    frame = (np.arange(64 * 64).reshape(64, 64) % 2).astype(np.uint8)
    out, _ = decode_gif(encode_gif([frame], palette=pal))
    np.testing.assert_array_equal(out[0], pal[frame])


def test_rgb_quantized_roundtrip():
    """RGB frames: palette colors are reproduced exactly; off-palette
    pixels land within the 32³-cube quantization bound."""
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    frames = [_checker(40, 60, colors), _checker(40, 60, colors[::-1])]
    buf = encode_gif(frames, delay_cs=12)
    out, delays = decode_gif(buf)
    assert delays == [12, 12]
    for f, o in zip(frames, out):
        # pure-color frames: median cut must recover the colors exactly
        np.testing.assert_array_equal(o, f)


def test_quantize_error_bound():
    rng = np.random.default_rng(2)
    frame = rng.integers(0, 256, (64, 64, 3), np.uint8)
    pal = median_cut_palette([frame], 256)
    idx = quantize_to_palette(frame, pal)
    err = np.abs(pal[idx].astype(int) - frame.astype(int))
    # 256 boxes over 4096 distinct random colors: coarse, but bounded —
    # exact-nearest error plus <=4/channel from the lookup cube
    assert err.mean() < 24 and err.max() <= 128


def test_palette_shared_across_frames():
    """One global palette: every frame's decode uses the same color table
    (flicker-free animation)."""
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (16, 16, 3), np.uint8) for _ in range(4)]
    buf = encode_gif(frames)
    # exactly one color table: the global one (no 0x80 local-table flags)
    out, _ = decode_gif(buf)
    assert len(out) == 4


def test_malformed_streams_raise():
    with pytest.raises(GifError):
        decode_gif(b"JFIF not a gif")
    with pytest.raises(GifError):
        decode_gif(b"GIF89a" + b"\x00" * 4)  # truncated descriptor
    buf = encode_gif([np.zeros((8, 8), np.uint8)],
                     palette=np.zeros((2, 3), np.uint8))
    with pytest.raises(GifError):
        decode_gif(buf[: len(buf) // 2])  # truncated mid-frame
    with pytest.raises(GifError):
        encode_gif([])
    with pytest.raises(GifError):
        encode_gif([np.zeros((4, 4), np.uint8)])  # index frames need palette
    with pytest.raises(GifError):
        encode_gif([np.zeros((4, 4, 3), np.uint8),
                    np.zeros((5, 4, 3), np.uint8)])  # shape mismatch
    # RGBA must be rejected, not silently quantized with misaligned
    # triples (reshape(-1, 3) over 4-channel pixels scrambles colors)
    with pytest.raises(GifError):
        encode_gif([np.zeros((9, 8, 4), np.uint8)])
    with pytest.raises(GifError):
        encode_gif([np.zeros((8, 8, 4), np.uint8)])  # reshape would raise


def test_palette_sample_spans_all_frames():
    """median_cut_palette's deterministic sampling must cover the WHOLE
    pixel range — floor-division striding used to starve trailing frames
    (a 120k-px frame sampled only its top rows)."""
    top = np.full((150, 400, 3), (255, 0, 0), np.uint8)
    bottom = np.full((150, 400, 3), (0, 0, 255), np.uint8)
    frame = np.concatenate([top, bottom])  # 120k px: len//sample == 1
    pal = median_cut_palette([frame], 8)
    idx = quantize_to_palette(frame, pal)
    err = np.abs(pal[idx].astype(int) - frame.astype(int))
    assert err.max() <= 8  # both color families must be in the palette


def test_index_frame_out_of_palette_raises():
    """An index ≥ len(palette) would collide with the LZW CLEAR/EOI codes
    or emit undecodable color references — the encoder must refuse."""
    pal = np.zeros((4, 3), np.uint8)
    with pytest.raises(GifError):
        encode_gif([np.full((4, 4), 5, np.uint8)], palette=pal)
    pal200 = np.zeros((200, 3), np.uint8)
    with pytest.raises(GifError):
        encode_gif([np.full((4, 4), 230, np.uint8)], palette=pal200)


def test_oversized_image_rect_raises_giferror():
    """A frame rect escaping the logical screen is malformed input and must
    raise GifError (module contract), not a numpy broadcast error."""
    pal = np.zeros((2, 3), np.uint8)
    buf = bytearray(encode_gif([np.zeros((8, 8), np.uint8)], palette=pal))
    # image descriptor: 0x2C + <HHHH left top w h>; widen w to W+1
    pos = buf.index(0x2C, 13)
    import struct as _struct

    _struct.pack_into("<H", buf, pos + 5, 9)
    with pytest.raises(GifError):
        decode_gif(bytes(buf))


def test_gif_fuzz_mutations():
    """Random byte mutations / truncations of a valid stream must decode
    or raise GifError — never crash, hang, or index out of bounds (same
    harness that caught real bugs in the JPEG decoders)."""
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
              for _ in range(3)]
    data = encode_gif(frames, n_colors=32)
    for _ in range(200):
        buf = bytearray(data)
        for _ in range(rng.integers(1, 6)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        try:
            out, delays = decode_gif(bytes(buf))
            assert all(f.dtype == np.uint8 and f.ndim == 3 for f in out)
        except GifError:
            pass  # malformed is the expected failure mode
    for cut in range(1, len(data), max(1, len(data) // 64)):
        try:
            decode_gif(data[:cut])
        except GifError:
            pass


def test_delay_resets_without_gce():
    """A graphic-control extension applies to exactly one image: a frame
    without its own GCE gets delay 0, not the previous frame's."""
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    f = (np.arange(64).reshape(8, 8) % 2).astype(np.uint8)
    one = encode_gif([f], palette=pal, delay_cs=50, loop=None)
    # splice a second image block in WITHOUT a preceding GCE
    img_start = one.index(0x2C, 13)
    frame_blocks = one[img_start:-1]  # image descriptor..data (minus trailer)
    spliced = one[:-1] + frame_blocks + b"\x3b"
    frames, delays = decode_gif(spliced)
    assert len(frames) == 2
    assert delays == [50, 0]


# ---------------------------------------------------------------------------
# live PIL oracle (same gate as the JPEG/PNG live sweeps)

PIL = pytest.importorskip("PIL.Image", reason="PIL oracle not available")


def test_pil_decodes_our_gif_exactly():
    """Independent-implementation check: PIL's GIF reader recovers our
    frames and timing bit-exactly."""
    from PIL import Image, ImageSequence

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (64, 3), np.uint8)
    frames = [rng.integers(0, 64, (33, 47), np.uint8) for _ in range(3)]
    buf = encode_gif(frames, palette=pal, delay_cs=25, loop=0)
    im = Image.open(io.BytesIO(buf))
    got = [np.asarray(f.convert("RGB")) for f in ImageSequence.Iterator(im)]
    assert len(got) == 3
    for f, o in zip(frames, got):
        np.testing.assert_array_equal(o, pal[f])
    assert im.info.get("duration") == 250  # PIL reports ms
    assert im.info.get("loop") == 0


def test_we_decode_pil_gif_exactly():
    """Our decoder reads a PIL-written animated GIF (palette frames,
    durations) back to the same pixels PIL itself reports."""
    from PIL import Image, ImageSequence

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (24, 31, 3), np.uint8) for _ in range(3)]
    bio = io.BytesIO()
    ims = [Image.fromarray(f).quantize(colors=128) for f in frames]
    ims[0].save(bio, format="GIF", save_all=True, append_images=ims[1:],
                duration=40, loop=0)
    buf = bio.getvalue()
    ours, delays = decode_gif(buf)
    im = Image.open(io.BytesIO(buf))
    theirs = [np.asarray(f.convert("RGB")) for f in ImageSequence.Iterator(im)]
    assert len(ours) == len(theirs) == 3
    for a, b in zip(ours, theirs):
        np.testing.assert_array_equal(a, b)
    assert all(d == 4 for d in delays)  # 40 ms = 4 cs
