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
