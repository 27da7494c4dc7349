"""Property-based round-trips for the pure-stdlib media codecs.

PNG/GIF/WAV are lossless: decode(encode(x)) must equal x bit-for-bit for
ARBITRARY payloads. JPEG at q=1 keeps every DCT coefficient, so the only
error budget is float rounding (≤1 gray level); constant 8×8 blocks must
round-trip exactly. No Spark needed — these run in milliseconds."""

from hypothesis import given, settings, strategies as st

from illumio_spark.functions import multimodal as MM

_dims = st.tuples(st.integers(1, 24), st.integers(1, 16))


@settings(max_examples=30, deadline=None)
@given(dims=_dims, data=st.data())
def test_png_roundtrip_any_image(dims, data):
    w, h = dims
    vals = data.draw(
        st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)
    )
    assert MM.decode_png_gray8(MM.encode_png_gray8(w, h, vals)) == vals


@settings(max_examples=30, deadline=None)
@given(dims=_dims, data=st.data())
def test_gif_roundtrip_any_image(dims, data):
    w, h = dims
    vals = data.draw(
        st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)
    )
    assert MM.decode_gif_gray(MM.encode_gif_gray8(w, h, vals)) == vals


@settings(max_examples=20, deadline=None)
@given(samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
       rate=st.integers(8000, 48000))
def test_wav_roundtrip_any_samples(samples, rate):
    assert MM.decode_wav_pcm16(MM.encode_wav_pcm16(samples, rate)) == samples


@settings(max_examples=20, deadline=None)
@given(dims=_dims, data=st.data())
def test_jpeg_q1_within_one_gray_level(dims, data):
    w, h = dims
    vals = data.draw(
        st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)
    )
    dec = MM.decode_jpeg_gray8(MM.encode_jpeg_gray8(w, h, vals))
    assert len(dec) == len(vals)
    assert max((abs(a - b) for a, b in zip(dec, vals)), default=0) <= 1


@settings(max_examples=20, deadline=None)
@given(nb=st.tuples(st.integers(1, 4), st.integers(1, 3)), data=st.data())
def test_jpeg_constant_blocks_exact(nb, data):
    nbx, nby = nb
    w, h = nbx * 8, nby * 8
    blocks = data.draw(
        st.lists(st.integers(0, 255), min_size=nbx * nby, max_size=nbx * nby)
    )
    vals = [blocks[(y // 8) * nbx + (x // 8)] for y in range(h) for x in range(w)]
    assert MM.decode_jpeg_gray8(MM.encode_jpeg_gray8(w, h, vals)) == vals


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=30000))
def test_gif_lzw_roundtrip_any_bytes(data):
    assert MM._lzw_decode_gif(MM._lzw_encode_gif(data, 8), 8) == data


@settings(max_examples=20, deadline=None)
@given(dims=_dims, data=st.data(), interval=st.integers(1, 5))
def test_jpeg_restart_markers_roundtrip(dims, data, interval):
    # DRI/RSTn path (real files commonly carry restart intervals): byte
    # realign + DC predictor reset must reproduce the no-marker decode
    w, h = dims
    vals = data.draw(
        st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)
    )
    plain = MM.decode_jpeg_gray8(MM.encode_jpeg_gray8(w, h, vals))
    with_rst = MM.decode_jpeg_gray8(
        MM.encode_jpeg_gray8(w, h, vals, restart_interval=interval)
    )
    assert with_rst == plain


@settings(max_examples=10, deadline=None)
@given(data=st.data(), interval=st.integers(1, 3))
def test_jpeg_color_restart_markers_roundtrip(data, interval):
    w, h = 16, 16
    y = data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    cw = ch = 8
    cb = data.draw(st.lists(st.integers(0, 255), min_size=cw * ch, max_size=cw * ch))
    cr = data.draw(st.lists(st.integers(0, 255), min_size=cw * ch, max_size=cw * ch))
    plain = MM.decode_jpeg_ycbcr(MM.encode_jpeg_ycbcr(w, h, y, cb, cr, "420"))
    rst = MM.decode_jpeg_ycbcr(
        MM.encode_jpeg_ycbcr(w, h, y, cb, cr, "420", restart_interval=interval)
    )
    assert rst == plain


def test_gif_first_frame_smaller_than_screen_uses_frame_dims():
    # the ADVICE r4 repro: a valid GIF whose first frame rect is smaller
    # than the logical screen must decode/resize by the FRAME's own dims
    import struct

    fw, fh = 3, 2
    frame = MM.encode_gif_gray8(fw, fh, [10, 20, 30, 40, 50, 60])
    # blow up the logical screen descriptor (bytes 6-9) to 10x8
    forged = frame[:6] + struct.pack("<HH", 10, 8) + frame[10:]
    fmt, w, h, px = MM.decode_gray_image(forged)
    assert (fmt, w, h) == ("gif", fw, fh)
    assert px == [10, 20, 30, 40, 50, 60]
    # resize_gray on the frame's own dims must not raise
    out = MM.resize_gray(px, w, h, 4, 3, "nearest")
    assert len(out) == 12


# ---------------------------------------------------------------------------
# hostile-bytes fuzz (VERDICT r4 task 5): the codecs parse UNTRUSTED
# payloads — random truncations / bit flips / splices of valid streams must
# raise ValueError/NotImplementedError cleanly (or decode), never escape a
# TypeError/IndexError/struct.error and never hang
# ---------------------------------------------------------------------------


def _valid_payloads():
    vals24 = [(p * 37) % 256 for p in range(24)]
    return [
        MM.encode_png_gray8(6, 4, vals24),
        MM.encode_gif_gray8(6, 4, vals24),
        MM.encode_jpeg_gray8(16, 8, [(p * 11) % 256 for p in range(128)]),
        MM.encode_jpeg_gray8(16, 8, [(p * 11) % 256 for p in range(128)],
                             restart_interval=1),
        MM.encode_wav_pcm16([(s * 313) % 65536 - 32768 for s in range(40)], 8000),
    ]


@settings(max_examples=300, deadline=None)
@given(data=st.data())
def test_decoders_never_escape_nonvalue_errors_on_mutated_payloads(data):
    base = bytearray(data.draw(st.sampled_from(_valid_payloads())))
    # truncate and/or corrupt
    cut = data.draw(st.integers(0, len(base)))
    mutated = bytearray(base[:cut]) if data.draw(st.booleans()) else bytearray(base)
    for _ in range(data.draw(st.integers(0, 8))):
        if not mutated:
            break
        pos = data.draw(st.integers(0, len(mutated) - 1))
        mutated[pos] ^= 1 << data.draw(st.integers(0, 7))
    payload = bytes(mutated)
    for fn in (MM.decode_values, MM.decode_gray_image):
        try:
            fn(payload)
        except (ValueError, NotImplementedError):
            pass  # the contract: clean, catchable codec errors only


@settings(max_examples=150, deadline=None)
@given(junk=st.binary(min_size=0, max_size=64), data=st.data())
def test_decoders_never_escape_on_forged_headers(junk, data):
    # junk spliced after a real magic prefix: parser walks garbage structure
    magic = data.draw(st.sampled_from(
        [b"\x89PNG\r\n\x1a\n", b"GIF89a", b"\xff\xd8", b"RIFF"]
    ))
    payload = magic + junk
    for fn in (MM.decode_values, MM.decode_gray_image):
        try:
            fn(payload)
        except (ValueError, NotImplementedError):
            pass


@settings(max_examples=20, deadline=None)
@given(dims=_dims, data=st.data())
def test_gif_interlaced_roundtrip(dims, data):
    # round-5 closure of the interlaced-GIF scope gap: 4-pass Appendix-E
    # row order must decode back to the original raster exactly
    w, h = dims
    vals = data.draw(
        st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h)
    )
    assert MM.decode_gif_gray(MM.encode_gif_gray8(w, h, vals, interlaced=True)) == vals
    # and an interlaced payload decodes identically to its plain twin
    assert MM.decode_gif_gray(MM.encode_gif_gray8(w, h, vals)) == vals


def test_jpeg_16bit_quant_table_decodes():
    # round-5 closure of the 16-bit-DQT scope gap: rewrite a valid q=1
    # 8-bit table as pq=1 (two-byte entries, same values) — the decode
    # must be byte-identical to the 8-bit-table file
    import struct

    vals = [(p * 29) % 256 for p in range(16 * 8)]
    b = MM.encode_jpeg_gray8(16, 8, vals)
    # locate the DQT segment (FF DB, length 67, pq/tq byte, 64 entries)
    i = b.index(b"\xff\xdb")
    (ln,) = struct.unpack(">H", b[i + 2 : i + 4])
    assert ln == 67
    entries = b[i + 5 : i + 5 + 64]
    wide = bytes([0x10]) + b"".join(struct.pack(">H", e) for e in entries)
    new_seg = b"\xff\xdb" + struct.pack(">H", len(wide) + 2) + wide
    b16 = b[:i] + new_seg + b[i + 4 + ln - 2 :]
    assert MM.decode_jpeg_gray8(b16) == MM.decode_jpeg_gray8(b)
