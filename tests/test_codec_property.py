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
