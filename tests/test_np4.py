"""np4 codec tests: roundtrip through the native C++ LZ4 codec and the
Python fallback, plus cross-compatibility between the two."""
import numpy as np
import pytest

from mscl_tpu.utils import np4
from mscl_tpu.utils.np4 import (lz4_frame_compress, lz4_frame_decompress,
                                np4_decode, np4_encode, _py_frame_compress,
                                _py_frame_decompress, _load_native)


@pytest.fixture(params=['native', 'python'])
def codec_mode(request, monkeypatch):
    if request.param == 'native':
        if _load_native() is None:
            pytest.skip('native lz4 codec unavailable')
    else:
        monkeypatch.setattr(np4, '_lib', None)
        monkeypatch.setattr(np4, '_lib_tried', True)
    return request.param


def test_roundtrip_float_flow(codec_mode):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(64, 96, 2)).astype(np.float32)
    blob = np4_encode(arr)
    out = np4_decode(blob)
    assert out.dtype == arr.dtype
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def test_roundtrip_compressible(codec_mode):
    arr = np.zeros((128, 128, 2), dtype=np.float32)
    arr[::2] = 1.5
    blob = np4_encode(arr)
    if codec_mode == 'native':
        assert len(blob) < arr.nbytes // 4  # actually compresses
    assert np.array_equal(np4_decode(blob), arr)


def test_native_decodes_python_frames():
    if _load_native() is None:
        pytest.skip('native lz4 codec unavailable')
    data = bytes(range(256)) * 100
    frame = _py_frame_compress(data)
    assert lz4_frame_decompress(frame) == data


def test_python_decodes_native_frames():
    lib = _load_native()
    if lib is None:
        pytest.skip('native lz4 codec unavailable')
    data = b'abcabcabc' * 1000 + bytes(range(256))
    frame = lz4_frame_compress(data)
    assert _py_frame_decompress(frame) == data


def test_decode_garbage_returns_none():
    assert np4_decode(b'not a frame at all') is None


def test_empty_and_tiny(codec_mode):
    for n in (0, 1, 3, 12, 13):
        arr = np.arange(n, dtype=np.int32)
        assert np.array_equal(np4_decode(np4_encode(arr)), arr)
