"""np4 flow-blob codec: LZ4-frame + msgpack of {d, t, s}.

Format parity: reference mmaction/utils/data_transform.py:7-19 —
``lz4.frame.decompress(buf)`` then ``msgpack.unpackb`` to a dict with raw
bytes ``d``, dtype string ``t`` and shape ``s``; the encoder mirrors
tools/misc/flow_extraction_meg.py:102-119.

The LZ4 codec itself is the framework's native C++ component
(native/lz4codec.cpp, built on demand with g++ and loaded via ctypes); a
pure-Python LZ4-frame implementation is the fallback so everything works
without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import struct
import subprocess
from typing import Optional

import msgpack
import numpy as np

_REPO_ROOT = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
_SRC = osp.join(_REPO_ROOT, 'native', 'lz4codec.cpp')
_LIB_PATH = osp.join(_REPO_ROOT, 'native', 'liblz4codec.so')

_lib = None
_lib_tried = False


def _load_native():
    """Load (building if necessary) the C++ LZ4 codec. Returns None if
    unavailable — callers fall back to the Python implementation."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not osp.exists(_LIB_PATH) or (
                osp.exists(_SRC) and
                os.stat(_SRC).st_mtime > os.stat(_LIB_PATH).st_mtime):
            if not osp.exists(_SRC):
                return None
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', '-o', _LIB_PATH, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lz4f_decompress.restype = ctypes.c_int64
        lib.lz4f_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t]
        lib.lz4f_compress.restype = ctypes.c_int64
        lib.lz4f_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t]
        lib.lz4f_compress_bound.restype = ctypes.c_size_t
        lib.lz4f_compress_bound.argtypes = [ctypes.c_size_t]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


# ---------------------------------------------------------------- python lz4
def _py_block_decompress(src: bytes, out: bytearray) -> None:
    ip, n = 0, len(src)
    while ip < n:
        token = src[ip]
        ip += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                s = src[ip]
                ip += 1
                lit_len += s
                if s != 255:
                    break
        out += src[ip:ip + lit_len]
        ip += lit_len
        if ip >= n:
            break
        offset = src[ip] | (src[ip + 1] << 8)
        ip += 2
        match_len = token & 0x0F
        if match_len == 15:
            while True:
                s = src[ip]
                ip += 1
                match_len += s
                if s != 255:
                    break
        match_len += 4
        start = len(out) - offset
        if offset >= match_len:
            out += out[start:start + match_len]
        else:
            for i in range(match_len):
                out.append(out[start + i])


def _py_frame_decompress(buf: bytes) -> bytes:
    if len(buf) < 7 or struct.unpack('<I', buf[:4])[0] != 0x184D2204:
        raise ValueError('not an LZ4 frame')
    ip = 4
    flg = buf[ip]
    ip += 2  # FLG + BD
    if (flg >> 6) != 1:
        raise ValueError('unsupported LZ4 frame version')
    block_checksum = (flg >> 4) & 1
    if (flg >> 3) & 1:
        ip += 8
    if flg & 1:
        ip += 4
    ip += 1  # header checksum
    out = bytearray()
    while True:
        block_size = struct.unpack('<I', buf[ip:ip + 4])[0]
        ip += 4
        if block_size == 0:
            break
        uncompressed = block_size >> 31
        block_size &= 0x7FFFFFFF
        block = buf[ip:ip + block_size]
        ip += block_size
        if uncompressed:
            out += block
        else:
            _py_block_decompress(block, out)
        if block_checksum:
            ip += 4
    return bytes(out)


def _py_xxh32(data: bytes, seed: int = 0) -> int:
    p1, p2, p3, p4, p5 = (2654435761, 2246822519, 3266489917,
                          668265263, 374761393)
    mask = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & mask

    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + p1 + p2) & mask
        v2 = (seed + p2) & mask
        v3 = seed & mask
        v4 = (seed - p1) & mask
        while i + 16 <= n:
            for _ in range(4):
                (lane,) = struct.unpack_from('<I', data, i)
                if _ == 0:
                    v1 = (rotl((v1 + lane * p2) & mask, 13) * p1) & mask
                elif _ == 1:
                    v2 = (rotl((v2 + lane * p2) & mask, 13) * p1) & mask
                elif _ == 2:
                    v3 = (rotl((v3 + lane * p2) & mask, 13) * p1) & mask
                else:
                    v4 = (rotl((v4 + lane * p2) & mask, 13) * p1) & mask
                i += 4
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & mask
    else:
        h = (seed + p5) & mask
    h = (h + n) & mask
    while i + 4 <= n:
        (lane,) = struct.unpack_from('<I', data, i)
        h = (rotl((h + lane * p3) & mask, 17) * p4) & mask
        i += 4
    while i < n:
        h = (rotl((h + data[i] * p5) & mask, 11) * p1) & mask
        i += 1
    h ^= h >> 15
    h = (h * p2) & mask
    h ^= h >> 13
    h = (h * p3) & mask
    h ^= h >> 16
    return h


def _py_frame_compress(data: bytes) -> bytes:
    """Valid LZ4 frame using uncompressed blocks only (fallback writer)."""
    flg = (1 << 6) | (1 << 5) | (1 << 3)
    header = bytes([flg, 7 << 4]) + struct.pack('<Q', len(data))
    hc = (_py_xxh32(header) >> 8) & 0xFF
    out = bytearray(struct.pack('<I', 0x184D2204) + header + bytes([hc]))
    k_block = 4 << 20
    for off in range(0, len(data), k_block):
        chunk = data[off:off + k_block]
        out += struct.pack('<I', len(chunk) | 0x80000000)
        out += chunk
    if not data:
        pass
    out += struct.pack('<I', 0)
    return bytes(out)


# -------------------------------------------------------------- public API
def lz4_frame_decompress(buf: bytes, expected_size: Optional[int] = None
                         ) -> bytes:
    lib = _load_native()
    if lib is not None:
        # content-size field (if present) bounds the output buffer;
        # otherwise fall back to a generous multiple.
        cap = expected_size
        if cap is None:
            flg = buf[4]
            if (flg >> 3) & 1:
                ip = 6
                cap = struct.unpack('<Q', buf[ip:ip + 8])[0]
            else:
                cap = max(len(buf) * 64, 1 << 20)
        out = ctypes.create_string_buffer(max(int(cap), 1))
        n = lib.lz4f_decompress(buf, len(buf), out, len(out))
        if n >= 0:
            return out.raw[:n]
    return _py_frame_decompress(buf)


def lz4_frame_compress(data: bytes) -> bytes:
    lib = _load_native()
    if lib is not None:
        cap = lib.lz4f_compress_bound(len(data))
        out = ctypes.create_string_buffer(int(cap))
        n = lib.lz4f_compress(data, len(data), out, cap)
        if n >= 0:
            return out.raw[:n]
    return _py_frame_compress(data)


def np4_encode(arr: np.ndarray) -> bytes:
    """ndarray -> np4 blob (parity: flow_extraction_meg.py:102-119)."""
    payload = msgpack.packb({
        'd': arr.tobytes(),
        't': str(arr.dtype),
        's': list(arr.shape),
    }, use_bin_type=True)
    return lz4_frame_compress(payload)


def np4_decode(buf: bytes) -> Optional[np.ndarray]:
    """np4 blob -> ndarray; None on failure
    (parity: utils/data_transform.py:7-19)."""
    try:
        pb = lz4_frame_decompress(buf)
        p = msgpack.unpackb(pb, raw=False, strict_map_key=False)
    except Exception:
        return None
    d = p['d'] if 'd' in p else p[b'd']
    t = p['t'] if 't' in p else p[b't']
    s = p['s'] if 's' in p else p[b's']
    return np.frombuffer(d, dtype=t).reshape(s)
