"""ctypes binding for the native FASTQ scanner (native/fastq.cpp).

Streams gzip or plain FASTQ in large buffers through the C scanner
(the reference's kseq/bseq_read path, src/kseq.h + src/bwa.cpp:266).
Falls back transparently: io/fastq.iter_fastx uses this when the
library builds and the input looks like 4-line FASTQ, else the pure
Python parser.
"""

from __future__ import annotations

import ctypes
import gzip
import os
import subprocess
from typing import Iterator

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastq.so")

_lib = None
_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "fastq.cpp")
        if not os.path.exists(src):
            raise ImportError("native fastq source missing")
        subprocess.check_call(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared",
             "-std=c++17", "-o", _LIB_PATH, src])
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fastq_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        _i64p, _i32p, _i64p, _i32p, _i64p, _i32p, _i64p, _i64p, _i64p]
    lib.fastq_scan.restype = ctypes.c_int64
    lib.fastq_encode.argtypes = [
        ctypes.c_char_p, _i64p, _i32p, ctypes.c_int64, ctypes.c_int32,
        _u8p]
    lib.fastq_encode.restype = None
    _lib = lib
    return lib


class ScannedChunk:
    """One buffer's worth of records (offset views into `buf`)."""

    __slots__ = ("buf", "n", "name_off", "name_len", "com_off",
                 "com_len", "seq_off", "seq_len", "qual_off")

    def __init__(self, buf, n, name_off, name_len, com_off, com_len,
                 seq_off, seq_len, qual_off):
        self.buf = buf
        self.n = n
        self.name_off = name_off
        self.name_len = name_len
        self.com_off = com_off
        self.com_len = com_len
        self.seq_off = seq_off
        self.seq_len = seq_len
        self.qual_off = qual_off

    def encode(self, L: int) -> np.ndarray:
        """All sequences as one padded nt4 matrix [n, L]."""
        lib = _load()
        out = np.empty((self.n, L), dtype=np.uint8)
        lib.fastq_encode(
            self.buf, self.seq_off.ctypes.data_as(_i64p),
            self.seq_len.ctypes.data_as(_i32p), self.n, L,
            out.ctypes.data_as(_u8p))
        return out

    def name(self, i: int) -> str:
        o = self.name_off[i]
        return self.buf[o: o + self.name_len[i]].decode()

    def comment(self, i: int) -> str:
        o = self.com_off[i]
        return self.buf[o: o + self.com_len[i]].decode()

    def qual(self, i: int) -> str:
        o = self.qual_off[i]
        return self.buf[o: o + self.seq_len[i]].decode()


def scan_chunks(path: str, buf_bytes: int = 8 << 20
                ) -> Iterator[ScannedChunk]:
    """Stream a FASTQ file as ScannedChunks. Raises ValueError on the
    first malformed record (callers fall back to the Python parser)."""
    lib = _load()
    fh = gzip.open(path, "rb") if path.endswith(".gz") \
        else open(path, "rb")
    cap = max(buf_bytes // 64, 1024)
    rem = b""
    with fh:
        while True:
            data = fh.read(buf_bytes)
            buf = rem + data if rem else data
            if not buf:
                break
            name_off = np.empty(cap, np.int64)
            name_len = np.empty(cap, np.int32)
            com_off = np.empty(cap, np.int64)
            com_len = np.empty(cap, np.int32)
            seq_off = np.empty(cap, np.int64)
            seq_len = np.empty(cap, np.int32)
            qual_off = np.empty(cap, np.int64)
            consumed = ctypes.c_int64(0)
            err = ctypes.c_int64(-1)
            cnt = lib.fastq_scan(
                buf, len(buf), cap,
                name_off.ctypes.data_as(_i64p),
                name_len.ctypes.data_as(_i32p),
                com_off.ctypes.data_as(_i64p),
                com_len.ctypes.data_as(_i32p),
                seq_off.ctypes.data_as(_i64p),
                seq_len.ctypes.data_as(_i32p),
                qual_off.ctypes.data_as(_i64p),
                ctypes.byref(consumed), ctypes.byref(err))
            if err.value >= 0:
                raise ValueError(
                    f"malformed FASTQ near byte {err.value} of a "
                    f"buffer in {path}")
            if cnt == 0:
                if not data:
                    if buf.strip():
                        raise ValueError(
                            f"truncated FASTQ record at end of {path}")
                    break
                rem = buf
                continue
            yield ScannedChunk(buf, int(cnt), name_off[:cnt],
                               name_len[:cnt], com_off[:cnt],
                               com_len[:cnt], seq_off[:cnt],
                               seq_len[:cnt], qual_off[:cnt])
            rem = buf[consumed.value:]
            if not data and not rem.strip():
                break
