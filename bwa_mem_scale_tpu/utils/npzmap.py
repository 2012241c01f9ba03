"""Memory-mapped access to uncompressed .npz archives.

Index artifacts here are multi-GB .npz files written with np.savez
(store, no deflate) — hg38's .tpuidx.npz is ~22 GB, its EMF table
~20 GB. np.load copies every member into fresh memory before the
first batch can run; at genome scale that is minutes of pure memcpy
and doubles peak RSS. The members of a STORED zip are contiguous
byte ranges, so each .npy payload can be np.memmap'ed in place:
open cost is microseconds, pages fault in as they are touched, and
the OS page cache (or tmpfs staging, store.py) makes repeat opens
free — the same effect as the reference serving its index from
bwa_shm (src/bwa_shm.cpp:1585-1770) without a copy.

Falls back to np.load semantics for compressed or fortran-order
members. Multi-GB arrays that feed jnp.asarray uploads work fine
from a memmap (the upload streams from the mapping).
"""

from __future__ import annotations

import struct
import zipfile
from typing import Dict

import numpy as np


def _member_data_offset(f, header_offset: int) -> int:
    """Byte offset of a member's payload from its LOCAL file header
    (the central directory's name/extra lengths can differ)."""
    f.seek(header_offset)
    hdr = f.read(30)
    if len(hdr) != 30 or hdr[:4] != b"PK\x03\x04":
        raise ValueError("bad local file header")
    name_len, extra_len = struct.unpack("<HH", hdr[26:30])
    return header_offset + 30 + name_len + extra_len


def load_npz_mmap(path: str) -> Dict[str, np.ndarray]:
    """Load an .npz as {name: array}, memory-mapping every stored
    (uncompressed) C-order member; small/compressed members are read
    normally. Returned arrays are read-only views."""
    out: Dict[str, np.ndarray] = {}
    fallback = []
    with zipfile.ZipFile(path) as z, open(path, "rb") as f:
        for info in z.infolist():
            name = info.filename
            key = name[:-4] if name.endswith(".npy") else name
            if info.compress_type != zipfile.ZIP_STORED:
                fallback.append((name, key))
                continue
            data_off = _member_data_offset(f, info.header_offset)
            f.seek(data_off)
            version = np.lib.format.read_magic(f)
            if version == (1, 0):
                shape, fortran, dtype = \
                    np.lib.format.read_array_header_1_0(f)
            elif version == (2, 0):
                shape, fortran, dtype = \
                    np.lib.format.read_array_header_2_0(f)
            else:
                fallback.append((name, key))
                continue
            if fortran or dtype.hasobject:
                fallback.append((name, key))
                continue
            payload_off = f.tell()
            if int(np.prod(shape, dtype=np.int64)) == 0:
                out[key] = np.empty(shape, dtype=dtype)
            else:
                out[key] = np.memmap(path, dtype=dtype, mode="r",
                                     offset=payload_off, shape=shape)
        if fallback:
            with np.load(path) as zz:
                for name, key in fallback:
                    out[key] = zz[key]
    return out
