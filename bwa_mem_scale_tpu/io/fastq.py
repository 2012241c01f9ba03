"""FASTQ/FASTA reading and read-batch assembly.

Counterpart of the reference's kseq/bseq reader (src/kseq.h,
src/bwa.cpp:266-336 bseq_read_orig): streams gzip or plain FASTQ into
batches of roughly `chunk_size` base pairs so that results are
independent of device count (the reference's -K determinism anchor).
"""

from __future__ import annotations

import dataclasses
import gzip
import subprocess
from typing import Iterator, List, Optional

import numpy as np

from ..index.bntseq import NT4_TABLE


@dataclasses.dataclass
class Read:
    name: str
    seq: np.ndarray       # uint8 nt4 codes
    qual: Optional[str]
    comment: str = ""


@dataclasses.dataclass
class ReadBatch:
    reads: List[Read]

    def __len__(self):
        return len(self.reads)

    @property
    def total_bp(self) -> int:
        return sum(len(r.seq) for r in self.reads)

    def padded_codes(self, max_len: Optional[int] = None
                     ) -> tuple[np.ndarray, np.ndarray]:
        """(codes [B, L] uint8 padded with 4, lengths [B] int32)."""
        lens = np.array([len(r.seq) for r in self.reads], dtype=np.int32)
        L = int(max_len or (lens.max() if len(lens) else 0))
        codes = np.full((len(self.reads), L), 4, dtype=np.uint8)
        for i, r in enumerate(self.reads):
            codes[i, : len(r.seq)] = r.seq[:L]
        return codes, lens


def _is_url(path: str) -> bool:
    return path.startswith(("http://", "https://", "ftp://"))


def _open_text(path: str):
    if path == "-":
        import sys
        return sys.stdin
    if _is_url(path):
        # kopen's http/ftp sources (src/kopen.cpp) via urllib; .gz
        # URLs are decompressed on the fly
        import io as _io
        import urllib.request
        raw = urllib.request.urlopen(path)
        if path.endswith(".gz"):
            return _io.TextIOWrapper(gzip.GzipFile(fileobj=raw))
        return _io.TextIOWrapper(raw)
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "rt")


def _iter_fastq_native(path: str) -> Iterator[Read]:
    """4-line FASTQ via the native scanner (native/fastq.cpp)."""
    from .native_fastq import scan_chunks
    for ch in scan_chunks(path):
        L = int(ch.seq_len.max()) if ch.n else 0
        codes = ch.encode(L)
        for i in range(ch.n):
            yield Read(name=ch.name(i),
                       seq=codes[i, : ch.seq_len[i]],
                       qual=ch.qual(i), comment=ch.comment(i))


def iter_fastx(path: str) -> Iterator[Read]:
    """Iterate FASTQ or FASTA records. Plain 4-line FASTQ goes through
    the native scanner when available (the reference's kseq path);
    FASTA and anything irregular falls back to the Python parser."""
    if path != "-" and not _is_url(path):
        try:
            with (gzip.open(path, "rb") if path.endswith(".gz")
                  else open(path, "rb")) as probe:
                first = probe.read(1)
            if first == b"@":
                yield from _iter_fastq_native(path)
                return
        except (ImportError, OSError, subprocess.CalledProcessError):
            pass
    yield from _iter_fastx_py(path)


def _iter_fastx_py(path: str) -> Iterator[Read]:
    with _open_text(path) as fh:
        while True:
            line = fh.readline()
            if not line:
                return
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith("@"):
                hdr = line[1:].split(None, 1)
                name = hdr[0]
                comment = hdr[1] if len(hdr) > 1 else ""
                seq = fh.readline().rstrip("\n")
                fh.readline()  # '+'
                qual = fh.readline().rstrip("\n")
                yield Read(name=name,
                           seq=NT4_TABLE[np.frombuffer(seq.encode(),
                                                       dtype=np.uint8)],
                           qual=qual, comment=comment)
            elif line.startswith(">"):
                hdr = line[1:].split(None, 1)
                name = hdr[0]
                comment = hdr[1] if len(hdr) > 1 else ""
                parts = []
                pos = fh.tell()
                while True:
                    nxt = fh.readline()
                    if not nxt or nxt.startswith(">") or nxt.startswith("@"):
                        if nxt:
                            fh.seek(pos)
                        break
                    parts.append(nxt.rstrip("\n"))
                    pos = fh.tell()
                seq = "".join(parts)
                yield Read(name=name,
                           seq=NT4_TABLE[np.frombuffer(seq.encode(),
                                                       dtype=np.uint8)],
                           qual=None, comment=comment)


def read_fastq(path: str, chunk_bp: Optional[int] = None
               ) -> Iterator[ReadBatch]:
    """Yield batches of ~chunk_bp base pairs (all reads if None)."""
    batch: List[Read] = []
    bp = 0
    for r in iter_fastx(path):
        batch.append(r)
        bp += len(r.seq)
        if chunk_bp is not None and bp >= chunk_bp:
            yield ReadBatch(batch)
            batch, bp = [], 0
    if batch:
        yield ReadBatch(batch)
