"""SAM text output (host side).

Mirrors mem_aln2sam (src/bwamem.cpp:2393-2531) field for field for the
single-end path; mate fields are filled when a mate record is supplied
(paired-end path).
"""

from __future__ import annotations

import copy
from typing import List, Optional

from ..config import MemOptions, MEM_F_SOFTCLIP
from ..ref.finalize import Aln
from ..ref.ksw import cigar_rlen

_FWD = "ACGTN"
_REV = "TGCAN"
# nt4 code -> ASCII base, whole-slice bytes.translate (the SEQ column
# is the one per-base loop on the emit path)
_FWD_TBL = bytes(_FWD.encode()[c] if c < 5 else ord("N")
                 for c in range(256))
_REV_TBL = bytes(_REV.encode()[c] if c < 5 else ord("N")
                 for c in range(256))


def sam_header(bns, rg_line: Optional[str] = None,
               pg_cl: Optional[str] = None) -> str:
    lines = []
    for a in bns.anns:
        lines.append(f"@SQ\tSN:{a.name}\tLN:{a.length}")
    if rg_line:
        lines.append(rg_line)
    lines.append("@PG\tID:bwa-mem-scale-tpu\tPN:bwa-mem-scale-tpu"
                 + (f"\tCL:{pg_cl}" if pg_cl else ""))
    return "\n".join(lines) + "\n"


def _cigar_text(opt: MemOptions, p: Aln, which: int) -> str:
    if not p.cigar:
        return "*"
    parts = []
    for (ln, op) in p.cigar:
        c = op
        if not (opt.flag & MEM_F_SOFTCLIP) and not p.is_alt and c in (3, 4):
            c = 4 if which else 3  # hard clip for supplementary alignments
        parts.append(f"{ln}{'MIDSH'[c]}")
    return "".join(parts)


def aln_to_sam_line(opt: MemOptions, bns, read, n: int, records: List[Aln],
                    which: int, mate: Optional[Aln] = None,
                    rg_id: Optional[str] = None) -> str:
    p = copy.copy(records[which])
    m = copy.copy(mate) if mate is not None else None
    p.flag |= 0x1 if m else 0
    p.flag |= 0x4 if p.rid < 0 else 0
    p.flag |= 0x8 if (m and m.rid < 0) else 0
    if p.rid < 0 and m and m.rid >= 0:  # copy mate position to alignment
        p.rid, p.pos, p.is_rev, p.cigar = m.rid, m.pos, m.is_rev, None
    if m and m.rid < 0 and p.rid >= 0:
        m.rid, m.pos, m.is_rev, m.cigar = p.rid, p.pos, p.is_rev, None
    p.flag |= 0x10 if p.is_rev else 0
    p.flag |= 0x20 if (m and m.is_rev) else 0

    cols = [read.name,
            str((p.flag & 0xFFFF) | (0x100 if p.flag & 0x10000 else 0))]
    if p.rid >= 0:
        cols += [bns.anns[p.rid].name, str(p.pos + 1), str(p.mapq),
                 _cigar_text(opt, p, which)]
    else:
        cols += ["*", "0", "0", "*"]

    # Mate columns.
    if m and m.rid >= 0:
        cols.append("=" if p.rid == m.rid else bns.anns[m.rid].name)
        cols.append(str(m.pos + 1))
        if p.rid == m.rid and p.cigar is not None and m.cigar is not None:
            p0 = p.pos + (cigar_rlen(p.cigar) - 1 if p.is_rev else 0)
            p1 = m.pos + (cigar_rlen(m.cigar) - 1 if m.is_rev else 0)
            tlen = -(p0 - p1 + (1 if p0 > p1 else -1 if p0 < p1 else 0))
            cols.append(str(tlen))
        else:
            cols.append("0")
    else:
        cols += ["*", "0", "0"]

    # SEQ/QUAL with clipping-aware trimming.
    l_seq = len(read.seq)
    if p.flag & 0x100:
        cols += ["*", "*"]
    else:
        qb, qe = 0, l_seq
        if (p.cigar and which and not (opt.flag & MEM_F_SOFTCLIP)
                and not p.is_alt):
            first_op, last_op = p.cigar[0], p.cigar[-1]
            if not p.is_rev:
                if first_op[1] in (3, 4):
                    qb += first_op[0]
                if last_op[1] in (3, 4):
                    qe -= last_op[0]
            else:
                if first_op[1] in (3, 4):
                    qe -= first_op[0]
                if last_op[1] in (3, 4):
                    qb += last_op[0]
        if not p.is_rev:
            cols.append(read.seq[qb:qe].tobytes().translate(_FWD_TBL)
                        .decode("ascii"))
            cols.append(read.qual[qb:qe] if read.qual else "*")
        else:
            cols.append(read.seq[qb:qe][::-1].tobytes()
                        .translate(_REV_TBL).decode("ascii"))
            cols.append(read.qual[qb:qe][::-1] if read.qual else "*")

    tags = []
    if p.cigar:
        tags.append(f"NM:i:{p.NM}")
        tags.append(f"MD:Z:{p.MD}")
    if p.score >= 0:
        tags.append(f"AS:i:{p.score}")
    if p.sub >= 0:
        tags.append(f"XS:i:{p.sub}")
    if rg_id:
        tags.append(f"RG:Z:{rg_id}")
    if not (p.flag & 0x100):
        others = [i for i in range(n)
                  if i != which and not (records[i].flag & 0x100)]
        if others:
            sa = []
            for i in range(n):
                r = records[i]
                if i == which or (r.flag & 0x100):
                    continue
                cig = "".join(f"{ln}{'MIDSH'[op]}" for ln, op in (r.cigar or []))
                sa.append(f"{bns.anns[r.rid].name},{r.pos + 1},"
                          f"{'-' if r.is_rev else '+'},{cig},{r.mapq},{r.NM};")
            tags.append("SA:Z:" + "".join(sa))
        if p.alt_sc > 0:
            tags.append(f"pa:f:{p.score / p.alt_sc:.3f}")
    if p.XA:
        tags.append(f"XA:Z:{p.XA}")
    if read.comment and getattr(opt, "copy_comment", False):
        tags.append(read.comment)   # -C (bseq copy_comment)
    return "\t".join(cols + tags) + "\n"


class _ShimRead:
    __slots__ = ("name", "seq", "qual", "comment")

    def __init__(self, name, seq, qual=None):
        self.name = name
        self.seq = seq
        self.qual = qual
        self.comment = None


def compose_sam_python(opt, bns, codes_row, records, sam_ctx, i,
                       mate=None):
    """Per-read SAM bytes via the Python writer — the fallback/EMF
    route of the native text composer (compose_sam_se)."""
    import numpy as np
    names = sam_ctx.get("names")
    quals = sam_ctx.get("quals")
    name = (names[i].decode() if names is not None else f"r{i}")
    qual = None
    if quals is not None and quals[i]:
        qual = quals[i].decode()
    read = _ShimRead(name, np.asarray(codes_row, dtype=np.uint8), qual)
    n = len(records)
    return "".join(
        aln_to_sam_line(opt, bns, read, n, records, w, mate=mate,
                        rg_id=sam_ctx.get("rg_id"))
        for w in range(n)).encode()
