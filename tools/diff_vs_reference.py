#!/usr/bin/env python3
"""Differential acceptance test against a real bwa-mem2/bwa-mem-scale
binary (the reference lineage's de-facto QC, SURVEY.md section 4).

Runs both aligners on the same FASTA/FASTQ and reports field-level
agreement of primary records: (FLAG, RNAME, POS, CIGAR), mate fields,
MAPQ, NM/MD, XA. The published contract is identity except MAPQ/XS/XA
on a small fraction of reads; round-1 results on 60 kbp fixtures were
100% identical including MAPQ (SE, PE, and indel-rich sets).

Usage:
  python tools/diff_vs_reference.py BWA_MEM2_BIN FASTA FQ1 [FQ2]

The reference binary builds from the (untouched) reference sources in
a scratch copy; see tools/README-reference-build.md for the two-line
shim this environment needs.
"""

import os
import subprocess
import sys
import tempfile


def load(path):
    prim = {}
    n_other = 0
    for ln in open(path):
        if ln.startswith("@"):
            continue
        f = ln.rstrip("\n").split("\t")
        fl = int(f[1])
        if fl & 0x900:
            n_other += 1
            continue
        key = (f[0], "1" if fl & 0x40 else ("2" if fl & 0x80 else "0"))
        prim[key] = f
    return prim, n_other


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    ref_bin, fasta = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    extra = []
    if "--args" in rest:       # pass-through mem options, e.g.
        i = rest.index("--args")   # --args "-x pacbio"
        extra = rest[i + 1].split()
        rest = rest[:i] + rest[i + 2:]
    fqs = rest
    tmp = tempfile.mkdtemp(prefix="diffref.")
    ref_sam = os.path.join(tmp, "ref.sam")
    our_sam = os.path.join(tmp, "ours.sam")

    if not os.path.exists(fasta + ".bwt.2bit.64"):
        subprocess.check_call([ref_bin, "index", fasta])
    with open(ref_sam, "w") as f:
        subprocess.check_call(
            [ref_bin, "mem", "-t", "1", *extra, fasta] + fqs,
            stdout=f, stderr=subprocess.DEVNULL)
    prefix = fasta + ".tpuidx"
    if not os.path.exists(fasta + ".tpuidx.npz"):
        subprocess.check_call(
            [sys.executable, "-m", "bwa_mem_scale_tpu.cli", "index",
             fasta, "-p", fasta])
    subprocess.check_call(
        [sys.executable, "-m", "bwa_mem_scale_tpu.cli", "mem", *extra,
         fasta, *fqs, "-o", our_sam])

    ref, ref_other = load(ref_sam)
    ours, our_other = load(our_sam)
    missing = set(ref) ^ set(ours)
    cats = {"identical": 0, "pos/cigar": 0, "mate/tlen": 0, "mapq": 0,
            "nm/md": 0, "xa": 0}
    examples = []
    for k, f in ref.items():
        if k not in ours:
            continue
        o = ours[k]
        tr = {t.split(":")[0]: t for t in f[11:]}
        to = {t.split(":")[0]: t for t in o[11:]}
        if (f[1], f[2], f[3], f[5]) != (o[1], o[2], o[3], o[5]):
            cat = "pos/cigar"
        elif (f[6], f[7], f[8]) != (o[6], o[7], o[8]):
            cat = "mate/tlen"
        elif f[4] != o[4]:
            cat = "mapq"
        elif tr.get("NM") != to.get("NM") or tr.get("MD") != to.get("MD"):
            cat = "nm/md"
        elif tr.get("XA") != to.get("XA"):
            cat = "xa"
        else:
            cat = "identical"
        cats[cat] += 1
        if cat != "identical" and len(examples) < 10:
            examples.append((cat, k, f[1:9], o[1:9]))
    total = len(ref)
    print(f"primary records: {total} (ref extra-rec {ref_other}, "
          f"ours {our_other}; key mismatches {len(missing)})")
    for c, n in cats.items():
        print(f"  {c:10s} {n:6d}  ({100.0 * n / max(total, 1):.2f}%)")
    for e in examples:
        print(" ", e)
    ok = cats["identical"] == total and not missing
    print("RESULT:", "IDENTICAL" if ok else "DIVERGENCES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
