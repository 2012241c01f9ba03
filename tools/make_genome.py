"""Synthetic genome generator for scale testing.

No real genome ships with this environment (zero egress), so scale
work (hg38-class: ~3.1 Gbp, int64 FM positions, multi-GB index tables)
runs on synthetic genomes with repeat structure:

  - contigs proportioned like hg38 chromosomes (chr1..chr22, X, Y),
  - a planted repeat library (Alu/LINE-like element lengths) covering
    a configurable fraction of the genome at 2-20% divergence, so
    seeding/chaining see realistic multi-hit intervals,
  - N-holes (telomere/centromere-like runs + sporadic gaps) so the
    ambiguity machinery is exercised at scale.

Usage:
  python tools/make_genome.py out.fa --gbp 3.1 [--seed 7] [--repeat-frac 0.45]
  python tools/make_genome.py out.fa --mbp 46   # chr21-scale
"""

from __future__ import annotations

import argparse

import numpy as np

# hg38 chromosome lengths (Mbp, rounded) for proportioning contigs.
HG38_MBP = [249, 242, 198, 190, 182, 171, 159, 145, 138, 134,
            135, 133, 114, 107, 102, 90, 83, 80, 59, 64, 47, 51, 156, 57]
NAMES = [f"chr{i}" for i in range(1, 23)] + ["chrX", "chrY"]

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_repeat_library(rng: np.random.Generator, n: int = 300):
    lib = []
    for _ in range(n):
        ln = int(np.exp(rng.uniform(np.log(150), np.log(6000))))
        lib.append(rng.integers(0, 4, ln, dtype=np.uint8))
    return lib


def generate_contig(rng, length, lib, repeat_frac):
    seq = rng.integers(0, 4, length, dtype=np.uint8)
    # plant repeats until ~repeat_frac of the contig is covered
    target = int(length * repeat_frac)
    covered = 0
    while covered < target:
        el = lib[int(rng.integers(0, len(lib)))]
        ln = len(el)
        if ln >= length:
            break
        pos = int(rng.integers(0, length - ln))
        copy = el.copy()
        div = rng.uniform(0.02, 0.20)
        nmut = int(ln * div)
        if nmut:
            mpos = rng.integers(0, ln, nmut)
            copy[mpos] = (copy[mpos] + rng.integers(1, 4, nmut)) & 3
        if rng.random() < 0.5:               # reverse complement copies
            copy = (3 - copy)[::-1]
        seq[pos:pos + ln] = copy
        covered += ln
    return seq


def write_fasta_contig(fh, name, codes, n_mask):
    """codes uint8 0..3 + boolean N mask -> wrapped FASTA lines."""
    chars = BASES[codes]
    if n_mask is not None and n_mask.any():
        chars = np.where(n_mask, np.uint8(ord("N")), chars)
    fh.write(f">{name}\n".encode())
    width = 60
    n = len(chars)
    nfull = n // width
    if nfull:
        block = np.empty((nfull, width + 1), dtype=np.uint8)
        block[:, :width] = chars[: nfull * width].reshape(nfull, width)
        block[:, width] = ord("\n")
        block.tofile(fh)
    rem = n % width
    if rem:
        tail = np.empty(rem + 1, dtype=np.uint8)
        tail[:rem] = chars[nfull * width:]
        tail[rem] = ord("\n")
        tail.tofile(fh)


def n_holes(rng, length):
    """Boolean mask of N runs: ends + centromere-ish + sporadic."""
    mask = np.zeros(length, dtype=bool)
    tel = min(10_000, length // 50)
    mask[:tel] = True
    mask[length - tel:] = True
    mid = length // 2
    cen = min(100_000, length // 20)
    mask[mid:mid + cen] = True
    for _ in range(int(rng.integers(5, 30))):
        p = int(rng.integers(0, max(1, length - 1000)))
        mask[p:p + int(rng.integers(50, 1000))] = True
    return mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--gbp", type=float, default=None)
    ap.add_argument("--mbp", type=float, default=None)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--repeat-frac", type=float, default=0.45)
    ap.add_argument("--no-holes", action="store_true")
    args = ap.parse_args()

    total = int((args.gbp or 0) * 1e9 + (args.mbp or 0) * 1e6)
    if total <= 0:
        raise SystemExit("need --gbp or --mbp")
    rng = np.random.default_rng(args.seed)
    lib = make_repeat_library(rng)

    weights = np.array(HG38_MBP, dtype=np.float64)
    lens = (weights / weights.sum() * total).astype(np.int64)
    n_contigs = len(lens) if total > 200e6 else max(
        1, int(total // 50e6) or 1)
    if n_contigs < len(lens):
        lens = (weights[:n_contigs] / weights[:n_contigs].sum()
                * total).astype(np.int64)

    with open(args.out, "wb") as fh:
        for i in range(n_contigs):
            ln = int(lens[i])
            seq = generate_contig(rng, ln, lib, args.repeat_frac)
            mask = None if args.no_holes else n_holes(rng, ln)
            write_fasta_contig(fh, NAMES[i], seq, mask)
            print(f"{NAMES[i]}: {ln/1e6:.1f} Mbp", flush=True)
    print(f"wrote {args.out}: {total/1e9:.3f} Gbp, {n_contigs} contigs")


if __name__ == "__main__":
    main()
