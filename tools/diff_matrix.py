"""Differential acceptance MATRIX vs the real bwa-mem2 binary:
several fixtures x option sets, each must come back IDENTICAL.

Usage:  python tools/diff_matrix.py /tmp/refbuild/bwa-mem2 [workdir]

Fixtures: multi-contig genome (3 contigs, one marked ALT via .alt),
reads with Ns, both strands, 1%-error SE and PE sets. Option sets
cover -a, -T, -h, -x pacbio, -j, and defaults.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def gen_fixtures(d):
    rng = np.random.RandomState(77)
    bases = np.array(list("ACGT"))
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    lens = [40000, 15000, 8000]
    names = ["chr1", "chr2", "alt_1"]
    seqs = [rng.randint(0, 4, n) for n in lens]
    # make the ALT contig share material with chr1 (realistic ALT)
    seqs[2][:6000] = seqs[0][2000:8000]
    fa = os.path.join(d, "g.fa")
    with open(fa, "w") as f:
        for nm, s in zip(names, seqs):
            f.write(f">{nm}\n")
            txt = "".join(bases[s])
            for i in range(0, len(txt), 70):
                f.write(txt[i:i + 70] + "\n")
    with open(fa + ".alt", "w") as f:
        f.write("alt_1\n")

    def sample(n, tag, err=0.01, with_n=False):
        out = os.path.join(d, f"{tag}.fq")
        with open(out, "w") as f:
            for i in range(n):
                ci = rng.randint(0, 3)
                s = seqs[ci]
                p = rng.randint(0, len(s) - 100)
                w = list("".join(bases[s[p:p + 100]]))
                for j in range(100):
                    if rng.rand() < err:
                        w[j] = bases[rng.randint(0, 4)]
                if with_n and i % 5 == 0:
                    w[rng.randint(0, 100)] = "N"
                r = "".join(w)
                if i % 2:
                    r = "".join(comp[c] for c in reversed(r))
                f.write(f"@{tag}{i}\n{r}\n+\n{'I' * 100}\n")
        return out

    se = sample(150, "se")
    sn = sample(100, "sn", with_n=True)
    # proper pairs from chr1
    r1 = os.path.join(d, "p_1.fq")
    r2 = os.path.join(d, "p_2.fq")
    with open(r1, "w") as f1, open(r2, "w") as f2:
        s = seqs[0]
        for i in range(80):
            isz = max(int(rng.normal(300, 40)), 120)
            p = rng.randint(0, len(s) - isz)
            a = "".join(bases[s[p:p + 100]])
            b = "".join(bases[s[p + isz - 100:p + isz]])
            b = "".join(comp[c] for c in reversed(b))
            f1.write(f"@p{i}\n{a}\n+\n{'I' * 100}\n")
            f2.write(f"@p{i}\n{b}\n+\n{'I' * 100}\n")
    return fa, se, sn, (r1, r2)


def main():
    ref_bin = sys.argv[1]
    d = sys.argv[2] if len(sys.argv) > 2 else "/tmp/diffmatrix"
    os.makedirs(d, exist_ok=True)
    fa, se, sn, (r1, r2) = gen_fixtures(d)

    cases = [
        ("SE defaults", [se], ""),
        ("SE with Ns", [sn], ""),
        ("SE -a (all hits)", [se], "-a"),
        ("SE -T 50", [se], "-T 50"),
        ("SE -h 2,100", [se], "-h 2,100"),
        ("SE -x pacbio", [se], "-x pacbio"),
        ("SE -j (ignore alt)", [se], "-j"),
        ("PE defaults", [r1, r2], ""),
        ("PE -a", [r1, r2], "-a"),
    ]
    fails = []
    for name, fqs, args in cases:
        cmd = [sys.executable,
               os.path.join(REPO, "tools", "diff_vs_reference.py"),
               ref_bin, fa, *fqs]
        if args:
            cmd += ["--args", args]
        r = subprocess.run(cmd, capture_output=True, text=True)
        verdict = ("IDENTICAL" if "RESULT: IDENTICAL" in r.stdout
                   else "DIVERGED")
        tail = [ln for ln in r.stdout.splitlines() if ln][:1]
        print(f"{name:22s} {verdict}   {tail[0] if tail else ''}",
              flush=True)
        if verdict != "IDENTICAL":
            print(r.stdout[-1500:])
            fails.append(name)
    print("MATRIX:", "ALL IDENTICAL" if not fails else f"FAILS {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
