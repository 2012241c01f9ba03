#!/bin/bash
# Rebuild the genome-scale bench artifacts on a fresh VM disk.
# chr21 first (minutes, unblocks chr21 benches + the reference
# differential), then the hg38 chain (the ~4 h critical path:
# genome gen -> FM index -> -g 40 EMF).
set -e
cd /root/repo
echo "=== rebuild start $(date) ==="
if [ ! -f data/chr21s.tpuidx.npz ]; then
  python tools/build_big_index.py data/chr21s.fa -p data/chr21s -s 0
fi
if [ ! -f data/chr21s.emf151.npz ]; then
  python -m bwa_mem_scale_tpu.cli perfect-index data/chr21s -l 151
fi
touch data/chr21s.DONE
echo "=== chr21 done $(date) ==="
if [ ! -f data/hg38s.fa ]; then
  python tools/make_genome.py data/hg38s.fa --gbp 3.1 --seed 7
fi
echo "=== hg38 genome done $(date) ==="
if [ ! -f data/hg38s.tpuidx.npz ]; then
  python tools/build_big_index.py data/hg38s.fa -p data/hg38s
fi
echo "=== hg38 index done $(date) ==="
if [ ! -f data/hg38s.emf151.npz ]; then
  python -m bwa_mem_scale_tpu.cli perfect-index data/hg38s -l 151 -g 40
fi
touch data/hg38s.DONE
echo "=== rebuild complete $(date) ==="
