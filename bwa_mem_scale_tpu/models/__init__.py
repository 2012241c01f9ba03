from .aligner import build_demo_aligner, demo_genome
