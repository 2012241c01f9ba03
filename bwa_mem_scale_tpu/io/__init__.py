from .fastq import read_fastq, ReadBatch
from .sam import sam_header, aln_to_sam_line
