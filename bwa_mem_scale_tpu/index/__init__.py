from .bntseq import BntSeq, parse_fasta, NT4_TABLE, encode_bases, decode_bases
from .build import build_index
from .artifacts import FMIndex, save_index, load_index
