from .fastx import ParsedFastx, parse_fastx, is_fasta, is_fastq
from . import sylformat
