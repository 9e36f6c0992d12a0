from lesv_tpu.io.fasta import read_fastx, write_fasta  # noqa: F401
from lesv_tpu.io.seqstore import SeqStore, split_subreads  # noqa: F401
