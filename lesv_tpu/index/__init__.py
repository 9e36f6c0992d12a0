from lesv_tpu.index.kmer_index import KmerIndex  # noqa: F401
