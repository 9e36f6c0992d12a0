"""Data-layer tests: encoding, packing, store, subread splitting.

Golden behavior vs reference `qx2splitseq` (`app/split_seq/main.c:28-45`) and
seqdb 2-bit pack/ambiguous-run handling (`corelib/build_db.c`).
"""

import numpy as np
import pytest

from lesv_tpu.config import SplitConfig
from lesv_tpu.io.fasta import decode_seq, encode_seq, read_fastx, revcomp, write_fasta
from lesv_tpu.io.seqstore import (
    SeqStore,
    pack_2bit,
    split_subreads,
    subread_origin,
    unpack_2bit,
)


def test_encode_decode_roundtrip():
    s = "ACGTNacgtn"
    codes = encode_seq(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert decode_seq(codes) == "ACGTNACGTN"


def test_revcomp():
    assert decode_seq(revcomp(encode_seq("ACGTN"))) == "NACGT"
    # double revcomp is identity
    s = encode_seq("ACGTACGTNNACGT")
    assert np.array_equal(revcomp(revcomp(s)), s)


def test_pack_unpack_roundtrip(rng):
    for n in [0, 1, 3, 4, 5, 127, 1024]:
        codes = rng.integers(0, 4, n).astype(np.uint8)
        assert np.array_equal(unpack_2bit(pack_2bit(codes), n), codes)


def test_seqstore_extract(rng):
    seqs = [("r0", rng.integers(0, 4, 113).astype(np.uint8)),
            ("r1", rng.integers(0, 4, 257).astype(np.uint8)),
            ("r2", encode_seq("ACGTNNNNACGTACGT"))]
    st = SeqStore.from_records(seqs)
    assert st.num_seqs == 3
    assert st.total_res == 113 + 257 + 16
    for i, (name, codes) in enumerate(seqs):
        assert st.name_of(i) == name
        assert st.id_of(name) == i
        assert np.array_equal(st.get(i), codes)
    # subranges and rc
    assert np.array_equal(st.get(1, 10, 20), seqs[1][1][10:20])
    assert np.array_equal(st.get(1, 10, 20, rc=True), revcomp(seqs[1][1][10:20]))
    # ambiguous bases restored
    assert decode_seq(st.get(2)) == "ACGTNNNNACGTACGT"
    # without restore, Ns were packed as code 0
    assert decode_seq(st.get(2, restore_ambig=False)) == "ACGTAAAAACGTACGT"


def test_split_subreads_short_passthrough(rng):
    cfg = SplitConfig(max_subseq_size=100, min_last_subseq_size=40)
    codes = rng.integers(0, 4, 100).astype(np.uint8)
    out = list(split_subreads([("read", codes)], cfg))
    assert len(out) == 1 and out[0][0] == "read"


def test_split_subreads_split_and_merge(rng):
    cfg = SplitConfig(max_subseq_size=100, min_last_subseq_size=40)
    # 230 = 100 + 100 + 30; trailing 30 < 40 merges into second piece
    codes = rng.integers(0, 4, 230).astype(np.uint8)
    out = list(split_subreads([("read", codes)], cfg))
    assert [n for n, _ in out] == ["read_0_100", "read_100_230"]
    assert np.array_equal(out[0][1], codes[:100])
    assert np.array_equal(out[1][1], codes[100:])
    # 250 = 100 + 100 + 50; trailing 50 >= 40 stays
    codes = rng.integers(0, 4, 250).astype(np.uint8)
    out = list(split_subreads([("read", codes)], cfg))
    assert [n for n, _ in out] == ["read_0_100", "read_100_200", "read_200_250"]
    assert subread_origin("read_100_200") == ("read", 100, 200)


def test_fastx_roundtrip(tmp_path, rng):
    recs = [(f"r{i}", rng.integers(0, 4, 50 + i).astype(np.uint8)) for i in range(5)]
    path = tmp_path / "t.fa"
    write_fasta(str(path), recs, width=17)
    back = list(read_fastx(str(path)))
    assert len(back) == 5
    for (n0, c0), (n1, c1) in zip(recs, back):
        assert n0 == n1 and np.array_equal(c0, c1)


def test_fastq(tmp_path):
    path = tmp_path / "t.fq"
    path.write_text("@read1 extra\nACGT\n+\nIIII\n@read2\nGGTT\n+\nIIII\n")
    back = list(read_fastx(str(path)))
    assert back[0][0] == "read1" and decode_seq(back[0][1]) == "ACGT"
    assert back[1][0] == "read2" and decode_seq(back[1][1]) == "GGTT"


def test_seqstore_disk_roundtrip(tmp_path, rng):
    seqs = [("a", rng.integers(0, 4, 1000).astype(np.uint8)),
            ("b", encode_seq("ACGTNNNNACGT")),
            ("c", rng.integers(0, 4, 77).astype(np.uint8))]
    st = SeqStore.from_records(seqs)
    st.write(str(tmp_path / "db"))
    back = SeqStore.open(str(tmp_path / "db"))
    assert back.num_seqs == 3 and back.total_res == st.total_res
    for i, (name, codes) in enumerate(seqs):
        assert back.name_of(i) == name
        assert np.array_equal(back.get(i), codes)
    assert np.array_equal(back.get(0, 100, 200, rc=True),
                          st.get(0, 100, 200, rc=True))
