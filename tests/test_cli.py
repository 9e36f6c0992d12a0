"""CLI tests (config/split/view/map subcommands)."""

import numpy as np
import pytest

from lesv_tpu.__main__ import build_config, main, parse_cfg
from lesv_tpu.io.fasta import write_fasta
from lesv_tpu.sim import mutate_read, random_genome


def test_config_roundtrip(tmp_path):
    cfg_path = tmp_path / "t.cfg"
    main(["config", str(cfg_path)])
    kv = parse_cfg(str(cfg_path))
    assert kv["MAX_SUBSEQ_SIZE"] == "50000"
    kv["MAP_OPTIONS"] = "-kmer_size 19 -kmer_window 20"
    kv["SVR_MIN_SVE_PERC_IDENTITY"] = "80.0"
    cfg = build_config(kv)
    assert cfg.index.kmer_size == 19
    assert cfg.index.kmer_window == 20
    assert cfg.sv_read.min_ident_perc == 80.0


def test_split_and_view(tmp_path, capsys):
    rng = np.random.default_rng(0)
    reads = [(f"r{i}", rng.integers(0, 4, 120_000).astype(np.uint8))
             for i in range(2)]
    inp = tmp_path / "in.fa"
    out = tmp_path / "out.fa"
    write_fasta(str(inp), reads)
    main(["split", str(inp), str(out)])
    from lesv_tpu.io.fasta import read_fastx

    pieces = list(read_fastx(str(out)))
    assert len(pieces) == 6  # 120k -> 50k + 50k + 20k, per read
    main(["view", str(out)])
    cap = capsys.readouterr()
    assert "sequences: 6" in cap.out


def test_map_cli(tmp_path, capsys):
    rng = np.random.default_rng(1)
    genome = random_genome(rng, 60_000)
    ref = tmp_path / "ref.fa"
    rd = tmp_path / "reads.fa"
    write_fasta(str(ref), [("chr1", genome)])
    write_fasta(str(rd), [
        ("read1", mutate_read(rng, genome[10_000:20_000], err=0.1)),
    ])
    out = tmp_path / "out.m4"
    main(["map", str(ref), str(rd), "-o", str(out)])
    lines = out.read_text().strip().splitlines()
    assert lines
    f = lines[0].split("\t")
    assert f[0] == "read1" and f[1] == "chr1"
    # soff/send columns near the truth
    assert abs(int(f[9]) - 10_000) < 200 and abs(int(f[10]) - 20_000) < 200


def test_map_cli_paf_sam(tmp_path):
    rng = np.random.default_rng(2)
    genome = random_genome(rng, 50_000)
    ref = tmp_path / "ref.fa"
    rd = tmp_path / "reads.fa"
    write_fasta(str(ref), [("chr1", genome)])
    from lesv_tpu.io.fasta import revcomp

    write_fasta(str(rd), [
        ("r1", mutate_read(rng, genome[5_000:15_000], err=0.1)),
        ("r2", revcomp(mutate_read(rng, genome[20_000:30_000], err=0.1))),
    ])
    paf = tmp_path / "out.paf"
    main(["map", str(ref), str(rd), "-o", str(paf), "--outfmt", "paf"])
    lines = paf.read_text().strip().splitlines()
    assert len(lines) >= 2
    r2 = [l.split("\t") for l in lines if l.startswith("r2")][0]
    assert r2[4] == "-"
    # fwd-strand query coords regardless of mapping strand
    assert int(r2[2]) < 200
    sam = tmp_path / "out.sam"
    main(["map", str(ref), str(rd), "-o", str(sam), "--outfmt", "sam"])
    body = [l for l in sam.read_text().splitlines() if not l.startswith("@")]
    assert len(body) >= 2
    f = body[0].split("\t")
    assert f[2] == "chr1" and f[5] != "*"


def test_dump_cli(tmp_path):
    rng = np.random.default_rng(3)
    recs = [("a", rng.integers(0, 4, 100).astype(np.uint8))]
    inp = tmp_path / "in.fa"
    outp = tmp_path / "out.fa"
    write_fasta(str(inp), recs)
    main(["dump", str(inp), str(outp)])
    from lesv_tpu.io.fasta import read_fastx

    back = list(read_fastx(str(outp)))
    assert back[0][0] == "a" and np.array_equal(back[0][1], recs[0][1])
