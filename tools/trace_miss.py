"""Trace specific reads through our pipeline vs reference artifacts.

Given a concordance seed dir (reads.fasta/ref.fasta + ref/ artifacts),
re-run our stages in-process and dump per-read state (M4s, SV-read
selection, signatures) for the named reads — the root-causing tool the
round-2 verdict asked for (VERDICT.md "Next round" item 4).

Usage:
  python tools/trace_miss.py /tmp/conc_r4/seed0 sim151_fwd_13220_44341 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from lesv_tpu.config import LesvConfig
from lesv_tpu.io.fasta import read_fasta


def main():
    wrk = sys.argv[1]
    names = sys.argv[2:]
    from lesv_tpu.index.kmer_index import KmerIndex
    from lesv_tpu.io.seqstore import SeqStore, split_subreads
    from lesv_tpu.pipeline.mapper import map_all
    from lesv_tpu.pipeline.signatures import extract_signatures
    from lesv_tpu.pipeline.sv_reads import select_sv_reads

    cfg = LesvConfig()
    reads = [(n, c) for n, c in read_fasta(os.path.join(wrk, "reads.fasta"))]
    genome = [(n, c) for n, c in read_fasta(os.path.join(wrk, "ref.fasta"))]
    split = list(split_subreads(reads, cfg.split))
    sstore = SeqStore.from_records([(genome[0][0], genome[0][1])])
    index = KmerIndex.build(sstore, cfg.index)
    m4s, qstore = map_all(split, sstore, index, cfg)
    svrs = select_sv_reads(m4s, qstore, sstore, cfg)
    sigs = extract_signatures(svrs, qstore, sstore, cfg)

    # reference per-read artifacts
    ref_m4 = {}
    with open(os.path.join(wrk, "ref", "map.m4")) as fh:
        for line in fh:
            c = line.split("\t")
            if len(c) >= 12:
                ref_m4.setdefault(c[0], []).append(line.rstrip())
    ref_svr = {}
    p = os.path.join(wrk, "ref", "sv_reads", "subject_00000000.sv_read")
    if os.path.exists(p):
        with open(p) as fh:
            for line in fh:
                c = line.rstrip("\n").split("\t")
                ref_svr.setdefault(c[-1], []).append(c[:-1])
    ref_sig = {}
    sigdir = os.path.join(wrk, "ref", "sv_signature")
    for fn in sorted(os.listdir(sigdir)):
        if not fn.endswith(".sv_signature"):
            continue
        with open(os.path.join(sigdir, fn)) as fh:
            for line in fh:
                c = line.rstrip("\n").split("\t")
                if len(c) > 13:
                    ref_sig.setdefault(c[13], []).append(c[:13])

    name2id = {qstore.name_of(i): i for i in range(qstore.num_seqs)}
    for nm in names:
        qid = name2id.get(nm)
        print(f"===== {nm} (qid={qid}) =====")
        print("-- ref M4:")
        for l in ref_m4.get(nm, []):
            print("   ", l)
        print("-- our M4:")
        for m in m4s:
            if m.qid == qid:
                print(f"    qdir={m.qdir} q[{m.qoff},{m.qend})/{m.qsize} "
                      f"s[{m.soff},{m.send}) id={m.ident_perc:.2f} "
                      f"score={m.score} dist={m.dist}")
        print("-- ref SvRead:")
        for c in ref_svr.get(nm, []):
            print("   ", c)
        print("-- our SvRead:")
        for r in svrs:
            if r.query_id == qid:
                print(f"    qdir={r.qdir} q[{r.qoff},{r.qend})/{r.qsize} "
                      f"s[{r.soff},{r.send}) dist={r.dist}")
        print("-- ref sigs:")
        for c in ref_sig.get(nm, []):
            print("   ", c)
        print("-- our sigs:")
        for g in sigs:
            if g.qid == qid:
                print(f"    {g.kind} q[{g.qfrom},{g.qto}) s[{g.sfrom},{g.sto})"
                      f" len={g.length} aln_s[{g.aln_sb},{g.aln_se})")


if __name__ == "__main__":
    main()
