"""Per-read signature diff: ref sigs keyed by qname vs ours by qname.

The concordance matcher is a global greedy 1-1 match, so when several
reads carry the same SV locus a missing read's signature can be
attributed to the wrong qname.  This tool diffs per read: for every
reference signature, is there an our-signature from the SAME read at
the same locus?  Misses here are the true per-read gaps.

Usage: python tools/sig_diff.py /tmp/conc_r4/seed0
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from lesv_tpu.config import LesvConfig
from lesv_tpu.io.fasta import read_fasta


def main():
    wrk = sys.argv[1]
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

    ours = {}
    for g in sigs:
        ours.setdefault(qstore.name_of(g.qid), []).append(
            (g.kind, g.sfrom, g.length))
    ref = {}
    sigdir = os.path.join(wrk, "ref", "sv_signature")
    for fn in sorted(os.listdir(sigdir)):
        if not fn.endswith(".sv_signature"):
            continue
        with open(os.path.join(sigdir, fn)) as fh:
            for line in fh:
                c = line.rstrip("\n").split("\t")
                if len(c) < 14:
                    continue
                typ = int(c[12])
                kind = "DEL" if typ == 0 else "INS" if typ == 6 else None
                if kind is None:
                    continue
                sfrom, sto = int(c[7]), int(c[8])
                qfrom, qto = int(c[2]), int(c[3])
                ln = (sto - sfrom) if kind == "DEL" else (qto - qfrom)
                ref.setdefault(c[13], []).append((kind, sfrom, ln))

    miss = extra = hit = 0
    for qn, rs in sorted(ref.items()):
        os_ = list(ours.get(qn, []))
        for kind, sfrom, ln in rs:
            m = None
            for i, (k2, s2, l2) in enumerate(os_):
                if (k2 == kind and abs(s2 - sfrom) <= 100
                        and min(ln, l2) >= 0.7 * max(ln, l2)):
                    m = i
                    break
            if m is None:
                miss += 1
                near = ours.get(qn)
                print(f"MISS {qn}: ref {kind}@{sfrom} len={ln} "
                      f"ours_for_read={near}")
            else:
                os_.pop(m)
                hit += 1
    for qn, os_ in sorted(ours.items()):
        rs = list(ref.get(qn, []))
        for kind, sfrom, ln in os_:
            m = None
            for i, (k2, s2, l2) in enumerate(rs):
                if (k2 == kind and abs(s2 - sfrom) <= 100
                        and min(ln, l2) >= 0.7 * max(ln, l2)):
                    m = i
                    break
            if m is None:
                extra += 1
                print(f"EXTRA {qn}: our {kind}@{sfrom} len={ln} "
                      f"ref_for_read={ref.get(qn)}")
            else:
                rs.pop(m)
    print(f"per-read: hit={hit} miss={miss} extra={extra} "
          f"recall={hit / max(1, hit + miss):.4f}")


if __name__ == "__main__":
    main()
