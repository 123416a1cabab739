"""Benchmark: single-chip SE alignment throughput on the bundled test
genome (BASELINE.md config 1 style).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference `salt` binary aligns this fixture at ~2477
reads/s on one CPU thread (measured: 20k reads in 8.08s, single thread,
`-d -r 1 -l 100 -n 20 -c -m 500 -t 1`; see tools/make_oracle.sh).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_READS_PER_SEC = 2477.0
GENOME = "/root/reference/Test/Genome/Genome.fa"
READ_LEN = 100
N_READS = 24576
BATCH = 4096


def make_fixture():
    """Simulate SNP table + reads from the bundled genome (fixed seed)."""
    from salt_tpu.io.fasta import read_records
    from salt_tpu.io.snp import SnpBlock

    recs = list(read_records(GENOME))
    contigs = [(r.name, r.comment or "(null)", r.seq) for r in recs]
    rng = np.random.default_rng(42)
    bases = "ACGT"
    blocks = []
    mutated = []
    for name, _, seq in contigs:
        L = len(seq)
        n_snp = int(L * 0.05)
        pos = np.sort(rng.choice(np.arange(L), size=n_snp, replace=False))
        stype = []
        mseq = list(seq)
        keep_pos = []
        for p in pos:
            c = seq[p].upper()
            if c not in bases:
                continue
            ref = bases.index(c)
            alt = (ref + int(rng.integers(1, 4))) % 4
            stype.append((1 << ref) | (1 << alt) | (ref << 4))
            mseq[p] = bases[alt]
            keep_pos.append(p)
        blocks.append(
            SnpBlock(name, np.array(keep_pos, np.uint32), np.array(stype, np.uint8))
        )
        mutated.append("".join(mseq))
    # paired sampling like wgsim: reads from the mutated haplotype
    reads = []
    for _ in range(N_READS):
        ci = int(rng.integers(0, len(mutated)))
        hap = mutated[ci]
        start = int(rng.integers(0, len(hap) - READ_LEN))
        reads.append(hap[start : start + READ_LEN])
    return contigs, blocks, reads


def main():
    from salt_tpu.index.build import build_index_from_data
    from salt_tpu.pipeline.engine import SEAligner, SEOptions
    from salt_tpu.io.fasta import SeqRecord

    contigs, blocks, reads = make_fixture()
    idx = build_index_from_data(contigs, blocks, l_seed=19)
    opts = SEOptions(l_overlap=1, max_locate=500, print_nm_md=True,
                     print_xa_cigar=True, batch_size=BATCH, gap_batch=128)
    al = SEAligner(idx, opts)
    recs = [SeqRecord(name=f"r{i}", comment=None, seq=s, qual="I" * len(s))
            for i, s in enumerate(reads)]
    # warmup (compile + device load)
    al.align_records(recs[:BATCH])
    t0 = time.time()
    out = al.align_records(recs[BATCH:])
    dt = time.time() - t0
    n = len(recs) - BATCH
    mapped = sum(1 for line in out if line and line.split("\t")[2] != "*")
    rate = n / dt
    sys.stderr.write(f"aligned {n} reads in {dt:.2f}s; {mapped}/{n} mapped\n")
    print(json.dumps({
        "metric": "se_reads_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "reads/s",
        "vs_baseline": round(rate / BASELINE_READS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
