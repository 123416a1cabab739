"""Run the SE aligner on the 20k oracle reads (compat index) and diff
against the reference binary's SAM output."""

import sys, time, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salt_tpu.index.build import build_index
from salt_tpu.io.fasta import read_records
from salt_tpu.pipeline.engine import SEAligner, SEOptions

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
GENOME = "/tmp/refbuild/Test/Genome/Genome.fa"

t0 = time.time()
idx = build_index(GENOME, "/tmp/oracle/hapmap.txt", l_seed=19,
                  r_anchor_mode="reference_compat")
print(f"index built in {time.time()-t0:.1f}s", flush=True)

# run_se_test.sh args: -d -r 1 -l 100 -n 20 -c -m 500
opts = SEOptions(l_overlap=1, max_locate=500, print_nm_md=True,
                 print_xa_cigar=True, batch_size=512, gap_batch=64)
al = SEAligner(idx, opts)

recs = []
for r in read_records("/tmp/oracle/Read1.fq"):
    recs.append(r)
    if len(recs) >= N:
        break
t0 = time.time()
out = al.align_records(recs)
dt = time.time() - t0
print(f"aligned {len(recs)} reads in {dt:.1f}s ({len(recs)/dt:.0f} reads/s)", flush=True)

oracle = [l.rstrip("\n") for l in open("/tmp/oracle/se_oracle.sam") if not l.startswith("@")]
oracle = oracle[: len(out)]
n_diff = 0
for i, (a, b) in enumerate(zip(out, oracle)):
    if a != b:
        n_diff += 1
        if n_diff <= 10:
            print(f"--- read {i}")
            print(f"mine:   {a[:400]}")
            print(f"oracle: {b[:400]}")
print(f"concordance: {len(out)-n_diff}/{len(out)} ({100.0*(len(out)-n_diff)/len(out):.3f}%)")
