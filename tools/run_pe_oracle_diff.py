"""PE oracle diff against the reference binary's SAM output."""

import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salt_tpu.index.build import build_index
from salt_tpu.io.fasta import read_records
from salt_tpu.pipeline.pe_engine import PEAligner, PEOptions

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

idx = build_index("/tmp/refbuild/Test/Genome/Genome.fa", "/tmp/oracle/hapmap.txt",
                  l_seed=19, r_anchor_mode="reference_compat")
o = PEOptions(device_sw=os.environ.get("SALT_TPU_DEVICE_SW", "auto"),
              l_overlap=5, max_locate=1000, min_tlen=350, max_tlen=650,
              print_nm_md=True, print_xa_cigar=True, batch_size=2048,
              gap_batch=128)
al = PEAligner(idx, o)
r1, r2 = [], []
for a, b in zip(read_records("/tmp/oracle/Read1.fq"), read_records("/tmp/oracle/Read2.fq")):
    r1.append(a)
    r2.append(b)
    if len(r1) >= N:
        break
t0 = time.time()
out = al.align_pairs(r1, r2)
dt = time.time() - t0
print(f"aligned {N} pairs in {dt:.1f}s ({N/dt:.0f} pairs/s)", flush=True)
oracle = [l for l in open("/tmp/oracle/pe_oracle.sam") if not l.startswith("@")]
orecs = [oracle[i] for i in range(0, len(oracle), 2)]
nd = 0
for i in range(2 * N):
    if out[i] != orecs[i]:
        nd += 1
        if nd <= 8:
            print(f"--- rec {i}")
            print("mine:  ", out[i][:300].rstrip())
            print("oracle:", orecs[i][:300].rstrip())
print(f"concordance: {2*N-nd}/{2*N} ({100.0*(2*N-nd)/(2*N):.3f}%)")
