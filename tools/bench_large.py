"""Large-genome scale test: synthetic 45MB genome (chr21-scale) +
SNP overlay; measures index build time and SE alignment throughput."""

import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from salt_tpu.index.build import build_index_from_data
from salt_tpu.io.fasta import SeqRecord
from salt_tpu.io.snp import SnpBlock
from salt_tpu.pipeline.engine import SEAligner, SEOptions

GENOME_LEN = int(sys.argv[1]) if len(sys.argv) > 1 else 45_000_000
BUILD_ONLY = "--build-only" in sys.argv
SAVE_PREFIX = None
for i, a in enumerate(sys.argv):
    if a == "--save":
        SAVE_PREFIX = sys.argv[i + 1]
N_READS = 8192 * 3
L = 100


def rss_gb():
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

rng = np.random.default_rng(7)
bases = "ACGT"
print(f"synthesizing {GENOME_LEN/1e6:.0f}MB genome...", flush=True)
codes = rng.integers(0, 4, GENOME_LEN).astype(np.uint8)
genome = codes.view()
genome_str = "".join(bases[c] for c in codes[:0])  # placeholder
# fast codes->str
lut = np.frombuffer(b"ACGT", dtype=np.uint8)
genome_str = lut[codes].tobytes().decode("latin1")

# SNPs at ~1/300bp
n_snp = GENOME_LEN // 300
pos = np.sort(rng.choice(GENOME_LEN, size=n_snp, replace=False)).astype(np.uint32)
ref_codes = codes[pos]
alt = (ref_codes + rng.integers(1, 4, n_snp)) % 4
stype = ((1 << ref_codes) | (1 << alt) | (ref_codes << 4)).astype(np.uint8)
block = SnpBlock("chr21s", pos, stype)

t0 = time.time()
idx = build_index_from_data([("chr21s", "synthetic", genome_str)], [block], l_seed=19)
print(f"index built in {time.time()-t0:.1f}s "
      f"(text {idx.r_text_len/1e6:.1f}M local-pattern chars); "
      f"peak RSS {rss_gb():.2f}GB = {rss_gb()*1e9/GENOME_LEN:.1f} B/base",
      flush=True)
del genome_str
if SAVE_PREFIX:
    from salt_tpu.index.store import save_index

    t0 = time.time()
    save_index(idx, SAVE_PREFIX)
    print(f"saved to {SAVE_PREFIX} in {time.time()-t0:.1f}s", flush=True)
if BUILD_ONLY:
    sys.exit(0)

# reads from the SNP-mutated haplotype + 0.1% errors
hap = codes.copy()
hap[pos] = alt
starts = rng.integers(0, GENOME_LEN - L, N_READS)
reads = []
for s in starts:
    r = hap[s : s + L].copy()
    err = rng.random(L) < 0.001
    r[err] = rng.integers(0, 4, err.sum())
    reads.append(lut[r].tobytes().decode("latin1"))

recs = [SeqRecord(name=f"r{i}_{starts[i]}", comment=None, seq=s, qual="I" * L)
        for i, s in enumerate(reads)]
opts = SEOptions(l_overlap=1, max_locate=500, batch_size=4096, gap_batch=128)
al = SEAligner(idx, opts)
t0 = time.time()
out1 = al.align_records(recs[:4096])
print(f"warmup batch {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out = al.align_records(recs[4096:])
dt = time.time() - t0
n = len(recs) - 4096
print(f"aligned {n} reads in {dt:.2f}s -> {n/dt:.0f} reads/s", flush=True)

# accuracy: primary position within 5bp of truth
ok = 0
tot = 0
for i, line in enumerate(out):
    if not line:
        continue
    f = line.split("\t")
    if f[2] == "*":
        continue
    tot += 1
    truth = int(recs[4096 + i].name.split("_")[1])
    if abs(int(f[3]) - 1 - truth) <= 5:
        ok += 1
print(f"accuracy: {ok}/{tot} primaries within 5bp of truth "
      f"({100.0*ok/max(tot,1):.2f}%), {n - tot} unmapped")
