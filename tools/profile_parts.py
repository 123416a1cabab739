import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from salt_tpu.index.build import build_index
from salt_tpu.io.fasta import read_records
from salt_tpu.pipeline.device_index import to_device_index
from salt_tpu.pipeline.engine import SEOptions, encode_reads, revcomp
from salt_tpu.ops.seed import seed_overlap
from salt_tpu.ops.locate import locate, sort_loci
from salt_tpu.ops.verify import checked_mask, compact_loci, mismatch_counts_packed, replay_and_select

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
idx = build_index("/tmp/refbuild/Test/Genome/Genome.fa", "/tmp/oracle/hapmap.txt",
                  l_seed=19, r_anchor_mode="reference_compat")
dix = to_device_index(idx)
recs = []
for r in read_records("/tmp/oracle/Read1.fq"):
    recs.append(r)
    if len(recs) >= B: break
codes = encode_reads([r.seq for r in recs])
seq = jnp.asarray(codes.astype(np.int32))
CAP = 640

@partial(jax.jit)
def f_seed(seq):
    return seed_overlap(dix.ri_c, dix.ri_r, dix.lkt, seq, 19, 1, 50)

@partial(jax.jit)
def f_locate(seq):
    c, r = seed_overlap(dix.ri_c, dix.ri_r, dix.lkt, seq, 19, 1, 50)
    return sort_loci(locate(c, r, dix.sa_cat, dix.c_sa_len, 100, dix.l_pac, 500, CAP))

@partial(jax.jit)
def f_verify(seq):
    c, r = seed_overlap(dix.ri_c, dix.ri_r, dix.lkt, seq, 19, 1, 50)
    lo = locate(c, r, dix.sa_cat, dix.c_sa_len, 100, dix.l_pac, 500, CAP)
    lc = sort_loci(lo.loci)
    chk = checked_mask(lc, dix.l_pac)
    pos, keep, _ = compact_loci(lc, chk, 64)
    return mismatch_counts_packed(dix.mixref_words, pos, keep, seq, 4)

def bench(name, fn):
    t0=time.time(); out = fn(seq); jax.block_until_ready(out); tc=time.time()-t0
    t0=time.time(); out = fn(seq); jax.block_until_ready(out); tr=time.time()-t0
    t0=time.time(); out = fn(seq); jax.block_until_ready(out); tr2=time.time()-t0
    print(f"{name}: compile {tc:.1f}s run {min(tr,tr2)*1000:.0f}ms")

bench("seed", f_seed)
bench("seed+locate", f_locate)
bench("seed+locate+verify", f_verify)
