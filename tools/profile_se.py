"""Phase timing for the SE pipeline on the oracle fixture."""

import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from salt_tpu.index.build import build_index
from salt_tpu.io.fasta import read_records
from salt_tpu.pipeline.device_index import to_device_index
from salt_tpu.pipeline.engine import SEOptions, encode_reads, revcomp
from salt_tpu.pipeline.se import se_gapped, se_ungapped

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512

idx = build_index("/tmp/refbuild/Test/Genome/Genome.fa", "/tmp/oracle/hapmap.txt",
                  l_seed=19, r_anchor_mode="reference_compat")
dix = to_device_index(idx)
o = SEOptions(l_overlap=1, max_locate=500, batch_size=B)

recs = []
for r in read_records("/tmp/oracle/Read1.fq"):
    recs.append(r)
    if len(recs) >= B * 2:
        break
codes = encode_reads([r.seq for r in recs])

f1 = jnp.asarray(codes[:B].astype(np.int32))
r1 = jnp.asarray(revcomp(codes[:B]).astype(np.int32))
f2 = jnp.asarray(codes[B:].astype(np.int32))
r2 = jnp.asarray(revcomp(codes[B:]).astype(np.int32))

kw = dict(l_overlap=1, max_seed=50, max_locate=500, cap=o.cap(), k_hits=16)

t0 = time.time()
out = se_ungapped(dix, f1, r1, **kw)
jax.block_until_ready(out.res.pos)
t_compile = time.time() - t0
t0 = time.time()
out = se_ungapped(dix, f2, r2, **kw)
jax.block_until_ready(out.res.pos)
t_run = time.time() - t0
print(f"ungapped B={B}: compile+run {t_compile:.2f}s, steady {t_run:.2f}s "
      f"({B/t_run:.0f} reads/s)")

# gapped stage timing (64-batch)
rows = jnp.arange(64, dtype=jnp.int32)
t0 = time.time()
sub = se_gapped(dix, f2[rows], r2[rows],
                jax.tree_util.tree_map(lambda a: a[rows], out.loci0),
                jax.tree_util.tree_map(lambda a: a[rows], out.loci1),
                k=10, k_hits=16)
jax.block_until_ready(sub.pos)
print(f"gapped compile+run {time.time()-t0:.2f}s")
t0 = time.time()
sub = se_gapped(dix, f1[rows], r1[rows],
                jax.tree_util.tree_map(lambda a: a[rows], out.loci0),
                jax.tree_util.tree_map(lambda a: a[rows], out.loci1),
                k=10, k_hits=16)
jax.block_until_ready(sub.pos)
print(f"gapped steady {time.time()-t0:.2f}s")
