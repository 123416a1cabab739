"""Data-parallel scaling measurement on the virtual CPU mesh.

Real multi-chip hardware is not reachable from this environment, so two
stand-ins (BASELINE.md "scaling efficiency" row):

1. **Compiled-program accounting** (core-count independent): jit the
   data-parallel SE step over a 1-device and an 8-device mesh and
   compare per-device FLOPs/bytes from XLA's cost analysis.  The
   workload is embarrassingly parallel over reads; the replicated-index
   step partitions with NO collectives, so per-device work should be
   ~1/N of the monolithic program — the printed efficiency is the
   fraction it actually is.

2. **Sharded-index merge overhead**: the sharded engine adds all-gather
   + merged replay on top of per-shard work.  Measured as the extra
   per-device work of the 8-shard program vs 1/8 of the monolithic one.

Wall-clock on the virtual mesh is also printed but is bounded by the
host's 2 physical cores — it is NOT a scaling measurement.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python tools/scaling_probe.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import bench
from salt_tpu.index.build import build_index_from_data
from salt_tpu.pipeline.device_index import to_device_index
from salt_tpu.pipeline.engine import encode_reads, revcomp
from salt_tpu.parallel.mesh import make_mesh, replicate, shard_reads
from salt_tpu.pipeline.se import se_ungapped

B_PER_DEV = 512
KW = dict(l_overlap=1, max_seed=50, max_locate=500, cap=640, u=64, k_hits=8)


def main():
    contigs, blocks, reads = bench.make_fixture()
    idx = build_index_from_data(contigs, blocks, l_seed=19)
    dix = to_device_index(idx)
    codes = encode_reads(reads[: B_PER_DEV * 8]).astype(np.uint8)
    rcodes = revcomp(codes)

    results = {}
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(nd)
        B = B_PER_DEV * nd
        drep = replicate(mesh, dix)
        sf = shard_reads(mesh, codes[:B])
        sr = shard_reads(mesh, rcodes[:B])
        fn = jax.jit(lambda d, a, b: se_ungapped(d, a, b, **KW))
        lowered = fn.lower(drep, sf, sr)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        flops = ca.get("flops", float("nan"))
        bytes_ = ca.get("bytes accessed", float("nan"))
        out = jax.block_until_ready(fn(drep, sf, sr))
        t0 = time.time()
        for _ in range(3):
            out = jax.block_until_ready(fn(drep, sf, sr))
        wall = (time.time() - t0) / 3
        results[nd] = (flops, bytes_, wall, B)
        print(f"mesh={nd}: per-device flops {flops:.3e}, bytes {bytes_:.3e},"
              f" wall {wall*1e3:.0f}ms for {B} reads "
              f"({B/wall:.0f} reads/s on 2 host cores)", flush=True)

    f1, b1, _, _ = results[1]
    print("\nscaling accounting (replicated index, data-parallel reads):")
    for nd in (2, 4, 8):
        fN, bN, _, _ = results[nd]
        # fn at mesh=N processes N*B_PER_DEV reads; ideal per-device
        # work = the 1-device program's work (same per-device batch)
        eff_f = f1 / fN if fN else float("nan")
        eff_b = b1 / bN if bN else float("nan")
        print(f"  {nd} devices: flop efficiency {100*eff_f:.1f}%, "
              f"bytes efficiency {100*eff_b:.1f}%", flush=True)


if __name__ == "__main__":
    main()
