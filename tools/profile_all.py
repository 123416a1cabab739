"""One-shot TPU measurement suite: run every pending perf measurement
in a single process (the axon relay makes per-process compiles
expensive, so batch them).

Usage: python tools/profile_all.py [batch] [--skip-sampled]
Writes a summary to stdout; safe to re-run (persistent XLA cache).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"[prof] {name:24s} {best*1000:9.2f} ms", flush=True)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    skip_sampled = "--skip-sampled" in sys.argv

    from salt_tpu.index.store import load_index
    from salt_tpu.pipeline.device_index import to_device_index
    from salt_tpu.pipeline.engine import encode_reads, revcomp
    from salt_tpu.pipeline.se import pack_result, se_gapped, se_ungapped

    assert os.path.exists("/tmp/fix/bench.salt.npz"), \
        "run: python -c 'import bench;...' to cache the fixture first"
    idx = load_index("/tmp/fix/bench")
    dix = to_device_index(idx)
    reads = np.load("/tmp/fix/reads.npy")
    codes = encode_reads(list(reads[:batch]))
    fwd = jnp.asarray(codes.astype(np.int32))
    rev = jnp.asarray(revcomp(codes).astype(np.int32))

    @jax.jit
    def f_full(f, r):
        out = se_ungapped(dix, f, r, l_overlap=1, max_seed=50,
                          max_locate=500, cap=640, u=64, k_hits=16)
        return pack_result(out.res, (out.needs_gap, out.overflow))

    dt = t("se_ungapped+pack", f_full, fwd, rev)
    print(f"[prof] ungapped-only equiv    {batch/dt:9.0f} reads/s", flush=True)

    # sampled-SA locate timing
    if not skip_sampled:
        dix_s, sampled = to_device_index(idx, sa_mode="sampled")

        @jax.jit
        def f_sampled(f, r):
            out = se_ungapped(dix_s, f, r, l_overlap=1, max_seed=50,
                              max_locate=500, cap=640, u=64, k_hits=16,
                              sampled=sampled)
            return pack_result(out.res, (out.needs_gap, out.overflow))

        dts = t("se_ungapped (sampled)", f_sampled, fwd, rev)
        print(f"[prof] sampled overhead       {dts/dt:9.2f}x", flush=True)

    # Pallas SW kernel throughput + roofline estimate
    from salt_tpu.ops.sw_pallas import sw_score_batch_pallas

    B, W, L = 4096, 512, 100
    rng = np.random.default_rng(0)
    refs = jnp.asarray((1 << rng.integers(0, 4, (B, W))).astype(np.int32))
    rds = jnp.asarray((1 << rng.integers(0, 4, (B, L))).astype(np.int32))
    lens = jnp.full((B,), W, jnp.int32)

    def f_sw(refs, rds, lens):
        return sw_score_batch_pallas(refs, rds, lens, snp_mode=True)

    dt = t(f"sw_pallas B{B} {L}x{W}", f_sw, refs, rds, lens)
    cells = B * W * L
    print(f"[prof] sw cells/s             {cells/dt/1e9:9.2f} Gcell/s",
          flush=True)

    # Pallas LV kernel
    from salt_tpu.ops.lv_pallas import lv_distance_batch_pallas

    NL = 8192
    pos = jnp.asarray(rng.integers(0, idx.l_pac - 200, NL).astype(np.int32))
    active = jnp.ones(NL, bool)
    seqs = jnp.asarray(rng.integers(0, 4, (NL, 100)).astype(np.int32))
    mixw = dix.mixref_words

    def f_lv(pos, active, seqs):
        return lv_distance_batch_pallas(mixw, pos, active, seqs, 10,
                                        text_words=True)

    dt = t(f"lv_pallas N{NL} k10", f_lv, pos, active, seqs)
    print(f"[prof] lv candidates/s        {NL/dt/1e6:9.2f} M/s", flush=True)


if __name__ == "__main__":
    main()
