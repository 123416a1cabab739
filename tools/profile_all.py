"""One-shot TPU measurement suite: run every pending perf measurement
in a single process (the axon relay makes per-process compiles
expensive, so batch them).

Usage: python tools/profile_all.py [batch] [--skip-sampled]
Writes a summary to stdout; safe to re-run (persistent XLA cache).

Roofline accounting (printed): TPU v5e clock ~940MHz, VPU 8x128 lanes.
Conservative peak = 8*128*0.94e9 = 0.96e12 int32 lane-ops/s (one ALU op
per lane per cycle; the VPU can co-issue more, so true utilization is
at most the printed number).  Each SW DP cell costs ~16 lane-ops
(score 4, E 2, F 2+2 shift, H 3, mask 2, best 1); each LV DP cell ~12.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

VPU_PEAK = 8 * 128 * 0.94e9     # int32 lane-ops/s, conservative
SW_OPS_PER_CELL = 16
LV_OPS_PER_CELL = 12


def t(name, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"[prof] {name:24s} first call {time.perf_counter()-t0:7.1f} s "
          f"(compile)", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"[prof] {name:24s} {best*1000:9.2f} ms", flush=True)
    return best


def t_loop(name, fn, perturb, *args, iters=16, reps=3):
    """Time `fn` amortized over `iters` in-graph calls: single-call
    timings through the relay include a ~10-30ms RPC round trip, which
    swamps sub-50ms kernels.  `perturb(args, i)` must vary the input a
    little so XLA cannot CSE the repeated pure calls into one."""
    @jax.jit
    def looped(*a):
        def body(i, acc):
            out = fn(*perturb(a, i))
            return acc + out.reshape(-1)[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    t0 = time.perf_counter()
    jax.block_until_ready(looped(*args))
    print(f"[prof] {name:24s} first call {time.perf_counter()-t0:7.1f} s "
          f"(compile)", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(looped(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"[prof] {name:24s} {best*1000:9.2f} ms/call (x{iters} in-graph)",
          flush=True)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    skip_sampled = "--skip-sampled" in sys.argv

    import bench
    from salt_tpu.index.build import build_index_from_data
    from salt_tpu.ops.locate import locate, sort_loci
    from salt_tpu.ops.seed import seed_overlap
    from salt_tpu.pipeline.device_index import to_device_index
    from salt_tpu.pipeline.engine import encode_reads, revcomp
    from salt_tpu.pipeline.se import pack_result, se_ungapped

    contigs, blocks, reads = bench.make_fixture()
    idx = build_index_from_data(contigs, blocks, l_seed=19)
    dix = to_device_index(idx)
    codes = encode_reads(list(reads[:batch]))
    fwd = jnp.asarray(codes.astype(np.int32))
    rev = jnp.asarray(revcomp(codes).astype(np.int32))

    @jax.jit
    def f_full(f, r):
        out = se_ungapped(dix, f, r, l_overlap=1, max_seed=50,
                          max_locate=500, cap=640, u=64, k_hits=8)
        return pack_result(out.res, (out.needs_gap, out.overflow))

    dt = t("se_ungapped+pack", f_full, fwd, rev)
    print(f"[prof] ungapped-only equiv    {batch/dt:9.0f} reads/s", flush=True)

    # ---- per-stage breakdown (each stage as its own jit) ----
    @jax.jit
    def f_seed(f, r):
        seq2 = jnp.concatenate([f, r], axis=0)
        return seed_overlap(dix.ri_c, dix.ri_r, dix.lkt, seq2, idx.l_seed,
                            1, 50, r_lkt_sp=dix.r_lkt_sp,
                            r_lkt_ep=dix.r_lkt_ep)

    dts = t("stage: seed", f_seed, fwd, rev)
    cs, rs = jax.block_until_ready(f_seed(fwd, rev))

    @jax.jit
    def f_locate(cs, rs):
        out = locate(cs, rs, dix.sa_cat, dix.c_sa_len, fwd.shape[1],
                     idx.l_pac, 500, 640)
        return sort_loci(out.loci), out.overflow

    dtl = t("stage: locate+sort", f_locate, cs, rs)
    print(f"[prof] (seed {dts*1000:.0f}ms + locate {dtl*1000:.0f}ms of "
          f"{dt*1000:.0f}ms total; verify/select = rest)", flush=True)

    # sampled-SA locate timing
    if not skip_sampled:
        dix_s, sampled = to_device_index(idx, sa_mode="sampled")

        @jax.jit
        def f_sampled(f, r):
            out = se_ungapped(dix_s, f, r, l_overlap=1, max_seed=50,
                              max_locate=500, cap=640, u=64, k_hits=8,
                              sampled=sampled)
            return pack_result(out.res, (out.needs_gap, out.overflow))

        dts2 = t("se_ungapped (sampled)", f_sampled, fwd, rev)
        print(f"[prof] sampled overhead       {dts2/dt:9.2f}x", flush=True)

    # ---- Pallas SW kernel roofline ----
    from salt_tpu.ops.sw_batch import sw_score_batch
    from salt_tpu.ops.sw_pallas import sw_score_batch_pallas

    B, W, L = 4096, 512, 100
    rng = np.random.default_rng(0)
    refs = jnp.asarray((1 << rng.integers(0, 4, (B, W))).astype(np.int32))
    rds = jnp.asarray((1 << rng.integers(0, 4, (B, L))).astype(np.int32))
    lens = jnp.full((B,), W, jnp.int32)

    def f_sw(refs, rds, lens):
        return sw_score_batch_pallas(refs, rds, lens, snp_mode=True)

    def pert_sw(a, i):
        return (a[0].at[0, 0].set(i), a[1], a[2])

    try:
        dt = t_loop(f"sw_pallas B{B} {L}x{W}", f_sw, pert_sw,
                    refs, rds, lens)
        cells = B * W * L
        util = cells / dt * SW_OPS_PER_CELL / VPU_PEAK
        print(f"[prof] sw_pallas              {cells/dt/1e9:9.2f} Gcell/s "
              f"= {100*util:.1f}% of conservative VPU peak "
              f"({SW_OPS_PER_CELL} ops/cell, {VPU_PEAK/1e12:.2f} Top/s)",
              flush=True)
    except Exception as e:
        print(f"[prof] sw_pallas FAILED: {type(e).__name__}: {e}",
              flush=True)

    def f_sw_xla(refs, rds, lens):
        return sw_score_batch(refs, rds, lens, snp_mode=True)

    dt = t_loop(f"sw_xla    B{B} {L}x{W}", f_sw_xla, pert_sw,
                refs, rds, lens)
    print(f"[prof] sw_xla                 {B*W*L/dt/1e9:9.2f} Gcell/s",
          flush=True)

    # ---- Pallas LV kernel roofline ----
    from salt_tpu.ops.lv import lv_distance_batch
    from salt_tpu.ops.lv_pallas import lv_distance_batch_pallas

    NL = 8192
    K = 10
    pos = jnp.asarray(rng.integers(0, idx.l_pac - 200, NL).astype(np.int32))
    active = jnp.ones(NL, bool)
    seqs = jnp.asarray(rng.integers(0, 4, (NL, 100)).astype(np.int32))
    mixw = dix.mixref_words

    def f_lv(pos, active, seqs):
        return lv_distance_batch_pallas(mixw, pos, active, seqs, K,
                                        text_words=True)

    def pert_lv(a, i):
        return (a[0].at[0].set(i), a[1], a[2])

    try:
        dt = t_loop(f"lv_pallas N{NL} k{K}", f_lv, pert_lv,
                    pos, active, seqs)
        # banded DP: (2k+1) diagonals x (L+pad) steps per candidate
        cells = NL * (2 * K + 1) * (100 + 8)
        util = cells / dt * LV_OPS_PER_CELL / VPU_PEAK
        print(f"[prof] lv_pallas              {NL/dt/1e6:9.3f} Mcand/s, "
              f"{cells/dt/1e9:.2f} Gcell/s = {100*util:.1f}% of "
              f"conservative VPU peak", flush=True)
    except Exception as e:
        print(f"[prof] lv_pallas FAILED: {type(e).__name__}: {e}",
              flush=True)

    def f_lv_xla(pos, active, seqs):
        return lv_distance_batch(mixw, pos, active, seqs, K,
                                 text_words=True)

    dt = t_loop(f"lv_xla    N{NL} k{K}", f_lv_xla, pert_lv,
                pos, active, seqs)
    print(f"[prof] lv_xla                 {NL/dt/1e6:9.3f} Mcand/s",
          flush=True)


if __name__ == "__main__":
    main()
