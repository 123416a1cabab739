"""On-chip probe: LV Pallas kernel variants (v1 vs v3) + the sw_pallas
compile probe (one TPU process for both, per the tunnel protocol).

Timings are in-graph amortized (t_loop pattern): single-call timings
through the relay include a 10-30ms RPC round trip.

Usage: python tools/probe_lv_v3.py   (TPU required)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

VPU_PEAK = 8 * 128 * 0.94e9
LV_OPS_PER_CELL = 12


def t_loop(name, fn, perturb, *args, iters=16, reps=3):
    @jax.jit
    def looped(*a):
        def body(i, acc):
            out = fn(*perturb(a, i))
            return acc + out.reshape(-1)[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    t0 = time.perf_counter()
    jax.block_until_ready(looped(*args))
    print(f"[prof] {name:28s} first call {time.perf_counter()-t0:7.1f} s",
          flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(looped(*args))
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    print(f"[prof] {name:28s} {dt*1000:9.2f} ms/call", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(11)
    mlen = 1 << 20
    mix = (1 << rng.integers(0, 4, mlen)).astype(np.uint8)
    snp = rng.random(mlen) < 0.03
    mix[snp] |= (1 << rng.integers(0, 4, snp.sum())).astype(np.uint8)
    # pack nibbles into uint32 words (device_index layout)
    padded = np.zeros(((mlen + 7) // 8) * 8, np.uint8)
    padded[:mlen] = mix
    words = (padded.reshape(-1, 8).astype(np.uint32)
             << (np.arange(8, dtype=np.uint32) * 4)).sum(
        axis=1, dtype=np.uint32)
    mixw = jnp.asarray(words)

    from salt_tpu.ops.lv_pallas import lv_distance_batch_pallas
    from salt_tpu.ops.lv import lv_distance_batch

    NL = 8192
    pos = jnp.asarray(rng.integers(0, mlen - 200, NL).astype(np.int32))
    active = jnp.ones(NL, bool)
    seqs = jnp.asarray(rng.integers(0, 4, (NL, 100)).astype(np.int32))

    def pert(a, i):
        return (a[0].at[0].set(i), a[1], a[2])

    results = {}
    for K in (10, 3):
        for variant in ("v3", "v1"):
            def f(pos, active, seqs, _K=K, _v=variant):
                return lv_distance_batch_pallas(
                    mixw, pos, active, seqs, _K, text_words=True,
                    variant=_v)
            try:
                dt = t_loop(f"lv_{variant} N{NL} k{K}", f, pert,
                            pos, active, seqs)
                cells = NL * (2 * K + 1) * (100 + 8)
                util = cells / dt * LV_OPS_PER_CELL / VPU_PEAK
                print(f"[prof] lv_{variant} k{K}: {NL/dt/1e6:9.3f} Mcand/s, "
                      f"{cells/dt/1e9:.2f} Gcell/s = {100*util:.1f}% of "
                      f"conservative VPU peak", flush=True)
                results[(variant, K)] = NL / dt
            except Exception as e:
                print(f"[prof] lv_{variant} k{K} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)

    # cross-check v3 == v1 distances ON CHIP (not just interpret)
    for K in (10, 3):
        try:
            a = np.asarray(lv_distance_batch_pallas(
                mixw, pos, active, seqs, K, text_words=True, variant="v1"))
            b = np.asarray(lv_distance_batch_pallas(
                mixw, pos, active, seqs, K, text_words=True, variant="v3"))
            print(f"[prof] on-chip v1==v3 k{K}: {np.array_equal(a, b)} "
                  f"(diff {int((a != b).sum())})", flush=True)
        except Exception as e:
            print(f"[prof] on-chip parity k{K} FAILED: {e}", flush=True)

    # ---- sw_pallas compile probe (VERDICT #7: keep probing per round) ----
    from salt_tpu.ops.sw_pallas import sw_score_batch_pallas
    B, W, L = 256, 128, 100
    refs = jnp.asarray(rng.integers(1, 16, (B, W)).astype(np.int32))
    reads = jnp.asarray(
        (1 << rng.integers(0, 4, (B, L))).astype(np.int32))
    lens = jnp.full((B,), W, jnp.int32)
    for v in ("wave", "grid", "fori"):
        os.environ["SALT_TPU_SW_KERNEL"] = v
        try:
            out = sw_score_batch_pallas(refs, reads, lens, snp_mode=True)
            jax.block_until_ready(out)
            print(f"[prof] sw_pallas {v}: COMPILED+RAN on chip", flush=True)
        except Exception as e:
            print(f"[prof] sw_pallas {v}: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
