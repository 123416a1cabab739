"""Time TPU compiles of each se_ungapped sub-piece in isolation.

Run on the TPU (one process at a time through the relay!):
    nohup python tools/compile_probe.py > /tmp/compile_probe.log 2>&1 &

Each piece is jitted at bench-representative shapes (B=4096 strands
stacked to 8192, S=82 seeds, cap=640, u=64) and timed; output is
flushed line by line, so if one piece wedges the log shows which.
Set SALT_TPU_EFFORT=-1 to test with minimal XLA optimization effort.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

effort = os.environ.get("SALT_TPU_EFFORT")
if effort:
    jax.config.update("jax_exec_time_optimization_effort", float(effort))
    jax.config.update("jax_memory_fitting_effort", float(effort))

# fresh-compile every piece: no persistent cache
jax.config.update("jax_enable_compilation_cache", False)

B2, S, CAP, U, L, K = 8192, 82, 640, 64, 100, 16

say = lambda *a: print(*a, flush=True)


def timed(name, fn, *args):
    t0 = time.time()
    jax.block_until_ready(jax.jit(fn)(*args))
    say(f"{name:32s} compile+run {time.time()-t0:8.2f}s")


say(f"devices: {jax.devices()}  effort={effort}")

rng = np.random.default_rng(0)
key2 = jnp.asarray(rng.integers(0, 2**28, (B2, 2 * S), np.int32))
ops5 = [key2] + [jnp.asarray(rng.integers(0, 1000, (B2, 2 * S), np.int32))
                 for _ in range(4)]

timed("sort_1op_2S", lambda k: jax.lax.sort([k], dimension=1, num_keys=1,
                                            is_stable=True)[0], key2)
timed("sort_5op_2S_stable",
      lambda *o: jax.lax.sort(list(o), dimension=1, num_keys=1,
                              is_stable=True)[0], *ops5)

posc = jnp.asarray(rng.integers(0, 2**31, (B2, CAP), np.uint32))
timed("sort_1op_CAP640",
      lambda k: jax.lax.sort([k], dimension=1, num_keys=1)[0], posc)

cnt = jnp.asarray(rng.integers(0, 8, (B2, 2 * S), np.int32))


def slot_fill(cnt):
    cum = jnp.cumsum(cnt, axis=-1)
    cum_ex = cum - cnt
    starts = jnp.where(cnt > 0, cum_ex, CAP)
    rows_i = jnp.arange(B2, dtype=jnp.int32)[:, None]
    marks = jnp.zeros((B2, CAP), dtype=jnp.int32)
    marks = marks.at[rows_i, jnp.clip(starts, 0, CAP)].max(
        jnp.broadcast_to(jnp.arange(1, 2 * S + 1, dtype=jnp.int32),
                         (B2, 2 * S)), mode="drop")
    return jax.lax.associative_scan(jnp.maximum, marks, axis=-1) - 1


timed("scatter_max_cummax_fill", slot_fill, cnt)

checked = jnp.asarray(rng.integers(0, 2, (B2, CAP)).astype(bool))


def compact(pos, chk):
    tgt = jnp.cumsum(chk.astype(jnp.int32), axis=-1) - 1
    tgt = jnp.where(chk, tgt, U)
    rows = jnp.arange(B2, dtype=jnp.int32)[:, None]
    out = jnp.full((B2, U), 0xFFFFFFFF, dtype=pos.dtype)
    return out.at[rows, tgt].set(pos, mode="drop")


timed("compact_scatter_set", compact, posc, checked)

words = jnp.asarray(rng.integers(0, 2**32, (200000,), np.int64).astype(np.uint32))
posu = jnp.asarray(rng.integers(0, 1000000, (B2, U), np.uint32))
keep = jnp.asarray(rng.integers(0, 2, (B2, U)).astype(bool))
seq2 = jnp.asarray(rng.integers(0, 4, (B2, L), np.int32))


def verify(words, pos, keep, seq):
    from salt_tpu.ops.verify import mismatch_counts_packed

    return mismatch_counts_packed(words, pos, keep, seq, 4).counts


timed("mismatch_counts_packed", verify, words, posu, keep, seq2)


def replay(c0, c1, p0, p1, k0, k1):
    from salt_tpu.ops.verify import StrandVerify, replay_and_select

    v0 = StrandVerify(counts=c0, checked=k0, pos=p0)
    v1 = StrandVerify(counts=c1, checked=k1, pos=p1)
    return replay_and_select(v0, v1, 3, K).pos


cc = jnp.asarray(rng.integers(0, 255, (B2 // 2, U), np.int32))
pp = jnp.asarray(rng.integers(0, 2**31, (B2 // 2, U), np.uint32))
kk = jnp.asarray(rng.integers(0, 2, (B2 // 2, U)).astype(bool))
timed("replay_and_select", replay, cc, cc, pp, pp, kk, kk)

# seed + locate against a real (small) index
from salt_tpu.index.build import build_index_from_data
from salt_tpu.io.snp import SnpBlock
from salt_tpu.pipeline.device_index import to_device_index

gseq = "".join("ACGT"[c] for c in rng.integers(0, 4, 60000))
idx = build_index_from_data(
    [("c1", "x", gseq)],
    [SnpBlock("c1", np.array([10], np.uint32), np.array([0x13], np.uint8))],
    l_seed=19,
)
dix = to_device_index(idx)


def seed_only(seq2b):
    from salt_tpu.ops.seed import seed_overlap

    c, r = seed_overlap(dix.ri_c, dix.ri_r, dix.lkt, seq2b, dix.l_seed, 1,
                        50, r_lkt_sp=dix.r_lkt_sp, r_lkt_ep=dix.r_lkt_ep)
    return c.sp, r.sp


timed("seed_overlap_fused", seed_only, seq2)


def locate_only(seq2b):
    from salt_tpu.ops.locate import locate, sort_loci
    from salt_tpu.ops.seed import seed_overlap

    c, r = seed_overlap(dix.ri_c, dix.ri_r, dix.lkt, seq2b, dix.l_seed, 1,
                        50, r_lkt_sp=dix.r_lkt_sp, r_lkt_ep=dix.r_lkt_ep)
    lo = locate(c, r, dix.sa_cat, dix.c_sa_len, L, dix.l_pac, 500, CAP)
    return sort_loci(lo.loci).pos


timed("seed+locate+sort", locate_only, seq2)


def full(seqf, seqr):
    from salt_tpu.pipeline.se import se_ungapped

    out = se_ungapped(dix, seqf, seqr, l_overlap=1, max_seed=50,
                      max_locate=500, cap=CAP, u=U, k_hits=K)
    return out.res.pos


half = seq2[: B2 // 2]
timed("se_ungapped_full_program", full, half, half)
say("ALL DONE")
