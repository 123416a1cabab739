"""Single-end alignment pipeline: batched device steps.

Mirrors alnse_overlap_alt (Align_src/alnse.c:1045-1104): seed both
strands, locate, ungapped check with the shrinking threshold, and — only
for reads with no ungapped hit on either strand — the gapped
Landau-Vishkin check (alnse_check_withgap, alnse.c:871-901).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import (
    GAP_WINDOW_PAD,
    NOGAP_MAX_DIFF,
    UINT32_MAX,
)
from ..ops.locate import Loci, locate, sort_loci
from ..ops.lv import lv_distance_batch
from ..ops.seed import seed_overlap
from ..ops.verify import (
    SEResult,
    StrandVerify,
    mismatch_counts,
    replay_and_select,
)
from .device_index import DeviceIndex


class UngappedOut(NamedTuple):
    res: SEResult
    needs_gap: jnp.ndarray   # bool (B,)
    loci0: Loci
    loci1: Loci


@partial(jax.jit, static_argnames=("l_overlap", "max_seed", "max_locate", "cap", "k_hits"))
def se_ungapped(
    dix: DeviceIndex,
    seq_f: jnp.ndarray,     # (B, L) forward codes
    seq_r: jnp.ndarray,     # (B, L) reverse-complement codes
    l_overlap: int,
    max_seed: int,
    max_locate: int,
    cap: int,
    k_hits: int = 8,
) -> UngappedOut:
    L = seq_f.shape[-1]

    def one_strand(seq):
        c_seeds, r_seeds = seed_overlap(
            dix.ri_c, dix.ri_r, dix.lkt, seq, dix.l_seed, l_overlap, max_seed
        )
        lc = locate(
            c_seeds, r_seeds, dix.csa, dix.r_coord, L, dix.l_pac,
            max_locate, cap,
        )
        lc = sort_loci(lc)
        return lc, mismatch_counts(dix.mixref, lc, seq, dix.l_pac)

    loci0, v0 = one_strand(seq_f)
    loci1, v1 = one_strand(seq_r)
    res = replay_and_select(v0, v1, NOGAP_MAX_DIFF, k_hits)
    return UngappedOut(res=res, needs_gap=~res.found, loci0=loci0, loci1=loci1)


@partial(jax.jit, static_argnames=("k", "chunk", "k_hits"))
def se_gapped(
    dix: DeviceIndex,
    seq_f: jnp.ndarray,   # (Bg, L)
    seq_r: jnp.ndarray,
    loci0: Loci,          # (Bg, CAP) sorted
    loci1: Loci,
    k: int,
    chunk: int = 64,
    k_hits: int = 8,
) -> SEResult:
    Bg, L = seq_f.shape
    CAP = loci0.pos.shape[-1]
    l_mref = dix.l_pac

    def strand_verify(loci: Loci, seq) -> StrandVerify:
        pos = loci.pos
        prev = jnp.concatenate(
            [jnp.full((Bg, 1), UINT32_MAX, dtype=pos.dtype), pos[:, :-1]],
            axis=1,
        )
        # skip rule of alnse_check_withgap (alnse.c:894): uint32 wraparound
        end_u = pos + jnp.uint32(L + GAP_WINDOW_PAD)
        checked = loci.pushed & (pos != prev) & (end_u < jnp.uint32(l_mref))
        # ed_diff guard (editdistance.c:178): out-of-range -> -1 (BIG)
        in_ref = (pos <= jnp.uint32(l_mref)) & (end_u <= jnp.uint32(l_mref))
        active = checked & in_ref

        n_chunks = CAP // chunk
        pos_c = pos.astype(jnp.int32).reshape(Bg, n_chunks, chunk)
        act_c = active.reshape(Bg, n_chunks, chunk)

        def do_chunk(c):
            p, a = c
            # flatten (Bg, chunk) -> (Bg*chunk,)
            d = lv_distance_batch(
                dix.mixref,
                p.reshape(-1),
                a.reshape(-1),
                jnp.repeat(seq, chunk, axis=0),
                k,
            )
            return d.reshape(Bg, chunk)

        dists = jax.lax.map(
            do_chunk, (jnp.moveaxis(pos_c, 1, 0), jnp.moveaxis(act_c, 1, 0))
        )  # (n_chunks, Bg, chunk)
        dists = jnp.moveaxis(dists, 0, 1).reshape(Bg, CAP)
        counts = jnp.where(checked, jnp.where(active, dists, 255), 255)
        # clamp: anything above k can never be a hit
        counts = jnp.minimum(counts, k + 1)
        counts = jnp.where(checked, counts, 255)
        return StrandVerify(counts=counts, checked=checked, pos=pos)

    v0 = strand_verify(loci0, seq_f)
    v1 = strand_verify(loci1, seq_r)
    return replay_and_select(v0, v1, k, k_hits)
