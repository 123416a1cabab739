"""Pallas TPU kernel for the SNP-aware banded Landau-Vishkin distance.

Semantics identical to ops/lv.py:lv_distance_batch (the batched
re-expression of Align_src/LandauVishkin.c:19-122, including the
equality guard at the seed cell — LandauVishkin.c:79).  The jnp version
materializes (N, D, L+1) match/temporary tensors in HBM on every one of
the k wavefront iterations; this kernel keeps one 128-candidate tile's
whole DP state in VMEM, so the k iterations never touch HBM.

Layout: candidates ride the 128-wide lane axis; read positions ride the
sublane axis.  All diagonal indexing is static (python loop over the
2k+1 diagonals), per-lane dynamic indexing is done with iota-compare
reductions (TPU-friendly; no gathers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GAP_WINDOW_PAD, LV_MAX_K

LANES = 128
BIG = 255
NEG = -2


def _lv_tile_kernel(text_ref, pat_ref, out_ref, *, k: int, L: int, TL: int):
    """One tile: text (TL + 2k + 1, LANES) uint8 nibbles (pre-padded),
    pat (L + 1, LANES) uint8 one-hot (row L is zero), out (8, LANES) int32
    (row 0 = distance, rest padding for tile alignment)."""
    D = 2 * k + 1
    text = text_ref[...].astype(jnp.int32)      # (TLP, LANES)
    pat = pat_ref[...].astype(jnp.int32)        # (L+1, LANES)

    ii = jax.lax.broadcasted_iota(jnp.int32, (L + 1, LANES), 0)

    def first_and_zero(m, r):
        """smallest i >= r with m[i] == 0 per lane; m (L+1, LANES) bool,
        r (1, LANES) int32."""
        cand = jnp.where((~m) & (ii >= r), ii, L + 1)
        return jnp.min(cand, axis=0, keepdims=True)    # (1, LANES)

    def match(d):
        """m[i] = (pat[i] & text[i + d + k]) != 0 — static slice per d."""
        twin = jax.lax.slice_in_dim(text, d + k, d + k + L + 1, axis=0)
        return (pat & twin) != 0

    def sel_at(arr, idx):
        """arr[idx[lane], lane] via iota-compare (no gather); arr
        (L+1, LANES), idx (1, LANES) in [0, L]."""
        return jnp.max(jnp.where(ii == idx, arr, 0), axis=0, keepdims=True)

    # phase 1: diagonal 0 run from 0
    m0 = match(0)
    zero = jnp.zeros((1, LANES), jnp.int32)
    run0 = jnp.minimum(first_and_zero(m0, zero), L)
    result = jnp.where(run0 >= L, 0, BIG)

    # per-diagonal reach rows; python list indexed statically
    Lrow = [jnp.full((1, LANES), NEG, jnp.int32) for _ in range(D)]
    Lrow[k] = run0

    for e in range(1, k + 1):
        newLrow = list(Lrow)
        hit_any = jnp.zeros((1, LANES), bool)
        for dd in range(k - e, k + e + 1):
            d = dd - k
            up = Lrow[dd] + 1
            left = Lrow[dd - 1] if dd - 1 >= 0 else jnp.full(
                (1, LANES), NEG, jnp.int32)
            right = (Lrow[dd + 1] + 1) if dd + 1 < D else jnp.full(
                (1, LANES), NEG, jnp.int32)
            best = jnp.maximum(jnp.maximum(up, left), right)
            bestc = jnp.clip(best, 0, L)
            m_d = match(d)
            tslice = jax.lax.slice_in_dim(text, d + k, d + k + L + 1, axis=0)
            pb = sel_at(pat, bestc)
            tb = sel_at(tslice, bestc)
            can_ext = (pb == tb) & (best >= 0)
            endl_d = min(L, TL - d)
            run = jnp.minimum(first_and_zero(m_d, bestc), endl_d)
            reach = jnp.where(can_ext, run, best)
            newLrow[dd] = reach
            hit_any = hit_any | (reach >= L)
        Lrow = newLrow
        result = jnp.where(hit_any & (result == BIG), e, result)

    out = jnp.broadcast_to(result, (8, LANES))
    out_ref[...] = out


@partial(jax.jit, static_argnames=("k", "interpret", "text_words"))
def lv_distance_batch_pallas(
    mixref: jnp.ndarray,   # uint8 [l_mref], or uint32 words (text_words)
    pos: jnp.ndarray,      # int32 (N,)
    active: jnp.ndarray,   # bool (N,)
    seq: jnp.ndarray,      # (N, L) read codes
    k: int,
    interpret: bool = False,
    text_words: bool = False,
) -> jnp.ndarray:
    """Drop-in equivalent of lv_distance_batch (distances, BIG=255 when
    inactive/no alignment within k)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .lv import NT2BIT_NP

    N, L = seq.shape
    TL = L + GAP_WINDOW_PAD
    k = min(LV_MAX_K - 1, k)

    NP_ = ((N + LANES - 1) // LANES) * LANES
    padN = NP_ - N

    base = jnp.where(active, pos, 0)
    # positions may exceed 2^31 (whole-genome mixRef): do the word
    # shift/mask through uint32, word index fits int32 again
    tidx = (base[:, None].astype(jnp.uint32)
            + jnp.arange(TL, dtype=jnp.uint32))
    if text_words:
        widx = jnp.clip((tidx >> 3).astype(jnp.int32), 0,
                        mixref.shape[0] - 1)
        w = mixref[widx].astype(jnp.uint32)
        text = ((w >> ((tidx & 7) * 4)) & 15).astype(
            jnp.uint8)
    else:
        tidx = jnp.clip(tidx.astype(jnp.int32), 0, mixref.shape[0] - 1)
        text = mixref[tidx]                              # (N, TL)
    pat = jnp.asarray(NT2BIT_NP)[jnp.clip(seq, 0, 4)]    # (N, L)

    # transpose to (positions, candidates); pad candidate axis to LANES.
    # Position padding: k rows of text[0] on top (the jnp version clips
    # negative i+d to index 0) and k+1 zero rows at the bottom.
    tt = text.T.astype(jnp.uint8)
    text_t = jnp.concatenate(
        [
            jnp.broadcast_to(tt[0:1], (k, tt.shape[1])),
            tt,
            jnp.zeros((k + 1, tt.shape[1]), jnp.uint8),
        ],
        axis=0,
    )
    text_t = jnp.pad(text_t, ((0, 0), (0, padN)))        # (TL+2k+1, NP)
    pat_t = jnp.pad(pat.T.astype(jnp.uint8), ((0, 1), (0, padN)))

    TLP = TL + 2 * k + 1
    grid = (NP_ // LANES,)
    out = pl.pallas_call(
        partial(_lv_tile_kernel, k=k, L=L, TL=TL),
        out_shape=jax.ShapeDtypeStruct((8, NP_), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TLP, LANES), lambda i: (0, i),
                             memory_space=pltpu.ANY
                             if False else pltpu.VMEM),
                pl.BlockSpec((L + 1, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(text_t, pat_t)
    res = out[0, :N]
    return jnp.where(active, res, BIG)
