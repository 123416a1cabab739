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


def _lv_tile_kernel_v2(text_ref, pat_ref, out_ref, *, k: int, L: int,
                       TL: int):
    """Reduction-lean variant (SALT_TPU_LV_KERNEL=v2): the inner
    (e, diagonal) loop pays TWO full-height reductions instead of four.
    Per diagonal, precompute once:
      nm_d[i]  — first j >= i with a mismatch (suffix-min by doubling:
                 7 shift+min steps), replacing first_and_zero's scan
      eq_d[i]  — the seed-cell equality guard plane (pat[i] == text[i])
    so the inner loop is sel_at(eq_d) + sel_at(nm_d).  Semantics are
    identical to _lv_tile_kernel (parity-tested in interpret mode);
    pending on-chip validation before becoming the default."""
    D = 2 * k + 1
    text = text_ref[...].astype(jnp.int32)      # (TLP, LANES)
    pat = pat_ref[...].astype(jnp.int32)        # (L+1, LANES)

    ii = jax.lax.broadcasted_iota(jnp.int32, (L + 1, LANES), 0)
    BIGI = jnp.int32(L + 1)

    def sel_at(arr, idx):
        return jnp.max(jnp.where(ii == idx, arr, 0), axis=0, keepdims=True)

    # per-diagonal precompute
    nm = []
    eq = []
    for dd in range(D):
        d = dd - k
        twin = jax.lax.slice_in_dim(text, d + k, d + k + L + 1, axis=0)
        m_d = (pat & twin) != 0
        a = jnp.where(m_d, BIGI, ii)
        s = 1
        while s <= L:
            up = jnp.concatenate(
                [a[s:], jnp.full((s, LANES), L + 1, jnp.int32)], axis=0)
            a = jnp.minimum(a, up)
            s *= 2
        nm.append(a)
        eq.append((pat == twin).astype(jnp.int32))

    zero = jnp.zeros((1, LANES), jnp.int32)
    run0 = jnp.minimum(nm[k][0:1, :], L)
    result = jnp.where(run0 >= L, 0, BIG)

    NEGR = jnp.full((1, LANES), NEG, jnp.int32)
    Lrow = [NEGR for _ in range(D)]
    Lrow[k] = run0

    for e in range(1, k + 1):
        newLrow = list(Lrow)
        hit_any = jnp.zeros((1, LANES), bool)
        for dd in range(k - e, k + e + 1):
            d = dd - k
            up = Lrow[dd] + 1
            left = Lrow[dd - 1] if dd - 1 >= 0 else NEGR
            right = (Lrow[dd + 1] + 1) if dd + 1 < D else NEGR
            best = jnp.maximum(jnp.maximum(up, left), right)
            bestc = jnp.clip(best, 0, L)
            can_ext = (sel_at(eq[dd], bestc) == 1) & (best >= 0)
            endl_d = min(L, TL - d)
            run = jnp.minimum(sel_at(nm[dd], bestc), endl_d)
            reach = jnp.where(can_ext, run, best)
            newLrow[dd] = reach
            hit_any = hit_any | (reach >= L)
        Lrow = newLrow
        result = jnp.where(hit_any & (result == BIG), e, result)

    out_ref[...] = jnp.broadcast_to(result, (8, LANES))


@partial(jax.jit, static_argnames=("k", "interpret", "text_words",
                                   "variant"))
def lv_distance_batch_pallas(
    mixref: jnp.ndarray,   # uint8 [l_mref], or uint32 words (text_words)
    pos: jnp.ndarray,      # int32 (N,)
    active: jnp.ndarray,   # bool (N,)
    seq: jnp.ndarray,      # (N, L) read codes
    k: int,
    interpret: bool = False,
    text_words: bool = False,
    variant: str = None,
) -> jnp.ndarray:
    """Drop-in equivalent of lv_distance_batch (distances, BIG=255 when
    inactive/no alignment within k).  `variant` (default from
    SALT_TPU_LV_KERNEL, "v1") selects the kernel formulation; "v2" is
    the reduction-lean rewrite pending on-chip validation."""
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

    import os as _os

    if variant is None:
        variant = _os.environ.get("SALT_TPU_LV_KERNEL", "v1")
    kernel = _lv_tile_kernel_v2 if variant == "v2" else _lv_tile_kernel

    TLP = TL + 2 * k + 1
    grid = (NP_ // LANES,)
    out = pl.pallas_call(
        partial(kernel, k=k, L=L, TL=TL),
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
