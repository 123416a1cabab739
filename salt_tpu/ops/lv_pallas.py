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


def _lv_tile_kernel_v3(mm_ref, eq_ref, out_ref, *, k: int, L: int, TL: int,
                       NW: int):
    """Multi-candidate-per-sublane, bit-packed formulation (v3).

    v1/v2 carry one candidate per lane: every banded step is a chain of
    (1, 128)-row ops plus two (L+1, 128) full-height reductions, so the
    VPU runs 1 of 8 sublanes and the ~k^2 steps serialize into a latency
    chain (measured 2.36 Gcell/s, ~3% of peak; the v2 reduction-lean
    rewrite proved reductions were NOT the bound).  v3 re-lays the tile:

      * 1024 candidates per grid step as a full (8, 128) VREG — the
        same per-step latency chain now serves 8x the candidates;
      * the per-diagonal match/equality planes arrive BIT-PACKED
        (NW = ceil((L+1)/32) int32 words per diagonal, packed in XLA
        outside the kernel), so the two data-dependent lookups per step
        — "first mismatch at position >= r" and "equality bit at r" —
        are ~40 elementwise ops (per-lane variable shifts + a float32
        exponent trick for count-trailing-zeros) instead of (L+1)-row
        iota-compare reductions.

    State per diagonal is one (8, 128) int32 VREG; all slicing is
    static; no gathers, no dynamic slices — the op classes the relay
    toolchain's Mosaic has always compiled.

    mm_ref/eq_ref: (D*NW, 8, 128) int32 — diagonal-major packed words;
    bit j of word (dd*NW + w) is position i = 32w + j on diagonal
    dd - k.  mm bit = 1 where the SNP-aware match FAILS (pat one-hot &
    text nibble == 0; position L and beyond forced 1).  eq bit = the
    seed-cell equality guard pat == text (LandauVishkin.c:79).
    out: (8, 128) int32 distances (BIG when > k)."""
    D = 2 * k + 1
    shape = (8, LANES)
    SENT = jnp.int32(L + 127)        # > any valid position

    def run_from(dd, r):
        """First i >= r with a mismatch on diagonal dd; r in [0, L].
        Always <= L (bit L is forced mismatch)."""
        first = jnp.full(shape, SENT, jnp.int32)
        for w in range(NW):
            mm = mm_ref[dd * NW + w, :, :]
            sh = jnp.clip(r - 32 * w, 0, 31)
            mask = jnp.where(r - 32 * w >= 32, 0, jnp.int32(-1) << sh)
            m = mm & mask
            iso = m & (-m)                    # lowest set bit, 2's compl
            f32 = iso.astype(jnp.float32)     # exact for any single bit
            expo = (jax.lax.bitcast_convert_type(f32, jnp.int32) >> 23) & 0xFF
            idx = 32 * w + (expo - 127)
            first = jnp.minimum(first, jnp.where(m != 0, idx, SENT))
        return first

    def eq_at(dd, r):
        word = jnp.zeros(shape, jnp.int32)
        wi = r >> 5
        for w in range(NW):
            word = jnp.where(wi == w, eq_ref[dd * NW + w, :, :], word)
        return (word >> (r & 31)) & 1

    zero = jnp.zeros(shape, jnp.int32)
    run0 = jnp.minimum(run_from(k, zero), L)
    result = jnp.where(run0 >= L, 0, BIG)

    NEGR = jnp.full(shape, NEG, jnp.int32)
    Lrow = [NEGR for _ in range(D)]
    Lrow[k] = run0

    for e in range(1, k + 1):
        newLrow = list(Lrow)
        hit_any = jnp.zeros(shape, bool)
        for dd in range(k - e, k + e + 1):
            d = dd - k
            up = Lrow[dd] + 1
            left = Lrow[dd - 1] if dd - 1 >= 0 else NEGR
            right = (Lrow[dd + 1] + 1) if dd + 1 < D else NEGR
            best = jnp.maximum(jnp.maximum(up, left), right)
            bestc = jnp.clip(best, 0, L)
            can_ext = (eq_at(dd, bestc) == 1) & (best >= 0)
            endl_d = min(L, TL - d)
            run = jnp.minimum(run_from(dd, bestc), endl_d)
            reach = jnp.where(can_ext, run, best)
            newLrow[dd] = reach
            hit_any = hit_any | (reach >= L)
        Lrow = newLrow
        result = jnp.where(hit_any & (result == BIG), e, result)

    out_ref[...] = result


def _pack_v3(text: jnp.ndarray, pat: jnp.ndarray, k: int, L: int):
    """XLA-side bit packing for the v3 kernel.  text (N, TL) uint8
    nibbles, pat (N, L) uint8 one-hot.  Returns (mm, eq) as
    (D*NW, 8, T*128) int32 word planes in the kernel's candidate
    layout (candidate c -> tile c//1024, sublane (c//128)%8, lane
    c%128), plus (T, NW)."""
    N, TL = text.shape
    D = 2 * k + 1
    NW = (L + 1 + 31) // 32
    T = max((N + 1023) // 1024, 1)
    NPAD = T * 1024 - N

    # padded text identical to the v1 host-side layout: k leading
    # copies of column 0 (the jnp reference clips i+d at 0) and k+1
    # trailing zeros
    text_pad = jnp.concatenate(
        [jnp.broadcast_to(text[:, :1], (N, k)), text,
         jnp.zeros((N, k + 1), jnp.uint8)], axis=1)       # (N, TL+2k+1)
    pat1 = jnp.concatenate(
        [pat, jnp.zeros((N, NW * 32 - L), jnp.uint8)], axis=1)

    # sliding diagonal windows: twin[n, dd, i] = text_pad[n, dd + i]
    # for i in [0, NW*32)
    i_idx = jnp.arange(NW * 32)
    d_idx = jnp.arange(D)
    gidx = jnp.minimum(d_idx[:, None] + i_idx[None, :], TL + 2 * k)
    twin = text_pad[:, gidx]                              # (N, D, NW*32)
    patb = pat1[:, None, :]                               # (N, 1, NW*32)
    valid = (i_idx <= L - 1)[None, None, :]
    mm = ~(((patb & twin) != 0) & valid)                  # mismatch bits
    eqb = (patb == twin) & (i_idx <= L)[None, None, :]

    w = (jnp.int32(1) << (i_idx % 32).astype(jnp.int32))
    def pack(bits):
        v = jnp.where(bits, w[None, None, :], 0)
        return jnp.sum(v.reshape(N, D, NW, 32), axis=-1, dtype=jnp.int32)
    mmw = pack(mm)
    eqw = pack(eqb)

    def relay(a):   # (N, D, NW) -> (D*NW, 8, T*128)
        a = jnp.concatenate(
            [a, jnp.zeros((NPAD, D, NW), jnp.int32)], axis=0)
        a = a.reshape(T, 8, 128, D * NW)
        return a.transpose(3, 1, 0, 2).reshape(D * NW, 8, T * 128)

    return relay(mmw), relay(eqw), T, NW


def lv_distance_batch_pallas(
    mixref: jnp.ndarray,
    pos: jnp.ndarray,
    active: jnp.ndarray,
    seq: jnp.ndarray,
    k: int,
    interpret: bool = False,
    text_words: bool = False,
    variant: str = None,
):
    """Drop-in equivalent of lv_distance_batch (distances, BIG=255 when
    inactive/no alignment within k).  `variant` (default from
    SALT_TPU_LV_KERNEL, "v1") selects the kernel formulation.  The env
    var is resolved in this unjitted wrapper, so EAGER callers honor
    changes between calls; jitted callers must resolve it themselves
    outside their jit and pass `variant` explicitly (pipeline/se.py
    se_gapped does)."""
    if variant is None:
        import os as _os
        variant = _os.environ.get("SALT_TPU_LV_KERNEL", "v1")
    return _lv_distance_batch_pallas(
        mixref, pos, active, seq, k, interpret=interpret,
        text_words=text_words, variant=variant)


@partial(jax.jit, static_argnames=("k", "interpret", "text_words",
                                   "variant"))
def _lv_distance_batch_pallas(
    mixref: jnp.ndarray,   # uint8 [l_mref], or uint32 words (text_words)
    pos: jnp.ndarray,      # int32 (N,)
    active: jnp.ndarray,   # bool (N,)
    seq: jnp.ndarray,      # (N, L) read codes
    k: int,
    interpret: bool = False,
    text_words: bool = False,
    variant: str = "v1",
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .lv import NT2BIT_NP

    N, L = seq.shape
    TL = L + GAP_WINDOW_PAD
    k = min(LV_MAX_K - 1, k)

    NP_ = ((N + LANES - 1) // LANES) * LANES
    padN = NP_ - N

    base = jnp.where(active, pos, 0)
    if text_words:
        # positions may exceed 2^31 (whole-genome mixRef): do the word
        # shift/mask through uint32, word index fits int32 again.
        # Gather word-aligned: ~TL/8+2 words per candidate instead of
        # one word PER NIBBLE — TPU gathers cost ~cycles per element,
        # and the per-nibble form (N*TL elements) dominated the whole
        # kernel call (measured: v1/v3, k=3/k=10 all identical at
        # 7.8ms/8192 cands — the DP was never the bound, the feed was).
        bu = base.astype(jnp.uint32)
        w0 = (bu >> 3).astype(jnp.int32)
        off = (bu & 7).astype(jnp.int32)                 # (N,)
        NWIN = (TL + 14) // 8
        # per-element word gather.  Probed alternatives on chip (r5):
        # one word per NIBBLE = 7.8ms/8192 cands; this form = 2.6ms
        # (XLA TPU gather costs ~18 cycles per gathered ELEMENT);
        # contiguous NWIN-word slices via vmapped dynamic_slice = 11ms
        # (per-slice-row overhead ~1300 cycles swamps the win).  The
        # call is feed-bound: the DP kernel itself is <10% of it.
        widx = jnp.clip(w0[:, None] + jnp.arange(NWIN, dtype=jnp.int32),
                        0, mixref.shape[0] - 1)
        w = mixref[widx].astype(jnp.uint32)              # (N, NWIN)
        sh = jnp.arange(8, dtype=jnp.uint32) * 4
        nib = ((w[:, :, None] >> sh) & 15).reshape(N, NWIN * 8)
        text = jax.lax.slice_in_dim(nib, 0, TL, axis=1)
        for s in range(1, 8):                            # per-lane align
            text = jnp.where(
                off[:, None] == s,
                jax.lax.slice_in_dim(nib, s, s + TL, axis=1), text)
        text = text.astype(jnp.uint8)
    else:
        tidx = (base[:, None].astype(jnp.uint32)
                + jnp.arange(TL, dtype=jnp.uint32))
        tidx = jnp.clip(tidx.astype(jnp.int32), 0, mixref.shape[0] - 1)
        text = mixref[tidx]                              # (N, TL)
    pat = jnp.asarray(NT2BIT_NP)[jnp.clip(seq, 0, 4)]    # (N, L)

    if variant == "v3":
        mmw, eqw, T, NW = _pack_v3(text, pat, k, L)
        D = 2 * k + 1
        out = pl.pallas_call(
            partial(_lv_tile_kernel_v3, k=k, L=L, TL=TL, NW=NW),
            out_shape=jax.ShapeDtypeStruct((8, T * LANES), jnp.int32),
            grid_spec=pl.GridSpec(
                grid=(T,),
                in_specs=[
                    pl.BlockSpec((D * NW, 8, LANES), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((D * NW, 8, LANES), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, LANES), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(mmw, eqw)
        # out[s, t*128 + l] is candidate t*1024 + s*128 + l
        res = out.reshape(8, T, LANES).transpose(1, 0, 2).reshape(-1)[:N]
        return jnp.where(active, res, BIG)

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
