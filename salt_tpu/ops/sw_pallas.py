"""Pallas TPU kernel for the batched score-only affine Smith-Waterman
(drop-in for ops/sw_batch.py:sw_score_batch on TPU).

Layout: 128 candidates ride the lane axis, read positions the sublane
axis.  The wavefront runs over anti-diagonals d = i + j: every cell on
a diagonal depends only on diagonals d-1 (left/up for the affine E/F)
and d-2 (match), so each step is pure (LP, 128) vector work.

The diagonal walk is the GRID's innermost dimension: the per-lane
reference slice ref[d - i] is fetched by the BlockSpec with an
ELEMENT-indexed window into the pre-reversed reference tile
(pl.Element — the index map slides one row per grid step), and the DP
state lives in VMEM scratch, which persists across grid steps on TPU.
This keeps every in-kernel access static — the relay's libtpu
(Nov 2025 Mosaic) SIGABRTs on dynamic VMEM slices inside the kernel
body, which is why the earlier fori_loop + pl.ds formulation never
compiled on real hardware.

Scores are textbook affine SW (see sw_batch.py for why that is a sound
and in-practice-equal stand-in for the vendored SSW's scores):
  E(i,j) = max(E(i,j-1) - ge, H(i,j-1) - go)      [gap consuming ref]
  F(i,j) = max(F(i-1,j) - ge, H(i-1,j) - go)      [gap consuming read]
  H(i,j) = max(0, H(i-1,j-1) + s(i,j), E, F)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
NEG = -(2**20)  # plain int: jnp scalars would be captured consts in the kernel


def _sw_fori_kernel(revref_ref, reads_ref, reflen_ref, out_ref, *,
                    LP: int, WP: int, L: int, snp_mode: bool,
                    go: int, ge: int):
    from jax.experimental import pallas as pl

    reads = reads_ref[...]                      # (LP, LANES) int32
    reflen = reflen_ref[0:1, :]                 # (1, LANES) int32
    ii = jax.lax.broadcasted_iota(jnp.int32, (LP, LANES), 0)

    goc = jnp.int32(go)
    gec = jnp.int32(ge)

    def score(r):
        if snp_mode:
            r_ok = (r != 0) & ((r & (r - 1)) == 0)
            hit = r_ok & ((r & reads) != 0)
            return jnp.where(hit, jnp.int32(1), jnp.int32(-3))
        any_n = (r >= 4) | (reads >= 4)
        eq = r == reads
        return jnp.where(
            any_n, jnp.int32(-1),
            jnp.where(eq, jnp.int32(1), jnp.int32(-3)),
        )

    def shift_down(x, fill):
        top = jnp.full((1, LANES), fill, jnp.int32)
        return jnp.concatenate([top, x[:-1]], axis=0)

    negc = jnp.int32(NEG)
    zero = jnp.zeros((LP, LANES), jnp.int32)
    neg = jnp.full((LP, LANES), NEG, jnp.int32)

    def step(d, carry):
        h1, h2, e1, f1, best = carry            # diag d-1, d-2 state
        off = WP + LP - 1 - d
        # dynamic-start load on the SUBLANE axis straight from the VMEM
        # ref — Mosaic lowers pl.ds here, whereas a dynamic_slice of the
        # materialized tile does not (it was this kernel's only
        # unloweralbe op; round-3's silent fallback hid that it had
        # never compiled on real hardware)
        ref_d = revref_ref[pl.ds(off, LP), :]
        s = score(ref_d)
        e = jnp.maximum(e1 - gec, h1 - goc)
        h1s = shift_down(h1, 0)
        f1s = shift_down(f1, negc)
        f = jnp.maximum(f1s - gec, h1s - goc)
        h2s = shift_down(h2, 0)
        h = jnp.maximum(jnp.maximum(h2s + s, jnp.maximum(e, f)),
                        jnp.int32(0))
        valid = (ii < L) & (ii <= d) & (ii >= d - reflen + 1)
        h = jnp.where(valid, h, 0)
        e = jnp.where(valid, e, negc)
        f = jnp.where(valid, f, negc)
        best = jnp.maximum(best, jnp.max(h, axis=0, keepdims=True))
        return (h, h1, e, f, best)

    best0 = jnp.zeros((1, LANES), jnp.int32)
    _, _, _, _, best = jax.lax.fori_loop(
        0, LP + WP - 1, step, (zero, zero, neg, neg, best0)
    )
    out_ref[...] = jnp.broadcast_to(best, (8, LANES))


def _sw_grid_kernel(revwin_ref, reads_ref, reflen_ref, out_ref,
                    h1_ref, h2_ref, e1_ref, f1_ref, best_ref, *,
                    LP: int, ND: int, L: int, snp_mode: bool,
                    go: int, ge: int):
    from jax.experimental import pallas as pl

    d = pl.program_id(1)
    negc = jnp.int32(NEG)

    @pl.when(d == 0)
    def _init():
        h1_ref[...] = jnp.zeros((LP, LANES), jnp.int32)
        h2_ref[...] = jnp.zeros((LP, LANES), jnp.int32)
        e1_ref[...] = jnp.full((LP, LANES), NEG, jnp.int32)
        f1_ref[...] = jnp.full((LP, LANES), NEG, jnp.int32)
        best_ref[...] = jnp.zeros((8, LANES), jnp.int32)

    reads = reads_ref[...]                      # (LP, LANES) int32
    reflen = reflen_ref[0:1, :]                 # (1, LANES) int32
    ii = jax.lax.broadcasted_iota(jnp.int32, (LP, LANES), 0)

    goc = jnp.int32(go)
    gec = jnp.int32(ge)

    ref_d = revwin_ref[...]                     # (LP, LANES) int32

    if snp_mode:
        r_ok = (ref_d != 0) & ((ref_d & (ref_d - 1)) == 0)
        hit = r_ok & ((ref_d & reads) != 0)
        s = jnp.where(hit, jnp.int32(1), jnp.int32(-3))
    else:
        any_n = (ref_d >= 4) | (reads >= 4)
        eq = ref_d == reads
        s = jnp.where(
            any_n, jnp.int32(-1),
            jnp.where(eq, jnp.int32(1), jnp.int32(-3)),
        )

    def shift_down(x, fill):
        top = jnp.full((1, LANES), fill, jnp.int32)
        return jnp.concatenate([top, x[:-1]], axis=0)

    h1 = h1_ref[...]
    h2 = h2_ref[...]
    e1 = e1_ref[...]
    f1 = f1_ref[...]
    e = jnp.maximum(e1 - gec, h1 - goc)
    h1s = shift_down(h1, 0)
    f1s = shift_down(f1, negc)
    f = jnp.maximum(f1s - gec, h1s - goc)
    h2s = shift_down(h2, 0)
    h = jnp.maximum(jnp.maximum(h2s + s, jnp.maximum(e, f)), jnp.int32(0))
    valid = (ii < L) & (ii <= d) & (ii >= d - reflen + 1)
    h = jnp.where(valid, h, 0)
    e = jnp.where(valid, e, negc)
    f = jnp.where(valid, f, negc)
    best_ref[...] = jnp.maximum(
        best_ref[...],
        jnp.broadcast_to(jnp.max(h, axis=0, keepdims=True), (8, LANES)),
    )
    h2_ref[...] = h1
    h1_ref[...] = h
    e1_ref[...] = e
    f1_ref[...] = f

    @pl.when(d == ND - 1)
    def _emit():
        out_ref[...] = best_ref[...]


@partial(jax.jit, static_argnames=("snp_mode", "gap_open", "gap_extend",
                                   "interpret"))
def sw_score_batch_pallas(
    refs: jnp.ndarray,      # (B, W) int32 window chars (zero-padded)
    reads: jnp.ndarray,     # (B, L) int32
    ref_len: jnp.ndarray,   # (B,) int32
    snp_mode: bool = True,
    gap_open: int = 3,
    gap_extend: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, W = refs.shape
    L = reads.shape[1]

    import os as _os

    _variant = _os.environ.get("SALT_TPU_SW_KERNEL", "wave")
    # wave materializes (W+L-1, B, 128) int32 score planes in HBM
    # (~512*(W+L) bytes per candidate): a fine trade at the -X 1
    # prefilter shape (W ~ L+5) but unbounded in W — long PE-rescue
    # windows (W ~ 700) would allocate GBs next to a whole-genome
    # index.  Cap it; wider windows use the grid/fori formulations or
    # the XLA scan fallback.
    if _variant == "wave" and L <= LANES and W <= 2 * LANES:
        return sw_score_batch_pallas_wave(
            refs, reads, ref_len, snp_mode=snp_mode, gap_open=gap_open,
            gap_extend=gap_extend, interpret=interpret)
    if _variant == "wave":
        _variant = "grid"

    LP = ((L + 7) // 8) * 8
    WP = ((W + 7) // 8) * 8
    NB = ((B + LANES - 1) // LANES) * LANES
    padB = NB - B
    ND = LP + WP - 1

    # reversed, candidate-major reference tile: revref[y, b] =
    # refpad[WP + 2LP - 1 - y] where refpad[x] = ref[x - LP]
    refs_t = jnp.pad(refs.astype(jnp.int32), ((0, padB), (0, WP - W))).T
    revref = jnp.pad(refs_t[::-1], ((LP, LP), (0, 0)))   # (WP+2LP, NB)
    reads_t = jnp.pad(
        reads.astype(jnp.int32), ((0, padB), (0, LP - L))
    ).T                                                   # (LP, NB)
    # full 8-sublane tile: a (1, LANES)-blocked input upsets Mosaic and
    # (8, 128) is the native VREG tile anyway
    reflen = jnp.broadcast_to(
        jnp.pad(ref_len.astype(jnp.int32), (0, padB))[None, :], (8, NB)
    )

    if _variant == "fori":
        # alternate formulation: one grid step per candidate tile, the
        # diagonal walk as an in-kernel fori_loop with a pl.ds window
        # read.  Kept selectable because the relay's Mosaic build
        # rejects kernels unpredictably — probe both on new toolchains.
        out = pl.pallas_call(
            partial(_sw_fori_kernel, LP=LP, WP=WP, L=L, snp_mode=snp_mode,
                    go=gap_open, ge=gap_extend),
            out_shape=jax.ShapeDtypeStruct((8, NB), jnp.int32),
            grid=(NB // LANES,),
            in_specs=[
                pl.BlockSpec((WP + 2 * LP, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LP, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(revref, reads_t, reflen)
        return out[0, :B]

    grid = (NB // LANES, ND)
    out = pl.pallas_call(
        partial(_sw_grid_kernel, LP=LP, ND=ND, L=L, snp_mode=snp_mode,
                go=gap_open, ge=gap_extend),
        out_shape=jax.ShapeDtypeStruct((8, NB), jnp.int32),
        grid=grid,
        in_specs=[
            # diagonal d reads revref rows [WP+LP-1-d, ..+LP): the
            # element-indexed window slides one row per grid step
            # (Mosaic requires every dim Element if any is, so the lane
            # dim carries an explicit 128-aligned element offset)
            pl.BlockSpec(
                (pl.Element(LP), pl.Element(LANES)),
                lambda b, d: (WP + LP - 1 - d, b * LANES),
            ),
            pl.BlockSpec((LP, LANES), lambda b, d: (0, b)),
            pl.BlockSpec((8, LANES), lambda b, d: (0, b)),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda b, d: (0, b)),
        scratch_shapes=[
            pltpu.VMEM((LP, LANES), jnp.int32),
            pltpu.VMEM((LP, LANES), jnp.int32),
            pltpu.VMEM((LP, LANES), jnp.int32),
            pltpu.VMEM((LP, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(revref, reads_t, reflen)
    return out[0, :B]


def _sw_wave_kernel(s_ref, reflen_ref, out_ref, *, ND: int, L: int,
                    go: int, ge: int):
    """Candidates-on-sublanes wavefront (variant "wave").

    Affine SW has NO intra-diagonal dependency: E(i,j) and F(i,j) read
    diagonal d-1 (same / shifted lane) and the match term reads d-2 —
    SSW's lazy-F is an artifact of its column-striped layout, not of
    the DP.  With read positions on the LANE axis and 8 candidates on
    the sublanes, every step is (8,128) elementwise VREG work plus one
    lane shift; the per-diagonal score vectors arrive PRECOMPUTED from
    XLA (s_ref, statically indexed), so the kernel body contains only
    elementwise ops and static slices — the op class the relay's
    Nov-2025 Mosaic has always compiled (its rejections were dynamic
    VMEM slices, (1,128) blocks, and Element grid walks).

    s_ref: (ND, 8, LANES) int32 — s[d, c, i] = score(read_c[i],
    ref_c[d - i]) for the textbook matrices (sw_batch._score_*).
    reflen_ref: (8, LANES) int32 per-candidate window length.
    out: (8, LANES) best score broadcast along lanes."""
    shape = (8, LANES)
    goc = jnp.int32(go)
    gec = jnp.int32(ge)
    NEGc = jnp.int32(NEG)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    reflen = reflen_ref[...]

    def shift(x, fill):
        from jax.experimental.pallas import tpu as pltpu

        r = pltpu.roll(x, 1, 1)  # lane i <- lane i-1 (127 wraps to 0)
        return jnp.where(lane == 0, fill, r)

    zero = jnp.zeros(shape, jnp.int32)
    negs = jnp.full(shape, NEGc, jnp.int32)
    h1, h2, e, f = zero, zero, negs, negs
    best = zero
    for d in range(ND):
        s = s_ref[d, :, :]
        e = jnp.maximum(e - gec, h1 - goc)
        h1s = shift(h1, zero)
        f = jnp.maximum(shift(f, negs) - gec, h1s - goc)
        h = jnp.maximum(jnp.maximum(shift(h2, zero) + s, e), f)
        h = jnp.maximum(h, 0)
        j = d - lane
        valid = (lane < L) & (j >= 0) & (j < reflen)
        h = jnp.where(valid, h, 0)
        e = jnp.where(valid, e, NEGc)
        f = jnp.where(valid, f, NEGc)
        best = jnp.maximum(best, h)
        h2, h1 = h1, h
    out_ref[...] = jnp.broadcast_to(
        jnp.max(best, axis=1, keepdims=True), shape)


def _sw_wave_planes(refs, reads, snp_mode: bool, L: int, W: int, T: int):
    """XLA-side per-diagonal score planes for the wave kernel.
    refs (B, W) int32, reads (B, L) int32 -> (ND, T*8, LANES) int32
    via 128 static Hankel slices (no gathers)."""
    from .sw_batch import _score_plain, _score_snp

    B = refs.shape[0]
    ND = W + L - 1
    # refq[c, x] = ref[c, x - LANES]; x in [0, LANES + W + LANES)
    refq = jnp.concatenate([
        jnp.zeros((B, LANES), jnp.int32), refs.astype(jnp.int32),
        jnp.zeros((B, LANES), jnp.int32)], axis=1)
    # twin[c, d, i] = ref[c, d - i] = refq[c, d - i + LANES]
    cols = [
        jax.lax.slice_in_dim(refq, LANES - i, LANES - i + ND, axis=1)
        for i in range(LANES)
    ]
    twin = jnp.stack(cols, axis=2)                       # (B, ND, LANES)
    reads_p = jnp.pad(reads.astype(jnp.int32), ((0, 0), (0, LANES - L)),
                      constant_values=15 if snp_mode else 7)
    rd = reads_p[:, None, :]                             # (B, 1, LANES)
    s = (_score_snp(twin, rd) if snp_mode else _score_plain(twin, rd))
    s = jnp.pad(s, ((0, T * 8 - B), (0, 0), (0, 0)))
    return s.transpose(1, 0, 2)                          # (ND, T*8, LANES)


def sw_score_batch_pallas_wave(
    refs: jnp.ndarray,      # (B, W) int32 window chars (zero-padded)
    reads: jnp.ndarray,     # (B, L) int32
    ref_len: jnp.ndarray,   # (B,) int32
    snp_mode: bool = True,
    gap_open: int = 3,
    gap_extend: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, W = refs.shape
    L = reads.shape[1]
    if L > LANES:
        raise ValueError(f"wave kernel needs read length <= {LANES}")
    T = (B + 7) // 8
    ND = W + L - 1
    s = _sw_wave_planes(refs, reads, snp_mode, L, W, T)
    reflen = jnp.broadcast_to(
        jnp.pad(ref_len.astype(jnp.int32), (0, T * 8 - B))[:, None],
        (T * 8, LANES)).reshape(T, 8, LANES).reshape(T * 8, LANES)
    out = pl.pallas_call(
        partial(_sw_wave_kernel, ND=ND, L=L, go=gap_open, ge=gap_extend),
        out_shape=jax.ShapeDtypeStruct((T * 8, LANES), jnp.int32),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((ND, 8, LANES), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(s, reflen)
    return out[:B, 0]
