"""Batched overlap seeding (alnse_seed_overlap, Align_src/alnse.c:199-312).

For every seed start position p (stride `l_overlap`) and every read in
the batch, in parallel:

  C part: 12-mer lookup-table jump for the seed's last 12 bases, then
  l_seed-12 LF steps (bwt_match_exact_alt, bwt.c:281-309), then greedy
  left extension while the interval is wider than `max_seed`
  (alnse.c:246-258).

  R part: full l_seed-step backward search over the local-pattern BWT
  (Rbwt_exact_match_backward, rbwt.c:619-648) plus the same greedy
  extension (alnse.c:279-291 — note the reference has no N guard in the
  R extension; an N steps on the '#' plane, which we replicate).

All control flow is fixed-shape: the match phase is a `lax.scan` over
seed bases with a live-lane mask; the (rare) extension phase is a
`lax.while_loop` that exits when every lane is done.

Returns per-seed interval (sp, ep), adjusted read offset, and validity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rank import RankIndex, lf_step, rank_excl, ugt


class Seeds(NamedTuple):
    sp: jnp.ndarray       # int32 (..., S)
    ep: jnp.ndarray       # int32 (..., S)
    offset: jnp.ndarray   # int32 (..., S) seed start minus extension
    valid: jnp.ndarray    # bool  (..., S)


def _match_backward(ri: RankIndex, chars, k0, l0, live0):
    """chars: (n_steps, ...) codes fed last-to-first; masked LF scan.
    Returns (k, l, ok) where ok = matched every step with nonempty result."""

    def step(carry, c):
        k, l, alive = carry
        bad = c > 3
        kn, ln = lf_step(ri, k, l, jnp.where(bad, 0, c))
        empty = ugt(kn, ln)
        new_alive = alive & ~bad & ~empty
        k = jnp.where(new_alive, kn, k)
        l = jnp.where(new_alive, ln, l)
        return (k, l, new_alive), None

    (k, l, alive), _ = jax.lax.scan(step, (k0, l0, live0), chars)
    return k, l, alive


def _match_backward2(ri_a: RankIndex, ri_b: RankIndex, chars, sa, sb):
    """Two families' masked LF scans over the SAME char stream fused
    into one scan — half the sequential steps of two separate scans.
    sa/sb are (k0, l0, live0) triples; returns the stepped triples."""

    def fam_step(ri, k, l, alive, c):
        bad = c > 3
        kn, ln = lf_step(ri, k, l, jnp.where(bad, 0, c))
        new_alive = alive & ~bad & ~ugt(kn, ln)
        return (jnp.where(new_alive, kn, k), jnp.where(new_alive, ln, l),
                new_alive)

    def step(carry, c):
        a, b = carry
        return (fam_step(ri_a, *a, c), fam_step(ri_b, *b, c)), None

    (a, b), _ = jax.lax.scan(step, (sa, sb), chars)
    return a, b


def _greedy_extend(ri: RankIndex, seq, p, k, l, valid, max_seed, check_n: bool):
    """While l-k > max_seed and l_ext < p: try one more left base.
    seq: (..., L); p, k, l: (...,).  Mirrors alnse.c:246-258/279-291."""
    L = seq.shape[-1]
    max_ext = L  # static bound; loop exits early when no lane is active

    def cond(state):
        k, l, l_ext, active = state
        return jnp.any(active)

    def body(state):
        k, l, l_ext, active = state
        c = jnp.take_along_axis(
            seq, jnp.maximum(p - l_ext - 1, 0)[..., None], axis=-1
        )[..., 0]
        bad = (c > 3) if check_n else jnp.zeros(c.shape, dtype=bool)
        csafe = jnp.where(c > 4, 4, c)  # clamp pathological codes
        ok = rank_excl(ri, k, csafe)
        ol = rank_excl(ri, l + 1, csafe)
        would_empty = ok + 1 > ol  # counts, never wrapped
        do = active & ~bad & ~would_empty
        base = ri.cfreq[csafe]
        k = jnp.where(do, base + ok + 1, k)
        l = jnp.where(do, base + ol, l)
        l_ext = jnp.where(do, l_ext + 1, l_ext)
        # continue only if still too wide and room to extend
        active = do & ugt(l - k, max_seed) & (l_ext < p)
        return k, l, l_ext, active

    l_ext0 = jnp.zeros_like(k)
    active0 = valid & ugt(l - k, max_seed) & (l_ext0 < p)
    k, l, l_ext, _ = jax.lax.while_loop(cond, body, (k, l, l_ext0, active0))
    return k, l, l_ext


def _greedy_extend2(ri_a, ri_b, seq, p, sa, sb, max_seed,
                    check_n_a: bool, check_n_b: bool):
    """Both families' greedy extensions fused into one while_loop (the
    loop runs until no lane of EITHER family is active — iterations with
    one family idle keep its lanes fully masked)."""
    def fam_step(ri, check_n, k, l, l_ext, active):
        c = jnp.take_along_axis(
            seq, jnp.maximum(p - l_ext - 1, 0)[..., None], axis=-1
        )[..., 0]
        bad = (c > 3) if check_n else jnp.zeros(c.shape, dtype=bool)
        csafe = jnp.where(c > 4, 4, c)
        ok = rank_excl(ri, k, csafe)
        ol = rank_excl(ri, l + 1, csafe)
        would_empty = ok + 1 > ol  # counts, never wrapped
        do = active & ~bad & ~would_empty
        base = ri.cfreq[csafe]
        k = jnp.where(do, base + ok + 1, k)
        l = jnp.where(do, base + ol, l)
        l_ext = jnp.where(do, l_ext + 1, l_ext)
        active = do & ugt(l - k, max_seed) & (l_ext < p)
        return k, l, l_ext, active

    def cond(state):
        a, b = state
        return jnp.any(a[3]) | jnp.any(b[3])

    def body(state):
        a, b = state
        return (fam_step(ri_a, check_n_a, *a), fam_step(ri_b, check_n_b, *b))

    def init(valid, k, l):
        l_ext0 = jnp.zeros_like(k)
        return (k, l, l_ext0, valid & ugt(l - k, max_seed) & (l_ext0 < p))

    (ka, la, ea, _), (kb, lb, eb, _) = jax.lax.while_loop(
        cond, body, (init(sa[2], sa[0], sa[1]), init(sb[2], sb[0], sb[1]))
    )
    return (ka, la, ea), (kb, lb, eb)


def seed_overlap(
    ri_c: RankIndex,
    ri_r: RankIndex,
    lkt: jnp.ndarray,
    seq: jnp.ndarray,       # (B, L) int32 codes 0..4
    l_seed: int,
    l_overlap: int,
    max_seed: int,
    l_lkt: int = 12,
    seed_only_ref: bool = False,
    r_lkt_sp: jnp.ndarray = None,
    r_lkt_ep: jnp.ndarray = None,
):
    """Returns (c_seeds, r_seeds), each a Seeds with shape (B, S).

    When `r_lkt_sp/ep` are given (exact R-text 12-mer interval tables),
    the R backward search jumps 12 steps at once — result-identical to 12
    LF steps from the full interval."""
    B, L = seq.shape
    starts_list = list(range(0, L - l_seed + 1, l_overlap))
    starts = jnp.asarray(starts_list, dtype=jnp.int32)     # (S,)
    S = starts.shape[0]
    p = jnp.broadcast_to(starts, (B, S))

    # seed windows as static slices (no gather): (B, S, l_seed)
    win = jnp.stack([seq[:, s0 : s0 + l_seed] for s0 in starts_list], axis=1)

    # ---- C part ----
    tail = win[..., l_seed - l_lkt :]                       # (B, S, 12)
    has_n = jnp.any(tail > 3, axis=-1)
    pw = 4 ** jnp.arange(l_lkt - 1, -1, -1, dtype=jnp.int32)
    kmer = jnp.sum(jnp.where(tail > 3, 0, tail) * pw, axis=-1)
    sp0 = jnp.where(has_n, 1, lkt[kmer].astype(jnp.int32))
    ep0 = jnp.where(has_n, 0, lkt[kmer + 1].astype(jnp.int32) - 1)
    live0 = ~ugt(sp0, ep0)
    # LF over the remaining l_seed-12 bases, last-to-first
    head = win[..., : l_seed - l_lkt]                       # (B, S, l_seed-12)
    chars = jnp.moveaxis(head[..., ::-1], -1, 0)            # (steps, B, S)
    seq_b = seq[:, None, :]

    use_rlkt = (not seed_only_ref) and r_lkt_sp is not None and l_seed >= l_lkt
    if use_rlkt:
        # R jumps the trailing 12 bases through the exact interval table,
        # so both families LF over the SAME remaining chars — fuse the
        # two scans and the two extension loops (half the serial steps)
        rk0 = jnp.where(has_n, 1, r_lkt_sp[kmer].astype(jnp.int32))
        rl0 = jnp.where(has_n, 0, r_lkt_ep[kmer].astype(jnp.int32))
        (ck, cl, okc), (rk, rl, okr) = _match_backward2(
            ri_c, ri_r, chars, (sp0, ep0, live0), (rk0, rl0, ~ugt(rk0, rl0))
        )
        (ck, cl, ce), (rk, rl, re_) = _greedy_extend2(
            ri_c, ri_r, seq_b, p, (ck, cl, okc), (rk, rl, okr), max_seed,
            check_n_a=True, check_n_b=False,
        )
        c_seeds = Seeds(sp=ck, ep=cl, offset=p - ce, valid=okc)
        r_seeds = Seeds(sp=rk, ep=rl, offset=p - re_, valid=okr)
        return c_seeds, r_seeds

    k, l, okc = _match_backward(ri_c, chars, sp0, ep0, live0)
    k, l, l_ext = _greedy_extend(ri_c, seq_b, p, k, l, okc, max_seed, check_n=True)
    c_seeds = Seeds(sp=k, ep=l, offset=p - l_ext, valid=okc)

    # ---- R part (no 12-mer jump table: full l_seed-step search) ----
    if seed_only_ref:
        z = jnp.zeros((B, S), dtype=jnp.int32)
        r_seeds = Seeds(sp=z + 1, ep=z, offset=z, valid=jnp.zeros((B, S), bool))
    else:
        k0 = jnp.zeros((B, S), dtype=jnp.int32)
        l0 = jnp.full((B, S), ri_r.n, dtype=jnp.int32)
        live = jnp.ones((B, S), dtype=bool)
        chars_r = jnp.moveaxis(win[..., ::-1], -1, 0)   # all l_seed bases
        k, l, okr = _match_backward(ri_r, chars_r, k0, l0, live)
        k, l, l_ext = _greedy_extend(ri_r, seq_b, p, k, l, okr, max_seed, check_n=False)
        r_seeds = Seeds(sp=k, ep=l, offset=p - l_ext, valid=okr)

    return c_seeds, r_seeds
