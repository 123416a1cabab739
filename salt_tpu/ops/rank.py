"""Batched BWT rank (occ) queries as bit-plane gathers.

The reference answers occ(k, c) by pointer-chasing into interleaved
checkpoint blocks with per-call popcounts (Align_src/bwt.c:113-136,
rbwt.c:159-191).  The TPU-native re-expression: per symbol c keep a
bit-plane (one bit per BWT position) plus exclusive prefix counts at
every 32-bit word boundary.  A rank query is then two gathers + one
`population_count` — fully vectorizable over (reads x seeds x strands).

rank_excl(idx, c) = #occurrences of c in bwt[0 .. idx-1].

Both BWTs keep their sentinel in-band as a distinct symbol, which makes
the reference's `$`-skip adjustments (bwt.c:120, rbwt.c:165-167) fall
out: occ over the sentinel-stripped prefix equals rank_excl here.

LF mapping (backward-search step) for an interval [k, l] and symbol c:
    k' = C[c] + rank_excl(k, c) + 1
    l' = C[c] + rank_excl(l + 1, c)
which matches bwt_2occ-based stepping (bwt.c:281-309) and
Rbwt_exact_match_backward (rbwt.c:619-648) exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class RankIndex:
    """Bit-plane rank structure over a symbol array of length n.

    bc:   int32[n_sym * W, 2] per symbol plane and 32-symbol word
                              (flattened plane-major for 1D gathers):
                              [..,0] exclusive count at the word start,
                              [..,1] the bit word (bit i = sym[32w+i]==c)
                              fused so one gather serves a rank query
    cfreq: int32[n_sym + 1]   C-array: cfreq[c] = #symbols < c (sentinel
                              excluded, reference L2/cumulativeFreq)
    n: int                    number of symbols
    n_words: int              W
    """

    bc: jnp.ndarray
    cfreq: jnp.ndarray
    n: int
    n_words: int

    def tree_flatten(self):
        return (self.bc, self.cfreq), (self.n, self.n_words)

    @classmethod
    def tree_unflatten(cls, aux, children):
        bc, cfreq = children
        return cls(bc=bc, cfreq=cfreq, n=aux[0], n_words=aux[1])


def build_rank_index(
    syms: np.ndarray, n_sym: int, cfreq: np.ndarray, sentinel: int
) -> RankIndex:
    """Host-side construction from a uint8 symbol array (sentinel in-band).

    `cfreq` must be the (n_sym+1)-long cumulative count array of the
    non-sentinel symbols (reference L2 / cumulativeFreq semantics).
    """
    n = len(syms)
    W = (n + 2 + 31) // 32 + 1  # allow rank queries at idx up to n+1
    bc = np.zeros((n_sym, W, 2), dtype=np.int32)
    pos = np.arange(n)
    word = pos >> 5
    bit = (pos & 31).astype(np.uint32)
    for c in range(n_sym):
        mask = syms == c
        bits_c = np.zeros(W, dtype=np.uint32)
        np.bitwise_or.at(bits_c, word[mask], (np.uint32(1) << bit[mask]))
        per_word = np.bincount(word[mask], minlength=W)
        bc[c, 1:, 0] = np.cumsum(per_word)[:-1]
        bc[c, :, 1] = bits_c.view(np.int32)
    return RankIndex(
        bc=jnp.asarray(bc.reshape(n_sym * W, 2)),
        cfreq=jnp.asarray(cfreq.astype(np.int32)),
        n=n,
        n_words=W,
    )


@partial(jax.jit, static_argnames=("n", "n_sym", "n_words"))
def _device_rank_planes(words: jnp.ndarray, n: int, n_sym: int,
                        n_words: int) -> jnp.ndarray:
    """Device-side construction of the bc bit-plane array from 4-bit
    packed symbols (8 per uint32 word, little-endian) — bit-identical to
    build_rank_index's host loop.  Transfers n/2 bytes instead of the
    ~1.5n-byte plane array (the relay tunnel stalls on bulk transfers)."""
    W = n_words
    # unpack to one nibble per symbol, padding (>= n) forced to 15
    # (matches no host symbol, so pad bits stay 0 in every plane)
    sh = jnp.arange(8, dtype=jnp.uint32) * 4
    nib = ((words[:, None].astype(jnp.uint32) >> sh) & 15).reshape(-1)
    pos = jnp.arange(nib.shape[0], dtype=jnp.int32)
    nib = jnp.where(pos < n, nib, jnp.uint32(15))
    # pad the symbol stream to exactly W*32 entries
    tot = W * 32
    nib = jnp.concatenate(
        [nib, jnp.full((max(tot - nib.shape[0], 0),), 15, jnp.uint32)]
    )[:tot].reshape(W, 32)
    bit_w = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    planes = []
    for c in range(n_sym):
        eq = nib == jnp.uint32(c)                    # (W, 32)
        bits = jnp.sum(jnp.where(eq, bit_w, 0), axis=-1, dtype=jnp.uint32)
        per_word = jax.lax.population_count(bits).astype(jnp.int32)
        excl = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(per_word)[:-1]]
        )
        planes.append(jnp.stack([excl, bits.astype(jnp.int32)], axis=-1))
    return jnp.concatenate(planes, axis=0)           # (n_sym*W, 2)


def build_rank_index_device(packed_words: jnp.ndarray, n: int, n_sym: int,
                            cfreq: np.ndarray) -> RankIndex:
    """RankIndex whose bc planes are built on device from packed syms."""
    W = (n + 2 + 31) // 32 + 1
    bc = _device_rank_planes(packed_words, n=n, n_sym=n_sym, n_words=W)
    return RankIndex(
        bc=bc,
        cfreq=jnp.asarray(cfreq.astype(np.int32)),
        n=n,
        n_words=W,
    )


def rank_excl(ri: RankIndex, idx: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Vectorized exclusive rank: #c in sym[0..idx-1].  idx int32 >= 0."""
    w = idx >> 5
    r = (idx & 31).astype(jnp.uint32)
    row = ri.bc[c * ri.n_words + w]         # (..., 2): one fused 1D gather
    word = row[..., 1].astype(jnp.uint32)
    mask = jnp.where(r > 0, (jnp.uint32(1) << r) - jnp.uint32(1), jnp.uint32(0))
    partial_cnt = jax.lax.population_count(word & mask).astype(jnp.int32)
    return row[..., 0] + partial_cnt


def lf_step(ri: RankIndex, k: jnp.ndarray, l: jnp.ndarray, c: jnp.ndarray):
    """One backward-search step; returns (k', l').  Interval is empty when
    k' > l'."""
    ok = rank_excl(ri, k, c)
    ol = rank_excl(ri, l + 1, c)
    base = ri.cfreq[c]
    return base + ok + 1, base + ol
