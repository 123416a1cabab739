"""Device-resident index arrays derived from a host SaltIndex."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import C_SENTINEL, R_SENTINEL
from ..index.build import SaltIndex
from ..ops.rank import RankIndex, build_rank_index


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceIndex:
    ri_c: RankIndex       # C-part rank structure (5 symbols incl. sentinel)
    ri_r: RankIndex       # R-part rank structure (6 symbols incl. sentinel)
    lkt: jnp.ndarray      # uint32 [4^12+1]
    r_lkt_sp: jnp.ndarray # uint32 [4^12] exact R 12-mer intervals
    r_lkt_ep: jnp.ndarray
    sa_cat: jnp.ndarray   # uint32 [c_sa_len + T+1]: csa then r_coord,
                          # fused so locate is ONE gather per slot
    mixref: jnp.ndarray   # uint8  [L]
    mixref_words: jnp.ndarray  # uint32 [ceil(L/8)+2] little-endian nibbles
    l_pac: int
    l_seed: int
    c_sa_len: int         # length of the csa part within sa_cat

    def tree_flatten(self):
        return (
            (
                self.ri_c, self.ri_r, self.lkt, self.r_lkt_sp, self.r_lkt_ep,
                self.sa_cat, self.mixref, self.mixref_words,
            ),
            (self.l_pac, self.l_seed, self.c_sa_len),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        (ri_c, ri_r, lkt, r_lkt_sp, r_lkt_ep, sa_cat, mixref,
         mixref_words) = children
        return cls(
            ri_c=ri_c, ri_r=ri_r, lkt=lkt, r_lkt_sp=r_lkt_sp,
            r_lkt_ep=r_lkt_ep, sa_cat=sa_cat, mixref=mixref,
            mixref_words=mixref_words, l_pac=aux[0], l_seed=aux[1],
            c_sa_len=aux[2],
        )


def pack_nibbles(mixref: np.ndarray) -> np.ndarray:
    """uint8 nibbles -> uint32 words, little-endian within the word
    (matches the mixRef pac layout, metaref.c:54-56)."""
    n = len(mixref)
    W = (n + 7) // 8 + 2
    padded = np.zeros(W * 8, dtype=np.uint32)
    padded[:n] = mixref
    words = np.zeros(W, dtype=np.uint32)
    for j in range(8):
        words |= padded[j::8] << np.uint32(4 * j)
    return words


def to_device_index(idx: SaltIndex) -> DeviceIndex:
    ri_c = build_rank_index(idx.cbwt, 5, np.append(idx.c_l2, 0), C_SENTINEL)
    ri_r = build_rank_index(idx.rbwt, 6, np.append(idx.r_cumfreq, 0), R_SENTINEL)
    if idx.r_lkt_sp is None:
        raise ValueError("index missing r_lkt tables; rebuild with current version")
    return DeviceIndex(
        ri_c=ri_c,
        ri_r=ri_r,
        lkt=jnp.asarray(idx.lkt),
        r_lkt_sp=jnp.asarray(idx.r_lkt_sp),
        r_lkt_ep=jnp.asarray(idx.r_lkt_ep),
        sa_cat=jnp.asarray(np.concatenate([idx.csa, idx.r_coord])),
        mixref=jnp.asarray(idx.mixref),
        mixref_words=jnp.asarray(pack_nibbles(idx.mixref)),
        l_pac=idx.l_pac,
        l_seed=idx.l_seed,
        c_sa_len=len(idx.csa),
    )
