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
    csa: jnp.ndarray      # uint32 [L+1]
    r_coord: jnp.ndarray  # uint32 [T+1]
    mixref: jnp.ndarray   # uint8  [L]
    l_pac: int
    l_seed: int

    def tree_flatten(self):
        return (
            (self.ri_c, self.ri_r, self.lkt, self.csa, self.r_coord, self.mixref),
            (self.l_pac, self.l_seed),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        ri_c, ri_r, lkt, csa, r_coord, mixref = children
        return cls(
            ri_c=ri_c, ri_r=ri_r, lkt=lkt, csa=csa, r_coord=r_coord,
            mixref=mixref, l_pac=aux[0], l_seed=aux[1],
        )


def to_device_index(idx: SaltIndex) -> DeviceIndex:
    ri_c = build_rank_index(idx.cbwt, 5, np.append(idx.c_l2, 0), C_SENTINEL)
    ri_r = build_rank_index(idx.rbwt, 6, np.append(idx.r_cumfreq, 0), R_SENTINEL)
    return DeviceIndex(
        ri_c=ri_c,
        ri_r=ri_r,
        lkt=jnp.asarray(idx.lkt),
        csa=jnp.asarray(idx.csa),
        r_coord=jnp.asarray(idx.r_coord),
        mixref=jnp.asarray(idx.mixref),
        l_pac=idx.l_pac,
        l_seed=idx.l_seed,
    )
