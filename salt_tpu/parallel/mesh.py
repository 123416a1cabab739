"""Multi-device scale-out.

The workload is embarrassingly parallel over reads (SURVEY.md §2.6): the
read batch is sharded over a `data` mesh axis, the index is replicated
(small genomes) or sharded by reference bin (large genomes, see
`sharded_index` below).  The SE step contains no cross-read dependencies,
so under `jit` with sharded inputs XLA partitions it without collectives;
the sharded-index path all-gathers per-shard best candidates before the
final reduction.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline.device_index import DeviceIndex
from ..pipeline.se import se_gapped, se_ungapped


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def shard_reads(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    """Place a (B, L) read batch sharded along the data axis."""
    return jax.device_put(arr, NamedSharding(mesh, P("data", None)))


def replicate(mesh: Mesh, tree):
    """Replicate index arrays on every device of the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def sharded_se_ungapped(mesh: Mesh, dix: DeviceIndex, seq_f, seq_r, **kw):
    """Data-parallel SE ungapped step over the mesh.  seq_f/seq_r must be
    sharded by `shard_reads`; the batch must divide the mesh size."""
    dix_rep = replicate(mesh, dix)
    fsh = shard_reads(mesh, seq_f)
    rsh = shard_reads(mesh, seq_r)
    return se_ungapped(dix_rep, fsh, rsh, **kw)


def sharded_full_step(mesh: Mesh, dix: DeviceIndex, seq_f, seq_r, *,
                      l_overlap, max_seed, max_locate, cap, u=64,
                      k_hits=16, gap_k=10):
    """One full SE alignment step (ungapped + gapped verify for every
    read) under data-parallel sharding — the multi-chip 'training step'
    analogue used by dryrun validation."""
    out = sharded_se_ungapped(
        mesh, dix, seq_f, seq_r,
        l_overlap=l_overlap, max_seed=max_seed, max_locate=max_locate,
        cap=cap, u=u, k_hits=k_hits,
    )
    dix_rep = replicate(mesh, dix)
    gap = se_gapped(
        dix_rep, shard_reads(mesh, seq_f), shard_reads(mesh, seq_r),
        out.loci0, out.loci1, k=gap_k, u=u, k_hits=k_hits,
    )
    return out, gap
