"""Sharded-index alignment on an 8-device CPU mesh: reads from every
shard's bin must align back to their true global coordinates, with the
best-candidate merge running as collectives over the `shard` mesh axis."""

import numpy as np
import pytest

import jax


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_sharded_index_alignment():
    from salt_tpu.io.snp import SnpBlock
    from salt_tpu.parallel.sharded import (
        build_sharded_indexes,
        sharded_se_step,
        stack_indexes,
    )
    from salt_tpu.parallel.mesh import Mesh
    from salt_tpu.pipeline.engine import encode_reads, revcomp

    n_shards = 4
    rng = np.random.default_rng(9)
    bases = "ACGT"
    contig_data = []
    blocks = []
    for ci in range(n_shards):
        L = 3000 + 500 * ci
        seq = "".join(bases[c] for c in rng.integers(0, 4, L))
        contig_data.append((f"chr{ci}", "syn", seq))
        pos = np.sort(rng.choice(np.arange(50, L - 50), 10, replace=False)).astype(np.uint32)
        stype = []
        for p in pos:
            ref = bases.index(seq[p])
            alt = (ref + 1) % 4
            stype.append((1 << ref) | (1 << alt) | (ref << 4))
        blocks.append(SnpBlock(f"chr{ci}", pos, np.array(stype, np.uint8)))

    shard_indexes, bins = build_sharded_indexes(contig_data, blocks, n_shards)
    stacked = stack_indexes(shard_indexes, bins, contig_data)

    # reads sampled across all contigs
    glob_off = np.cumsum([0] + [len(c[2]) for c in contig_data])[:-1]
    reads = []
    truth = []
    RL = 100
    for _ in range(32):
        ci = int(rng.integers(0, n_shards))
        seq = contig_data[ci][2]
        s = int(rng.integers(0, len(seq) - RL))
        reads.append(seq[s : s + RL])
        truth.append(glob_off[ci] + s)

    codes = encode_reads(reads)
    import jax.numpy as jnp

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("shard",))
    lpac = jnp.asarray([ix.l_pac for ix in shard_indexes], dtype=jnp.int32)
    found, pos, strand, nd, shard = sharded_se_step(
        mesh, stacked, lpac,
        jnp.asarray(codes.astype(np.int32)),
        jnp.asarray(revcomp(codes).astype(np.int32)),
        l_overlap=1, max_seed=50, max_locate=200, cap=256, u=32, k_hits=8,
    )
    # map winning shard-local positions to global via the bin layout:
    # base_offsets lift shard-local to global only when bins are contiguous
    # prefixes; with one contig per shard they are.
    assert found.all()
    assert (nd == 0).all()
    assert np.array_equal(pos, np.array(truth))
