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


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_sharded_hit_merge_matches_monolithic():
    """Cross-shard XA merge: a repeat planted in every contig produces
    hits in every shard; the merged hit lists must equal a monolithic
    (single-index) run's lists, positions and n_diffs both."""
    from salt_tpu.constants import NOGAP_MAX_DIFF
    from salt_tpu.index.build import build_index_from_data
    from salt_tpu.parallel.sharded import (
        build_sharded_indexes,
        merge_sharded_hits,
        sharded_se_step,
        stack_indexes,
    )
    from salt_tpu.parallel.mesh import Mesh
    from salt_tpu.pipeline.device_index import to_device_index
    from salt_tpu.pipeline.engine import encode_reads, revcomp
    from salt_tpu.pipeline.se import se_ungapped

    import jax.numpy as jnp

    n_shards = 4
    rng = np.random.default_rng(17)
    bases = "ACGT"
    repeat = "".join(bases[c] for c in rng.integers(0, 4, 100))
    contig_data = []
    rep_at = []
    for ci in range(n_shards):
        L = 2800 + 400 * ci
        seq = list(bases[c] for c in rng.integers(0, 4, L))
        at = 500 + 173 * ci
        seq[at : at + 100] = repeat
        contig_data.append((f"chr{ci}", "syn", "".join(seq)))
        rep_at.append(at)

    shard_indexes, bins = build_sharded_indexes(contig_data, [], n_shards)
    stacked = stack_indexes(shard_indexes, bins, contig_data)
    glob_off = np.cumsum([0] + [len(c[2]) for c in contig_data])[:-1]

    reads = [repeat]
    # plus some unique reads with a mismatch
    for ci in range(n_shards):
        seq = contig_data[ci][2]
        s = 1200 + 67 * ci
        r = list(seq[s : s + 100])
        r[31] = bases[(bases.index(r[31]) + 1) % 4]
        reads.append("".join(r))

    codes = encode_reads(reads)
    fwd = jnp.asarray(codes.astype(np.int32))
    rev = jnp.asarray(revcomp(codes).astype(np.int32))

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("shard",))
    lpac = jnp.asarray([ix.l_pac for ix in shard_indexes], dtype=jnp.int32)
    kw = dict(l_overlap=1, max_seed=50, max_locate=200, cap=256, u=32,
              k_hits=8)
    out = sharded_se_step(mesh, stacked, lpac, fwd, rev,
                          return_hits=True, **kw)
    hpos, hnd, nh, trunc = out[5:]
    assert not trunc.any()
    merged = merge_sharded_hits(hpos, hnd, NOGAP_MAX_DIFF, 8)

    # monolithic oracle
    mono_idx = build_index_from_data(contig_data, [], l_seed=19)
    mono = se_ungapped(to_device_index(mono_idx), fwd, rev, **kw)
    mres = jax.tree_util.tree_map(np.asarray, mono.res)

    assert np.array_equal(merged["found"], mres.found)
    assert np.array_equal(merged["n_diff"][mres.found],
                          mres.n_diff[mres.found])
    assert np.array_equal(merged["n_hits"], mres.n_hits)
    # hit lists: same positions and n_diffs (monolithic order is
    # position-sorted per strand, as is the merge)
    assert np.array_equal(merged["hits_pos"], mres.hits_pos)
    assert np.array_equal(merged["hits_ndiff"], mres.hits_ndiff)
    assert np.array_equal(merged["first_hit_ndiff"], mres.first_hit_ndiff)
    # the repeat read must show one hit per shard
    assert merged["n_hits"][0].sum() == n_shards
    got = np.sort(merged["hits_pos"][0, 0][merged["hits_pos"][0, 0] != 0xFFFFFFFF])
    want = np.sort(np.array([glob_off[c] + rep_at[c] for c in range(n_shards)],
                            dtype=np.uint32))
    assert np.array_equal(got, want)
