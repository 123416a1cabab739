"""Full sharded aligner vs the monolithic engine: byte-identical SAM.

8 contigs -> 8 contiguous shard bins on the 8-device CPU mesh.  The read
mix covers every path: exact, SNP-allele, mismatched (ungapped XA),
cross-contig repeats (cross-shard XA merge), 3bp deletions (gapped LV),
and unmappable garbage.  The monolithic engine is itself byte-parity
tested against the reference binary (test_e2e_parity), so equality here
extends the parity chain to the sharded path.
"""

import numpy as np
import pytest

import jax

from salt_tpu.index.build import build_index_from_data
from salt_tpu.io.fasta import SeqRecord
from salt_tpu.io.snp import SnpBlock
from salt_tpu.pipeline.engine import SEAligner, SEOptions
from salt_tpu.pipeline.pe_engine import PEAligner, PEOptions

N_SHARDS = 8
RL = 100


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(21)
    bases = "ACGT"
    repeat = "".join(bases[c] for c in rng.integers(0, 4, 300))
    contig_data = []
    blocks = []
    for ci in range(N_SHARDS):
        L = 4000 + 700 * (ci % 3)
        seq = list(bases[c] for c in rng.integers(0, 4, L))
        # plant the shared repeat mid-contig in 4 contigs (cross-shard XA)
        if ci % 2 == 0:
            seq[1000:1300] = repeat
        seq = "".join(seq)
        contig_data.append((f"chr{ci}", "syn", seq))
        pos = np.sort(
            rng.choice(np.arange(50, L - 50), 12, replace=False)
        ).astype(np.uint32)
        stype = []
        for p in pos:
            ref = bases.index(seq[p])
            alt = (ref + 1) % 4
            stype.append((1 << ref) | (1 << alt) | (ref << 4))
        blocks.append(SnpBlock(f"chr{ci}", pos, np.array(stype, np.uint8)))

    rng2 = np.random.default_rng(77)
    reads = []
    for i in range(160):
        ci = int(rng2.integers(0, N_SHARDS))
        seq = contig_data[ci][2]
        s = int(rng2.integers(0, len(seq) - RL - 10))
        r = list(seq[s : s + RL])
        kind = i % 5
        if kind == 1:      # mismatches
            for p in (15, 55):
                r[p] = bases[(bases.index(r[p]) + 1) % 4]
        elif kind == 2:    # 3bp deletion -> gapped LV path
            del r[40:43]
            r += list(seq[s + RL : s + RL + 3])
        elif kind == 3:    # read inside the shared repeat (multi-shard XA)
            if len(repeat) >= RL:
                r = list(repeat[:RL])
        elif kind == 4 and i % 10 == 4:   # garbage -> unmapped
            r = [bases[c] for c in rng2.integers(0, 4, RL)]
        reads.append("".join(r))
    recs = [SeqRecord(f"r{i}", None, s, "I" * len(s))
            for i, s in enumerate(reads)]
    return contig_data, blocks, recs


def _se_opts(**kw):
    return SEOptions(l_overlap=1, max_seed=50, max_locate=300,
                     print_nm_md=True, print_xa_cigar=True, batch_size=64,
                     gap_batch=16, verify_width=32, **kw)


@pytest.mark.skipif(len(jax.devices()) < N_SHARDS,
                    reason=f"needs {N_SHARDS} devices")
def test_sharded_se_sam_byte_identical(fixture):
    from salt_tpu.parallel.sharded_engine import build_sharded_se

    contig_data, blocks, recs = fixture
    mono_idx = build_index_from_data(contig_data, blocks, l_seed=19)
    mono = SEAligner(mono_idx, _se_opts()).align_records(recs)
    sharded_al = build_sharded_se(contig_data, blocks, N_SHARDS,
                                  opts=_se_opts(), l_seed=19)
    shard = sharded_al.align_records(recs)
    n_diff = sum(1 for a, b in zip(mono, shard) if a != b)
    assert n_diff == 0, (
        f"{n_diff}/{len(mono)} records diverge; first: "
        f"{next((a, b) for a, b in zip(mono, shard) if a != b)}"
    )


@pytest.mark.skipif(len(jax.devices()) < N_SHARDS,
                    reason=f"needs {N_SHARDS} devices")
def test_sharded_pe_sam_byte_identical(fixture):
    from salt_tpu.parallel.sharded_engine import build_sharded_se

    contig_data, blocks, _ = fixture
    rng = np.random.default_rng(5)
    bases = "ACGT"
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    r1, r2 = [], []
    for i in range(48):
        ci = int(rng.integers(0, N_SHARDS))
        seq = contig_data[ci][2]
        tl = int(rng.integers(300, 460))
        s = int(rng.integers(0, len(seq) - tl - 1))
        fwd = list(seq[s : s + RL])
        if i % 4 == 1:
            fwd[30] = bases[(bases.index(fwd[30]) + 1) % 4]
        mate = seq[s + tl - RL : s + tl]
        rev = "".join(comp[c] for c in reversed(mate))
        r1.append("".join(fwd))
        r2.append(rev)
    recs1 = [SeqRecord(f"p{i}", None, s, "I" * len(s))
             for i, s in enumerate(r1)]
    recs2 = [SeqRecord(f"p{i}", None, s, "I" * len(s))
             for i, s in enumerate(r2)]

    pe_kw = dict(l_overlap=1, max_seed=50, max_locate=300, min_tlen=250,
                 max_tlen=550, print_nm_md=True, print_xa_cigar=True,
                 batch_size=64, gap_batch=16, verify_width=32)
    mono_idx = build_index_from_data(contig_data, blocks, l_seed=19)
    mono = PEAligner(mono_idx, PEOptions(**pe_kw)).align_pairs(recs1, recs2)
    sharded_al = build_sharded_se(contig_data, blocks, N_SHARDS,
                                  opts=PEOptions(**pe_kw), l_seed=19,
                                  paired=True)
    shard = sharded_al.align_pairs(recs1, recs2)
    n_diff = sum(1 for a, b in zip(mono, shard) if a != b)
    assert n_diff == 0, (
        f"{n_diff}/{len(mono)} PE records diverge; first: "
        f"{next((a, b) for a, b in zip(mono, shard) if a != b)}"
    )


@pytest.mark.skipif(len(jax.devices()) < N_SHARDS,
                    reason=f"needs {N_SHARDS} devices")
def test_sharded_sw_extend_byte_identical(fixture):
    """-X 1 (SW extension) on the sharded path vs monolithic — covers
    the cross-shard loci lift feeding the SW winner selection."""
    from salt_tpu.parallel.sharded_engine import build_sharded_se

    contig_data, blocks, recs = fixture
    mono_idx = build_index_from_data(contig_data, blocks, l_seed=19)
    mono = SEAligner(mono_idx,
                     _se_opts(extend_algo="sw")).align_records(recs)
    sharded_al = build_sharded_se(contig_data, blocks, N_SHARDS,
                                  opts=_se_opts(extend_algo="sw"),
                                  l_seed=19)
    shard = sharded_al.align_records(recs)
    n_diff = sum(1 for a, b in zip(mono, shard) if a != b)
    assert n_diff == 0, (
        f"{n_diff}/{len(mono)} -X 1 records diverge; first: "
        f"{next((a, b) for a, b in zip(mono, shard) if a != b)}"
    )
