"""Sampled-SA locate (sa_mode="sampled"): table-level exactness vs the
full coordinate arrays, and end-to-end SE output identity."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from salt_tpu.index.build import build_index_from_data
from salt_tpu.io.fasta import SeqRecord
from salt_tpu.io.snp import SnpBlock
from salt_tpu.ops.locate import resolve_sampled
from salt_tpu.pipeline.device_index import to_device_index
from salt_tpu.pipeline.engine import SEAligner, SEOptions


def _fixture(seed=17, n=6000, n_snp=60):
    rng = np.random.default_rng(seed)
    bases = "ACGT"
    seq = "".join(bases[c] for c in rng.integers(0, 4, n))
    pos = np.sort(rng.choice(np.arange(50, n - 50), n_snp, replace=False)).astype(np.uint32)
    stype = []
    for p in pos:
        ref = bases.index(seq[p])
        alt = (ref + int(rng.integers(1, 4))) % 4
        stype.append((1 << ref) | (1 << alt) | (ref << 4))
    idx = build_index_from_data(
        [("c1", "t", seq)], [SnpBlock("c1", pos, np.array(stype, np.uint8))],
        l_seed=19,
    )
    return idx, seq


@pytest.mark.parametrize("anchor", ["exact", "reference_compat"])
def test_resolver_matches_full_tables(anchor):
    rng = np.random.default_rng(3)
    idx, seq = _fixture()
    if anchor == "reference_compat":
        # rebuild in compat mode to exercise the quirky coordinate bases
        contigs = [("c1", "t", seq)]
        blocks = []
        from salt_tpu.io.snp import SnpBlock as SB
        idx2 = build_index_from_data(
            contigs, [SB("c1", np.array([100, 200], np.uint32),
                         np.array([0x13, 0x26], np.uint8))],
            l_seed=19, r_anchor_mode="reference_compat",
        )
        idx = idx2
    dix_full = to_device_index(idx)
    dix, sampled = to_device_index(idx, sa_mode="sampled")

    n1c = len(idx.csa)
    n1r = len(idx.r_coord)
    B = 512
    # C ranks: skip rank 0 (unreachable from seeds; carries the quirk)
    ranks_c = rng.integers(1, n1c, B).astype(np.int32)
    ranks_r = rng.integers(1, n1r, B).astype(np.int32)
    rank = jnp.asarray(np.concatenate([ranks_c, ranks_r]))
    is_r = jnp.asarray(np.concatenate([np.zeros(B, bool), np.ones(B, bool)]))
    active = jnp.ones(2 * B, bool)
    got = np.asarray(resolve_sampled(
        sampled, dix.ri_c, dix.ri_r, rank, is_r, active))
    want = np.concatenate([idx.csa[ranks_c], idx.r_coord[ranks_r]])
    bad = np.nonzero(got != want)[0]
    assert len(bad) == 0, (bad[:5], got[bad[:5]], want[bad[:5]])


def test_fused_planes_match_standalone_walk():
    """The single-gather fused-plane branch of resolve_sampled must be
    bit-identical to the per-family two-gather fallback, and the fused
    chunked plane builder must reproduce the standalone builders."""
    from salt_tpu.ops.rank import (RankIndex, build_rank_index_device,
                                   build_rank_index_pair_device_chunked)
    from salt_tpu.pipeline.device_index import _pack4

    rng = np.random.default_rng(11)
    idx, _seq = _fixture(seed=23)
    dix, sampled = to_device_index(idx, sa_mode="sampled")
    # dix.ri_c / ri_r are fused (shared cat, row_off); rebuild standalone
    ri_c_solo = build_rank_index_device(
        jnp.asarray(_pack4(idx.cbwt)), len(idx.cbwt), 5,
        np.append(idx.c_l2, 0))
    ri_r_solo = build_rank_index_device(
        jnp.asarray(_pack4(idx.rbwt)), len(idx.rbwt), 6,
        np.append(idx.r_cumfreq, 0))
    assert dix.ri_r.row_off == 5 * dix.ri_c.n_words  # fused mode active

    # fused chunked builder == standalone plane arrays, laid out C-then-R
    fc, fr = build_rank_index_pair_device_chunked(
        jnp.asarray(_pack4(idx.cbwt)), len(idx.cbwt), 5,
        np.append(idx.c_l2, 0),
        jnp.asarray(_pack4(idx.rbwt)), len(idx.rbwt), 6,
        np.append(idx.r_cumfreq, 0))
    cat = np.asarray(fc.bc)
    assert np.array_equal(cat[: fr.row_off], np.asarray(ri_c_solo.bc))
    assert np.array_equal(cat[fr.row_off :], np.asarray(ri_r_solo.bc))

    B = 512
    ranks_c = rng.integers(1, len(idx.csa), B).astype(np.int32)
    ranks_r = rng.integers(1, len(idx.r_coord), B).astype(np.int32)
    rank = jnp.asarray(np.concatenate([ranks_c, ranks_r]))
    is_r = jnp.asarray(np.concatenate([np.zeros(B, bool), np.ones(B, bool)]))
    active = jnp.ones(2 * B, bool)
    got_fused = np.asarray(resolve_sampled(
        sampled, dix.ri_c, dix.ri_r, rank, is_r, active))
    got_solo = np.asarray(resolve_sampled(
        sampled, ri_c_solo, ri_r_solo, rank, is_r, active))
    assert np.array_equal(got_fused, got_solo)


def test_se_output_identical_full_vs_sampled(tmp_path):
    from salt_tpu.sim.wgsim import SimParams, simulate

    idx, seq = _fixture(seed=29, n=9000)
    fa = tmp_path / "g.fa"
    fa.write_text(f">c1\n{seq}\n")
    o1, o2, mut = io.StringIO(), io.StringIO(), io.StringIO()
    p = SimParams(err_rate=0.01, mut_rate=0.01, indel_frac=0.15, n_pairs=60,
                  size_l=100, size_r=100, dist=300, std_dev=30,
                  is_hap=True, seed=41)
    simulate(str(fa), o1, o2, p, mut_out=mut)
    lines = o1.getvalue().splitlines()
    recs = [SeqRecord(name=lines[i][1:], comment=None, seq=lines[i + 1],
                      qual=lines[i + 3]) for i in range(0, len(lines), 4)]
    outs = {}
    for mode in ("full", "sampled"):
        al = SEAligner(idx, SEOptions(
            l_overlap=1, max_locate=500, batch_size=64, print_nm_md=True,
            print_xa_cigar=True, sa_mode=mode,
        ))
        outs[mode] = al.align_records(recs)
    assert outs["full"] == outs["sampled"]
    mapped = sum(1 for l in outs["full"] if l and l.split("\t")[2] != "*")
    assert mapped >= 55


def test_fast_cap_tier_identical(tmp_path):
    """fast_cap (narrow first-pass locate + full-width re-run) must not
    change output."""
    from salt_tpu.sim.wgsim import SimParams, simulate

    idx, seq = _fixture(seed=53, n=9000)
    fa = tmp_path / "g.fa"
    fa.write_text(f">c1\n{seq}\n")
    o1, o2, mut = io.StringIO(), io.StringIO(), io.StringIO()
    simulate(str(fa), o1, o2, SimParams(
        err_rate=0.0, mut_rate=0.02, indel_frac=0.1, n_pairs=50,
        size_l=100, size_r=100, dist=300, std_dev=30, is_hap=True, seed=3,
    ), mut_out=mut)
    lines = o1.getvalue().splitlines()
    recs = [SeqRecord(name=lines[i][1:], comment=None, seq=lines[i + 1],
                      qual=lines[i + 3]) for i in range(0, len(lines), 4)]
    outs = {}
    for fc in (0, 128):
        al = SEAligner(idx, SEOptions(
            l_overlap=1, max_locate=500, batch_size=64, print_nm_md=True,
            print_xa_cigar=True, fast_cap=fc,
        ))
        outs[fc] = al.align_records(recs)
    assert outs[0] == outs[128]
