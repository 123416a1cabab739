"""The vectorized PE pairing fast path (_fill_states_fast) against the
per-pair reference path (_make_state) on randomized hit lists —
covering cap-truncation ties, cross-product tie-break order, b1 edge
values, ambiguous ends and unmapped ends, beyond what the oracle
fixture's data distribution reaches."""

import numpy as np
import pytest

from salt_tpu.index.build import build_index_from_data
from salt_tpu.io.snp import SnpBlock
from salt_tpu.pipeline.pe_engine import PEAligner, PEOptions

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def aligner():
    rng = np.random.default_rng(3)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, 4096))
    snp_pos = np.sort(rng.choice(np.arange(50, 4000), 30,
                                 replace=False)).astype(np.uint32)
    stype = []
    for p in snp_pos:
        ref = "ACGT".index(genome[p])
        alt = (ref + 1) % 4
        stype.append((1 << ref) | (1 << alt) | (ref << 4))
    idx = build_index_from_data(
        [("chr1", "t", genome)],
        [SnpBlock("chr1", snp_pos, np.array(stype, np.uint8))], l_seed=19)
    return PEAligner(idx, PEOptions(min_tlen=250, max_tlen=550))


def _rand_res(rng, M, K, l_pac):
    found = rng.random(M) < 0.85
    pos = rng.integers(0, l_pac - 120, M).astype(np.uint32)
    res = {
        "found": found,
        "pos": pos,
        "strand": rng.integers(0, 2, M),
        "n_diff": rng.integers(0, 4, M),
        "n_hits": rng.integers(0, K + 3, (M, 2)),
        "first_hit_ndiff": rng.integers(0, 4, (M, 2)),
        # occasional duplicates of the primary pos exercise the
        # pos != primary skip; clustered positions exercise in_range.
        # Each strand's list is POSITION-ASCENDING — the production
        # invariant (hit lists come from sorted loci via order-
        # preserving compaction) that makes the reference's
        # rr==1 inner-loop break equivalent to the full cross product
        "hits_pos": np.sort(
            (pos[:, None, None]
             + rng.integers(-40, 400, (M, 2, K))).astype(np.uint32),
            axis=-1),
        "hits_ndiff": rng.integers(0, 4, (M, 2, K)),
    }
    return res


def _end_state(e):
    return (e.pos, e.strand, e.n_diff, e.is_gap, e.b0, e.b1, e.mapq,
            e.cigar, e.seq_start, e.seq_end, e.hits)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_fast_path_matches_make_state(aligner, seed):
    rng = np.random.default_rng(seed)
    K = 8
    n = 64
    L = 100
    l_pac = aligner.index.l_pac
    res = _rand_res(rng, 2 * n, K, l_pac)
    codes = [rng.integers(0, 4, L).astype(np.uint8) for _ in range(2 * n)]
    rcodes = [np.where(c[::-1] < 4, 3 - c[::-1], 4).astype(np.uint8)
              for c in codes]
    n_amb = np.zeros(2 * n, np.int64)
    n_amb[rng.random(2 * n) < 0.05] = 99   # some ambiguous ends
    names = [f"r{i}" for i in range(2 * n)]
    quals = ["I" * L] * (2 * n)

    # reference: per-pair _make_state on plain rows
    want = []
    for i in range(n):
        r0 = ({k: v[i] for k, v in res.items()}, False)
        r1 = ({k: v[n + i] for k, v in res.items()}, False)
        want.append(aligner._make_state(
            names[i], names[n + i], quals[i], quals[n + i],
            codes[i], rcodes[i], codes[n + i], rcodes[n + i],
            n_amb[i], n_amb[n + i], r0, r1))

    # fast path: rows 0..n-1 are end0, n..2n-1 are end1 (P = n, p0 = 0)
    states = [None] * n
    aligner._fill_states_fast(
        states, list(range(n)), 0, n, names, quals, codes, rcodes,
        n_amb, n, res)

    for i in range(n):
        e0w, e1w, mode_w, reqs_w = want[i]
        e0g, e1g, mode_g, reqs_g = states[i]
        assert mode_g == mode_w, (i, mode_g, mode_w)
        assert _end_state(e0g) == _end_state(e0w), (i, "end0")
        assert _end_state(e1g) == _end_state(e1w), (i, "end1")
        if reqs_w is None:
            assert reqs_g is None, i
        else:
            assert [(r[2], r[3], r[4]) for r in reqs_g] == \
                [(r[2], r[3], r[4]) for r in reqs_w], i
