"""Validate the precomputed R-part rank->genome-coordinate table.

Two modes (see salt_tpu.index.build.build_index):

* "reference_compat" must reproduce, bit-for-bit, what the reference's
  Rbwt_back_bwt_sa (Align_src/rbwt.c:316-333) returns — including its
  broken '#'-anchor bookkeeping (coordinates 2 too low, each window's
  last segment anchored to the next window, OOB-zero for the final
  segment).  We reproduce its walk directly in text space using the
  reference's .R.backward.sa file.

* "exact" must return the true genome coordinate of every local-pattern
  position (this is the product default; it makes SNP-aware seeding
  actually work).
"""

import numpy as np

from conftest import ORACLE_DIR, requires_oracle
from reference_formats import load_r_bwt, load_r_sa

from salt_tpu.constants import NT_SHARP
from salt_tpu.index.build import build_index
from salt_tpu.index.suffix import suffix_array

GENOME = "/tmp/refbuild/Test/Genome/Genome.fa"


@requires_oracle
def test_compat_r_coord_matches_reference_walk():
    b = build_index(
        GENOME,
        f"{ORACLE_DIR}/hapmap.txt",
        l_seed=19,
        keep_r_text=True,
        r_anchor_mode="reference_compat",
    )
    ref_sa_sharp = load_r_sa(f"{ORACLE_DIR}/idx.R.backward.sa")
    ref_bwt = load_r_bwt(f"{ORACLE_DIR}/idx.R.backward.bwt")
    n_before_sharp = int(ref_bwt["cumfreq"][NT_SHARP])

    text = b.r_text
    T = len(text)
    sa = suffix_array(text)
    isa = np.empty(T + 1, dtype=np.int64)
    isa[sa] = np.arange(T + 1)
    is_sharp = text == NT_SHARP
    prev_sharp = np.maximum.accumulate(np.where(is_sharp, np.arange(T), -1))

    p_all = np.nonzero(~is_sharp)[0]
    q = prev_sharp[p_all]
    assert (q >= 0).all()
    steps = p_all - q
    rows = isa[q]
    refv = (ref_sa_sharp[rows - n_before_sharp - 1].astype(np.int64) + steps - 1) & 0xFFFFFFFF
    mine = b.r_coord[isa[p_all]].astype(np.int64)
    assert np.array_equal(refv, mine)


@requires_oracle
def test_exact_r_coord_is_true_genome_coordinate():
    b = build_index(
        GENOME,
        f"{ORACLE_DIR}/hapmap.txt",
        l_seed=19,
        keep_r_text=True,
        r_anchor_mode="exact",
    )
    # every non-'#' local pattern position must map to a genome position
    # whose mixRef nibble admits the pattern char (i.e. the coordinate is
    # consistent with the SNP-augmented genome), for in-range coords.
    text = b.r_text
    T = len(text)
    sa = suffix_array(text)
    rng = np.random.default_rng(1)
    checked = 0
    for j in rng.integers(1, T + 1, size=5000):
        p = int(sa[j])
        if p >= T or text[p] > 3:
            continue
        coord = int(b.r_coord[j])
        if coord >= b.l_pac:
            continue  # window anchored past a contig end (clamp quirk)
        assert b.mixref[coord] & (1 << int(text[p])), (j, p, coord)
        checked += 1
    assert checked > 3000
