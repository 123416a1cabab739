"""Index builder vs the reference salt-idx output files.

The oracle fixture set in /tmp/oracle is produced by tools/make_oracle.sh
(bundled Test genome, wgsim-simulated SNPs, reference binaries).
"""

import numpy as np
import pytest

from conftest import ORACLE_DIR, requires_oracle
from reference_formats import (
    load_c_bwt,
    load_c_sa,
    load_lkt,
    load_mixref,
    load_r_bwt,
    load_r_pac,
)

from salt_tpu.index.build import build_index

GENOME = "/tmp/refbuild/Test/Genome/Genome.fa"


@pytest.fixture(scope="module")
def built():
    return build_index(GENOME, f"{ORACLE_DIR}/hapmap.txt", l_seed=19, keep_r_text=True)


@requires_oracle
def test_pac_and_mixref(built):
    mix = load_mixref(f"{ORACLE_DIR}/idx.ref")
    assert len(mix) == built.l_pac
    assert np.array_equal(mix, built.mixref)


@requires_oracle
def test_lookup_table(built):
    lkt = load_lkt(f"{ORACLE_DIR}/idx.C.lkt")
    assert np.array_equal(lkt, built.lkt)


@requires_oracle
def test_c_bwt(built):
    ref = load_c_bwt(f"{ORACLE_DIR}/idx.C.bwt")
    assert ref["seq_len"] == built.l_pac
    assert ref["primary"] == built.c_primary
    assert np.array_equal(ref["L2"][1:], built.c_l2[1:].astype(np.uint64))
    # reference stores the BWT with the sentinel removed
    mine = np.delete(built.cbwt, built.c_primary)
    assert np.array_equal(ref["bwt"], mine)


@requires_oracle
def test_c_sa(built):
    ref = load_c_sa(f"{ORACLE_DIR}/idx.C.sa")
    intv = ref["sa_intv"]
    sampled = built.csa[::intv][: len(ref["sa"])]
    assert np.array_equal(ref["sa"], sampled)


@requires_oracle
def test_r_text(built):
    chars = load_r_pac(f"{ORACLE_DIR}/idx.R.pac")
    assert len(chars) == built.r_text_len
    assert np.array_equal(chars, built.r_text)


@requires_oracle
def test_r_bwt(built):
    ref = load_r_bwt(f"{ORACLE_DIR}/idx.R.backward.bwt")
    assert ref["text_len"] == built.r_text_len
    assert ref["inverse_sa0"] == built.r_primary
    assert np.array_equal(ref["cumfreq"][1:], built.r_cumfreq[1:6].astype(np.uint64))
    mine = np.delete(built.rbwt, built.r_primary)
    assert np.array_equal(ref["bwt"], mine)
