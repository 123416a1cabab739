"""Polish tool vs the reference `polish` binary (oracle fixtures)."""

import io
import os

import pytest

from conftest import ORACLE_DIR, requires_oracle

SUB = f"{ORACLE_DIR}/se_sub_h.sam"
have_polish_oracle = os.path.exists(f"{ORACLE_DIR}/polish_se_oracle.txt")


@pytest.mark.skipif(not have_polish_oracle, reason="polish oracle missing")
@pytest.mark.parametrize("paired", [False, True])
def test_polish_parity(paired):
    from salt_tpu.index.build import build_index
    from salt_tpu.polish.polish import polish_main

    idx = build_index(
        "/tmp/refbuild/Test/Genome/Genome.fa", f"{ORACLE_DIR}/hapmap.txt",
        l_seed=19, r_anchor_mode="reference_compat",
    )
    buf = io.StringIO()
    polish_main(idx, SUB, paired=paired, out=buf)
    mine = buf.getvalue().splitlines(keepends=True)
    name = "polish_pe_oracle.txt" if paired else "polish_se_oracle.txt"
    oracle = open(f"{ORACLE_DIR}/{name}").readlines()
    assert len(mine) == len(oracle)
    assert mine == oracle


have_polish_sw_oracle = os.path.exists(f"{ORACLE_DIR}/polish_se_sw_oracle.txt")


@pytest.mark.skipif(not have_polish_sw_oracle, reason="polish -s oracle missing")
@pytest.mark.parametrize("paired", [False, True])
def test_polish_sw_parity(paired):
    """-s mode: SSW rescoring against the reference binary."""
    from salt_tpu.index.build import build_index
    from salt_tpu.polish.polish import polish_main

    idx = build_index(
        "/tmp/refbuild/Test/Genome/Genome.fa", f"{ORACLE_DIR}/hapmap.txt",
        l_seed=19, r_anchor_mode="reference_compat",
    )
    buf = io.StringIO()
    polish_main(idx, SUB, paired=paired, use_sw=True, out=buf)
    mine = buf.getvalue().splitlines(keepends=True)
    name = "polish_pe_sw_oracle.txt" if paired else "polish_se_sw_oracle.txt"
    oracle = open(f"{ORACLE_DIR}/{name}").readlines()
    assert len(mine) == len(oracle)
    assert mine == oracle
