"""Accuracy evaluator (salt_tpu/eval/wgsim_eval.py) vs the Perl oracle."""

import os
import re
import subprocess

import pytest

from conftest import requires_oracle
from salt_tpu.eval import alneval

PERL = "/root/reference/Test/Simulator/wgsim-master/wgsim_eval.pl"


def _sam(name, flag, chrom, pos, mapq, cigar):
    return (
        f"{name}\t{flag}\t{chrom}\t{pos}\t{mapq}\t{cigar}\t*\t0\t0\t"
        "ACGT\tIIII\n"
    )


def test_forward_correct_within_gap():
    ev = alneval([_sam("c1_100_250_0", 0, "c1", 105, 60, "100M")])
    assert ev.n_mapped == 1 and ev.n_wrong == 0


def test_forward_wrong_beyond_gap():
    ev = alneval([_sam("c1_100_250_0", 0, "c1", 150, 60, "100M")])
    assert ev.n_wrong == 1


def test_reverse_uses_right_end():
    # rght = pos + 100 - 1 = 249 vs truth 250 -> correct
    ev = alneval([_sam("c1_100_250_0", 16, "c1", 150, 60, "100M")])
    assert ev.n_wrong == 0


def test_clip_adjustment_rescues():
    # 10S90M forward at 110: left=110, clip-adjusted left=100 == truth
    ev = alneval([_sam("c1_100_250_0", 0, "c1", 110, 60, "10S90M")])
    assert ev.n_wrong == 0


def test_wrong_chrom_and_unmapped():
    ev = alneval(
        [
            _sam("c1_100_250_0", 0, "c2", 100, 60, "100M"),
            _sam("c1_100_250_1", 4, "*", 0, 0, "*"),
        ]
    )
    assert ev.n_wrong == 1 and ev.n_unmapped == 1


@requires_oracle
def test_matches_perl_on_oracle_sam():
    sam = "/tmp/oracle/se_oracle.sam"
    if not os.path.exists(PERL):
        pytest.skip("perl evaluator missing")
    out = subprocess.run(
        ["perl", PERL, "alneval", sam],
        capture_output=True, text=True, check=True,
    ).stdout
    perl_rows = []
    for line in out.splitlines():
        m = re.match(r"(\d+)x\s+(\d+) / (\d+)\s+(\d+)", line)
        if m:
            perl_rows.append(tuple(int(g) for g in m.groups()))
    with open(sam) as fp:
        ev = alneval(fp)
    ours = [(q, w, n, cum) for q, w, n, cum, _ in ev.table()]
    assert ours == perl_rows
