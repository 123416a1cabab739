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


# ---------------------------------------------------------------------------
# unique / uniqcmp / vareval modes vs the Perl oracle

def _multi_sam():
    """Reads with multiple hits (sorted by name) + header."""
    lines = ["@HD\tVN:1.3\n"]
    lines += [
        _sam("r1", 0, "c1", 100, 37, "90M10S"),
        _sam("r1", 0, "c1", 500, 37, "100M"),
        _sam("r1", 16, "c2", 900, 37, "40M2I58M"),
        _sam("r2", 0, "c1", 300, 60, "100M"),
        _sam("r3", 16, "c3", 50, 0, "50M1D50M"),
        _sam("r3", 0, "c3", 70, 0, "100M\tAS:i:77"),
    ]
    return lines


def test_unique_matches_perl(tmp_path):
    import subprocess, sys, io
    from salt_tpu.eval.wgsim_eval import unique

    if not os.path.exists(PERL):
        pytest.skip("perl evaluator missing")
    sam = tmp_path / "multi.sam"
    sam.write_text("".join(_multi_sam()))
    for extra in ([], ["-Q"], ["-Q", "-m"]):
        perl_out = subprocess.run(
            ["perl", PERL, "unique"] + extra + [str(sam)],
            capture_output=True, text=True, check=True,
        ).stdout
        buf = io.StringIO()
        unique(open(sam), buf, recal_q="-Q" in extra,
               multi_only="-m" in extra)
        assert buf.getvalue() == perl_out, extra


def test_uniqcmp_matches_perl(tmp_path):
    import subprocess
    from salt_tpu.eval.wgsim_eval import uniqcmp, UNIQCMP_LABELS

    if not os.path.exists(PERL):
        pytest.skip("perl evaluator missing")
    s1 = tmp_path / "a.sam"
    s2 = tmp_path / "b.sam"
    s1.write_text("".join([
        _sam("r1", 0, "c1", 100, 60, "100M"),
        _sam("r2", 0, "c1", 300, 5, "100M"),
        _sam("r3", 16, "c2", 50, 60, "100M"),
        _sam("r5", 0, "c1", 700, 60, "100M"),
    ]))
    s2.write_text("".join([
        _sam("r1", 0, "c1", 120, 60, "100M"),
        _sam("r2", 0, "c9", 300, 60, "100M"),
        _sam("r3", 16, "c2", 2000, 3, "100M"),
        _sam("r4", 0, "c1", 10, 60, "100M"),
    ]))
    perl = subprocess.run(
        ["perl", PERL, "uniqcmp", str(s1), str(s2)],
        capture_output=True, text=True, check=True,
    ).stdout
    perl_counts = [int(l.rsplit(None, 1)[-1]) for l in perl.splitlines()]
    ours = uniqcmp(open(s1), open(s2))
    assert ours == perl_counts


def test_vareval_matches_perl(tmp_path):
    import subprocess
    from salt_tpu.eval.wgsim_eval import vareval

    if not os.path.exists(PERL):
        pytest.skip("perl evaluator missing")
    truth = tmp_path / "truth.snp"
    truth.write_text(
        "c1\t100\tA\tG\t3\n"
        "c1\t200\tC\tT\t3\n"
        "c2\t50\tA\t-\t2\n"          # indel (4 cols -> indel in perl; use 5 with '-')
        "c2\t60\tA\t-\t3\n"
    )
    pile = tmp_path / "calls.pileup"
    pile.write_text(
        "c1\t100\tA\tG\t99\t45\n"    # true SNP call
        "c1\t150\tA\tG\t99\t30\n"    # FP SNP
        "c2\t55\t*\t+A/+A\t99\t20\n" # indel near truth (within 10)
        "c2\t400\t*\t+T/+T\t99\t15\n"  # FP indel
        "c1\t300\tG\tG\t99\t80\n"    # ref call, skipped
    )
    perl = subprocess.run(
        ["perl", PERL, "vareval", str(truth), str(pile)],
        capture_output=True, text=True, check=True,
    ).stdout
    perl_rows = [[int(x) for x in l.split()] for l in perl.splitlines()]
    ours = vareval(open(truth), open(pile))
    assert ours == perl_rows
