"""End-to-end SAM byte-parity vs the reference binary, in-suite.

Round-2 verdict: the 20k-read SE / 2k-pair PE parity checks lived only
in tools/run_*_oracle_diff.py, so a parity regression could not fail
`pytest`.  These tests align a small slice of the oracle reads (SE and
PE) with the exact CLI option mapping of run_test.sh
(/root/reference/Test/Run_test/run_se_test.sh:20, run_pe_test.sh:19:
`-d -r 1 -l 100 -n 20 -c -m 500 [-p]`) and byte-compare against the
reference's own SAM output.  Batch/cap sizes are kept small so the CPU
compile stays in seconds; the index is built once per module.
"""

import itertools
import os
import sys

import pytest

from conftest import requires_oracle

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GENOME = "/tmp/refbuild/Test/Genome/Genome.fa"
ORACLE = "/tmp/oracle"

N_SE = 512
N_PE = 96


def _read_n(path, n):
    from salt_tpu.io.fasta import read_records

    return list(itertools.islice(read_records(path), n))


def _oracle_lines(path, n, stride=1):
    """First n SAM records.  The reference's PE writer emits a blank
    line after every record (sam.c pe flow) — stride=2 skips those."""
    out = []
    keep = 0
    with open(path) as fh:
        for line in fh:
            if line.startswith("@"):
                continue
            if keep % stride == 0:
                out.append(line.rstrip("\n"))
                if len(out) >= n:
                    break
            keep += 1
    return out


@pytest.fixture(scope="module")
def compat_index():
    from salt_tpu.index.build import build_index

    if not os.path.exists(GENOME):
        pytest.skip("reference oracle tree not present")
    return build_index(GENOME, f"{ORACLE}/hapmap.txt", l_seed=19,
                       r_anchor_mode="reference_compat")


@requires_oracle
def test_se_sam_byte_parity(compat_index):
    from salt_tpu.pipeline.engine import SEAligner, SEOptions

    opts = SEOptions(l_overlap=1, max_locate=500, print_nm_md=True,
                     print_xa_cigar=True, batch_size=256, gap_batch=32)
    al = SEAligner(compat_index, opts)
    recs = _read_n(f"{ORACLE}/Read1.fq", N_SE)
    out = al.align_records(recs)
    oracle = _oracle_lines(f"{ORACLE}/se_oracle.sam", len(out))
    n_diff = sum(1 for a, b in zip(out, oracle) if a != b)
    assert n_diff == 0, (
        f"{n_diff}/{len(out)} SE records diverge from the reference; "
        f"first: {next((a, b) for a, b in zip(out, oracle) if a != b)}"
    )


@requires_oracle
def test_plain_index_se_sam_byte_parity(tmp_path):
    """Zero-SNP (plain-genome) mode end to end vs the reference binary.

    The reference binary segfaults on a truly empty hapmap (its R-BWT
    construction, 4bit_bwt_gen.c, cannot take an empty text), so the
    oracle is built with a decoy contig carrying the only SNP — reads
    never seed into the decoy's local patterns, making its SAM equal to
    a plain alignment (see tools/make_oracle.sh).  Our side builds from
    the SAME fasta with an EMPTY SNP file, exercising the real no-SNP
    path (empty sharp_bases — the round-3 regression's trigger)."""
    from salt_tpu.index.build import build_index
    from salt_tpu.pipeline.engine import SEAligner, SEOptions

    if not os.path.exists(f"{ORACLE}/plain_g.fa"):
        pytest.skip("plain oracle not present (rerun tools/make_oracle.sh)")
    empty = tmp_path / "empty.txt"
    empty.write_text("")
    idx = build_index(f"{ORACLE}/plain_g.fa", str(empty), l_seed=19,
                      r_anchor_mode="reference_compat")
    assert len(idx.sharp_bases) == 0  # truly zero-SNP
    opts = SEOptions(l_overlap=1, max_locate=500, print_nm_md=True,
                     print_xa_cigar=True, batch_size=256, gap_batch=32)
    al = SEAligner(idx, opts)
    recs = _read_n(f"{ORACLE}/Read1.fq", 256)
    out = al.align_records(recs)
    oracle = _oracle_lines(f"{ORACLE}/se_plain_oracle.sam", len(out))
    n_diff = sum(1 for a, b in zip(out, oracle) if a != b)
    assert n_diff == 0, (
        f"{n_diff}/{len(out)} plain-index records diverge; "
        f"first: {next((a, b) for a, b in zip(out, oracle) if a != b)}"
    )


@requires_oracle
def test_pe_sam_byte_parity(compat_index):
    from salt_tpu.pipeline.pe_engine import PEAligner, PEOptions

    # matches the oracle's generation flags (tools/make_oracle.sh PE run:
    # -r 5 -m 1000, tlen window 350-650)
    opts = PEOptions(l_overlap=5, max_locate=1000, min_tlen=350,
                     max_tlen=650, print_nm_md=True, print_xa_cigar=True,
                     batch_size=192, gap_batch=32)
    al = PEAligner(compat_index, opts)
    recs1 = _read_n(f"{ORACLE}/Read1.fq", N_PE)
    recs2 = _read_n(f"{ORACLE}/Read2.fq", N_PE)
    out = [l.rstrip("\n") for l in al.align_pairs(recs1, recs2)]
    oracle = _oracle_lines(f"{ORACLE}/pe_oracle.sam", len(out), stride=2)
    n_diff = sum(1 for a, b in zip(out, oracle) if a != b)
    assert n_diff == 0, (
        f"{n_diff}/{len(out)} PE records diverge from the reference; "
        f"first: {next((a, b) for a, b in zip(out, oracle) if a != b)}"
    )
