"""SE Smith-Waterman extension mode (-X 1).

The reference binary's own -X 1 path aborts (is_gap=-1 reaches the LV
cigar assert), so these tests pin the working-intent behavior: best SW
locus wins, SW cigar with soft clips, MAPQ from (score1, score2).
"""

import numpy as np
import pytest

from salt_tpu.index.build import build_index_from_data
from salt_tpu.io.fasta import SeqRecord
from salt_tpu.io.snp import SnpBlock
from salt_tpu.pipeline.engine import SEAligner, SEOptions


@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(7)
    bases = "ACGT"
    seq = "".join(bases[c] for c in rng.integers(0, 4, 2000))
    pos = np.array([100], np.uint32)
    ref = bases.index(seq[100])
    alt = (ref + 1) % 4
    stype = np.array([(1 << ref) | (1 << alt) | (ref << 4)], np.uint8)
    idx = build_index_from_data(
        [("c1", "t", seq)], [SnpBlock("c1", pos, stype)], l_seed=19
    )
    return idx, seq


def _aln(idx, read, **kw):
    opts = SEOptions(l_overlap=1, max_locate=100, batch_size=64,
                     extend_algo="sw", print_nm_md=True, **kw)
    al = SEAligner(idx, opts)
    recs = [SeqRecord(name="r0", comment=None, seq=read, qual="I" * len(read))]
    return al.align_records(recs)[0]


def test_sw_mode_deletion_read(tiny):
    idx, seq = tiny
    read = seq[300:352] + seq[355:403]  # 3bp deletion
    rec = _aln(idx, read)
    f = rec.split("\t")
    assert f[3] == "301"
    assert f[5] == "52M3D48M"
    assert int(f[4]) > 0  # SW mapq


def test_sw_mode_clipped_read(tiny):
    idx, seq = tiny
    # 10bp of garbage prefix: SW should soft-clip it
    read = "A" * 10 + seq[500:590]
    rec = _aln(idx, read)
    f = rec.split("\t")
    assert f[5].startswith("10S") or f[5].startswith("11S"), f[5]
    assert f[3] == "501" or f[3] == "502"


def test_sw_mode_ungapped_reads_unaffected(tiny):
    idx, seq = tiny
    read = seq[700:800]
    rec = _aln(idx, read)
    f = rec.split("\t")
    assert f[3] == "701" and f[5] == "100M"


def test_sw_mode_device_prefilter_identical(tiny):
    """-X 1 output identical with the device SW pre-filter forced on."""
    idx, seq = tiny
    rng = np.random.default_rng(12)
    reads = []
    for i in range(24):
        start = int(rng.integers(0, 1800))
        r = list(seq[start : start + 100])
        # gap or heavy mutation so the ungapped pass fails -> SW path
        if i % 2:
            del r[40:43]
            r += list(seq[start + 100 : start + 103])
        else:
            for p in (10, 30, 50, 70):
                r[p] = "ACGT"[("ACGT".index(r[p]) + 1) % 4]
        reads.append("".join(r))
    recs = [SeqRecord(name=f"r{i}", comment=None, seq=s, qual="I" * len(s))
            for i, s in enumerate(reads)]
    outs = {}
    for mode in ("off", "on"):
        opts = SEOptions(l_overlap=1, max_locate=100, batch_size=32,
                         extend_algo="sw", print_nm_md=True, device_sw=mode,
                         device_sw_min_batch=1)
        outs[mode] = SEAligner(idx, opts).align_records(recs)
    assert outs["off"] == outs["on"]
