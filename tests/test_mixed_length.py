"""Mixed-length read support: byte parity vs the reference binary on a
FASTQ whose reads have several distinct lengths.

The reference tracks per-read l_seq (Align_src/query.h:37-63) and aligns
whatever lengths arrive; we group reads by exact length into fixed-shape
device programs (engine.group_by_length) and re-scatter the output.
The fixture truncates oracle reads to three lengths and the reference
binary aligns the same file, so the comparison covers ordering and the
per-length SAM fields (cigar length, tags) end to end.
"""

import itertools
import os
import subprocess
import sys

import pytest

from conftest import requires_oracle

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ORACLE = "/tmp/oracle"
REF_SALT = "/tmp/refbuild/Bin/salt"
N = 120


def _mixed_records():
    from salt_tpu.io.fasta import read_records

    from salt_tpu.io.fasta import SeqRecord

    recs = list(itertools.islice(read_records(f"{ORACLE}/Read1.fq"), N))
    out = []
    for i, r in enumerate(recs):
        L = (70, 85, 100)[i % 3]
        out.append(SeqRecord(r.name, r.comment, r.seq[:L], r.qual[:L]))
    return out


@requires_oracle
@pytest.mark.skipif(not os.path.exists(REF_SALT), reason="reference binary absent")
def test_mixed_length_se_parity(tmp_path):
    from salt_tpu.index.build import build_index
    from salt_tpu.pipeline.engine import SEAligner, SEOptions

    recs = _mixed_records()
    fq = tmp_path / "mixed.fq"
    with open(fq, "w") as fh:
        for r in recs:
            fh.write(f"@{r.name}\n{r.seq}\n+\n{r.qual}\n")

    ref_sam = tmp_path / "ref.sam"
    with open(ref_sam, "w") as fh:
        subprocess.run(
            [REF_SALT, "-d", "-r", "1", "-l", "100", "-n", "20", "-c",
             "-m", "500", "-t", "1", f"{ORACLE}/idx", str(fq)],
            stdout=fh, stderr=subprocess.DEVNULL, check=True, cwd=ORACLE,
        )

    idx = build_index("/tmp/refbuild/Test/Genome/Genome.fa",
                      f"{ORACLE}/hapmap.txt", l_seed=19,
                      r_anchor_mode="reference_compat")
    opts = SEOptions(l_overlap=1, max_locate=500, print_nm_md=True,
                     print_xa_cigar=True, batch_size=64, gap_batch=16)
    al = SEAligner(idx, opts)
    out = al.align_records(recs)

    oracle = [l.rstrip("\n") for l in open(ref_sam) if not l.startswith("@")]
    assert len(oracle) >= len(out)
    n_diff = sum(1 for a, b in zip(out, oracle) if a != b)
    assert n_diff == 0, (
        f"{n_diff}/{len(out)} mixed-length records diverge; first: "
        f"{next((a, b) for a, b in zip(out, oracle) if a != b)}"
    )
