"""readtools: paired-aware sampling + unmapped dumps."""

import io

import numpy as np

from salt_tpu.eval.readtools import dump_unmapped, sample_fastq


def test_sample_paired(tmp_path):
    r1 = tmp_path / "r1.fq"
    r2 = tmp_path / "r2.fq"
    for p, tag in ((r1, "a"), (r2, "b")):
        with open(p, "w") as f:
            for i in range(50):
                f.write(f"@{tag}{i}\nACGT\n+\nIIII\n")
    assert sample_fastq([str(r1), str(r2)], 20, seed=3) == 0
    s1 = open(str(r1) + ".sample").read().splitlines()[::4]
    s2 = open(str(r2) + ".sample").read().splitlines()[::4]
    assert len(s1) == len(s2) == 20
    # mates stay paired: same indices in both files
    assert [n[2:] for n in s1] == [n[2:] for n in s2]


def test_unmapped_dump(tmp_path):
    sam = tmp_path / "x.sam"
    sam.write_text(
        "@HD\tVN:1\n"
        "m\t0\tc\t1\t60\t4M\t*\t0\t0\tACGT\tIIII\n"
        "u\t4\t*\t0\t0\t*\t*\t0\t0\tTTTT\tIIII\n"
    )
    out = io.StringIO()
    dump_unmapped(str(sam), out=out)
    assert out.getvalue().startswith("u\t4")
    out = io.StringIO()
    dump_unmapped(str(sam), out=out, fasta=True)
    assert out.getvalue() == ">u\nTTTT\n"
