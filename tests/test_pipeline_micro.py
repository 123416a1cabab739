"""End-to-end pipeline checks on tiny fixtures (CPU backend).

Uses the micro single-SNP fixture (byte-compare against the reference
binary's SAM when available) and the synthetic in-memory fixture from
__graft_entry__ for backend-independent sanity.
"""

import os
import sys

import numpy as np
import pytest

from conftest import requires_oracle

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


MICRO = "/tmp/micro"
micro_present = os.path.exists(f"{MICRO}/micro_oracle.sam")


@pytest.mark.skipif(not micro_present, reason="micro fixture missing")
def test_micro_se_sam_parity():
    from salt_tpu.index.build import build_index
    from salt_tpu.io.fasta import read_records
    from salt_tpu.pipeline.engine import SEAligner, SEOptions

    idx = build_index(f"{MICRO}/g.fa", f"{MICRO}/hm.txt", l_seed=19,
                      r_anchor_mode="reference_compat")
    opts = SEOptions(l_overlap=1, print_nm_md=True, print_xa_cigar=True,
                     batch_size=4, gap_batch=4, cap_margin=64,
                     verify_width=16)
    al = SEAligner(idx, opts)
    recs = list(read_records(f"{MICRO}/r.fq"))
    out = al.align_records(recs)
    oracle = [l.rstrip("\n") for l in open(f"{MICRO}/micro_oracle.sam")
              if not l.startswith("@")]
    assert out[0] == oracle[0]


def test_synthetic_exact_mode_alignment():
    """With the exact R anchors, reads carrying alternate alleles must
    align back to their true positions."""
    import __graft_entry__ as g
    import jax

    fn, (dix, fwd, rev) = g.entry()
    out = jax.jit(fn)(dix, fwd, rev)
    pos, n_diff, found = (np.asarray(x) for x in out)
    assert found.all()
    assert (n_diff == 0).all()  # all mutations are known SNPs
