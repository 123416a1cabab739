"""Fuzz ops/locate.py against a straightforward per-read Python oracle
of the reference's push-stream semantics (alnse_locate_alt /
alnse_locate), covering cap truncation, invalid seeds, uint32
wraparound and the PE R-subsample stride."""

import jax.numpy as jnp
import numpy as np
import pytest

from salt_tpu.constants import MAX_LOC_POS
from salt_tpu.ops.locate import locate, sort_loci
from salt_tpu.ops.seed import Seeds


def oracle_locate(c_seeds, r_seeds, sa_c, sa_r, l_seq, l_mref,
                  max_locate, cap, pe_mode):
    """Python replay of the C-then-R width-sorted push stream (separate
    per-family SA arrays; the device fuses them into sa_cat)."""
    combined = []
    for seeds, is_r, sa in ((c_seeds, False, sa_c), (r_seeds, True, sa_r)):
        for i in range(len(seeds.sp)):
            combined.append((is_r, int(seeds.sp[i]), int(seeds.ep[i]),
                             int(seeds.offset[i]), bool(seeds.valid[i]), sa))

    def key(t):
        is_r, sp, ep, _off, valid, _sa = t
        width = ep - sp
        return (is_r, 2**29 if not valid else min(width, 2**28 - 1))

    combined.sort(key=key)
    push_cap = MAX_LOC_POS if pe_mode else max_locate
    pushed = []
    n_push = 0
    slots_used = 0
    for is_r, sp, ep, off, valid, sa in combined:
        width = ep - sp
        if pe_mode:
            if is_r:
                skip = max(width // max_locate, 1) if width > max_locate else 1
                count = width // skip + 1 if valid else 0
            else:
                skip = 1
                count = min(width + 1, max_locate) if valid else 0
        else:
            if is_r:
                skip = max((width + 1) // MAX_LOC_POS, 1)
                count = width // skip + 1 if valid else 0
            else:
                skip = 1
                count = width + 1 if valid else 0
        for j in range(count):
            if slots_used >= cap:
                pushed.sort()
                return pushed, n_push < push_cap
            slots_used += 1
            rank = min(max(sp + j * skip, 0), len(sa) - 1)
            pos = (int(sa[rank]) - off) & 0xFFFFFFFF
            end_u = (pos + l_seq) & 0xFFFFFFFF
            ok = end_u <= l_mref
            if is_r:
                ok = ok and pos <= l_mref
            if ok and n_push < push_cap:
                n_push += 1
                pushed.append(pos)
    pushed.sort()
    return pushed, False


@pytest.mark.parametrize("pe_mode", [False, True])
@pytest.mark.parametrize("chunk", [0, 16])  # flat and column-chunked paths
def test_locate_fuzz(pe_mode, chunk):
    rng = np.random.default_rng(5 if pe_mode else 6)
    B, S = 16, 12
    n_sa = 4096
    l_mref = 3500
    l_seq = 100
    max_locate = 4 if pe_mode else 20
    cap = 64

    sa_c = rng.integers(0, n_sa, n_sa).astype(np.uint32)
    sa_r = rng.integers(0, n_sa, n_sa).astype(np.uint32)
    sa_cat = np.concatenate([sa_c, sa_r])

    def rand_seeds():
        sp = rng.integers(0, n_sa - 80, (B, S)).astype(np.int32)
        width = rng.integers(-1, 40, (B, S)).astype(np.int32)
        # some very wide intervals exercise the PE subsample stride
        wide = rng.random((B, S)) < 0.2
        width = np.where(wide, rng.integers(50, 400, (B, S)), width)
        ep = np.minimum(sp + width, n_sa - 1).astype(np.int32)
        off = rng.integers(0, l_seq, (B, S)).astype(np.int32)
        valid = rng.random((B, S)) < 0.8
        return Seeds(sp=jnp.asarray(sp), ep=jnp.asarray(ep),
                     offset=jnp.asarray(off), valid=jnp.asarray(valid))

    cs, rs = rand_seeds(), rand_seeds()
    out = locate(cs, rs, jnp.asarray(sa_cat), n_sa, l_seq, l_mref,
                 max_locate, cap, pe_mode=pe_mode, chunk=chunk)
    srt = sort_loci(out.loci)
    got_pos = np.asarray(srt.pos)
    got_push = np.asarray(srt.pushed)
    got_ovf = np.asarray(out.overflow)

    for b in range(B):
        c_one = Seeds(*(np.asarray(a)[b] for a in cs))
        r_one = Seeds(*(np.asarray(a)[b] for a in rs))
        want, want_ovf = oracle_locate(
            c_one, r_one, sa_c, sa_r, l_seq, l_mref, max_locate, cap,
            pe_mode,
        )
        mine = sorted(int(p) for p, k in zip(got_pos[b], got_push[b]) if k)
        assert mine == want, (b, mine[:8], want[:8])
        assert bool(got_ovf[b]) == want_ovf, b
