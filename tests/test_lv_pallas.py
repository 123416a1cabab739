"""Pallas banded-LV kernel vs the jnp reference implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from salt_tpu.ops.lv import lv_distance_batch
from salt_tpu.ops.lv_pallas import lv_distance_batch_pallas


@pytest.mark.parametrize("k", [3, 10])
def test_pallas_matches_jnp(k):
    rng = np.random.default_rng(5)
    N, L = 160, 100
    mlen = 4000
    mix = (1 << rng.integers(0, 4, mlen)).astype(np.uint8)
    snp = rng.random(mlen) < 0.05
    mix[snp] |= (1 << rng.integers(0, 4, snp.sum())).astype(np.uint8)
    pos = rng.integers(0, mlen - 130, N).astype(np.int32)
    seq = rng.integers(0, 4, (N, L)).astype(np.int32)
    for i in range(0, N, 2):  # plant half with few mismatches
        window = mix[pos[i] : pos[i] + L]
        bases = np.array([(int(v) & -int(v)).bit_length() - 1 for v in window])
        r = bases.copy()
        for _ in range(int(rng.integers(0, 5))):
            j = rng.integers(0, L)
            r[j] = (r[j] + 1) % 4
        seq[i] = r
    active = rng.random(N) < 0.9
    a = np.asarray(lv_distance_batch(
        jnp.asarray(mix), jnp.asarray(pos), jnp.asarray(active),
        jnp.asarray(seq), k))
    b = np.asarray(lv_distance_batch_pallas(
        jnp.asarray(mix), jnp.asarray(pos), jnp.asarray(active),
        jnp.asarray(seq), k, interpret=True))
    assert (a == b).all()


@pytest.mark.parametrize("k", [0, 3, 10])
@pytest.mark.parametrize("n", [100, 1500])
def test_v3_variant_matches_jnp(k, n):
    """The multi-candidate-per-sublane bit-packed kernel (v3) is
    distance-identical to the jnp reference, including SNP nibbles,
    the seed-cell equality guard, inactive lanes, k=0, and tile
    padding (n not a multiple of 1024)."""
    rng = np.random.default_rng(23 + k)
    N, L = n, 100
    mlen = 6000
    mix = (1 << rng.integers(0, 4, mlen)).astype(np.uint8)
    snp = rng.random(mlen) < 0.05
    mix[snp] |= (1 << rng.integers(0, 4, snp.sum())).astype(np.uint8)
    pos = rng.integers(0, mlen - 130, N).astype(np.int32)
    seq = rng.integers(0, 4, (N, L)).astype(np.int32)
    for i in range(0, N, 2):  # plant half with few errors (subs + indels)
        window = mix[pos[i] : pos[i] + L + 8]
        bases = np.array([(int(v) & -int(v)).bit_length() - 1 for v in window])
        r = list(bases[:L])
        for _ in range(int(rng.integers(0, min(k, 4) + 1))):
            j = int(rng.integers(0, len(r) - 1))
            op = rng.integers(0, 3)
            if op == 0:
                r[j] = (r[j] + 1) % 4
            elif op == 1:
                del r[j]
            else:
                r.insert(j, int(rng.integers(0, 4)))
        r = (r + list(bases[len(r):]))[:L]
        seq[i] = r
    active = rng.random(N) < 0.9
    a = np.asarray(lv_distance_batch(
        jnp.asarray(mix), jnp.asarray(pos), jnp.asarray(active),
        jnp.asarray(seq), k))
    b = np.asarray(lv_distance_batch_pallas(
        jnp.asarray(mix), jnp.asarray(pos), jnp.asarray(active),
        jnp.asarray(seq), k, interpret=True, variant="v3"))
    assert (a == b).all(), np.nonzero(a != b)


def test_v2_variant_matches_v1():
    """The reduction-lean kernel (SALT_TPU_LV_KERNEL=v2) is
    distance-identical to the default formulation."""
    import jax.numpy as jnp

    from salt_tpu.ops.lv_pallas import lv_distance_batch_pallas

    rng = np.random.default_rng(17)
    l_mref = 5000
    mixref = (1 << rng.integers(0, 4, l_mref)).astype(np.uint8)
    N, L, k = 256, 100, 10
    pos = rng.integers(0, l_mref - L - 10, N).astype(np.int32)
    seqs = rng.integers(0, 4, (N, L)).astype(np.int32)
    active = rng.random(N) < 0.9
    a = lv_distance_batch_pallas(jnp.asarray(mixref), jnp.asarray(pos),
                                 jnp.asarray(active), jnp.asarray(seqs), k,
                                 interpret=True, variant="v1")
    b = lv_distance_batch_pallas(jnp.asarray(mixref), jnp.asarray(pos),
                                 jnp.asarray(active), jnp.asarray(seqs), k,
                                 interpret=True, variant="v2")
    assert np.array_equal(np.asarray(a), np.asarray(b))
