"""Fuzz the striped Smith-Waterman emulation against the compiled
reference ssw.c (gcc -shared -msse2, see tools/make_oracle.sh)."""

import ctypes
import os

import numpy as np
import pytest

from salt_tpu.ops.ssw import SCORE_MAT5, SCORE_MAT16, ssw_align

LIB = "/tmp/oracle/libsswref.so"
requires_lib = pytest.mark.skipif(
    not os.path.exists(LIB), reason="reference ssw shared library missing"
)


class _SAlign(ctypes.Structure):
    _fields_ = [
        ("score1", ctypes.c_uint16),
        ("score2", ctypes.c_uint16),
        ("ref_begin1", ctypes.c_int32),
        ("ref_end1", ctypes.c_int32),
        ("read_begin1", ctypes.c_int32),
        ("read_end1", ctypes.c_int32),
        ("ref_end2", ctypes.c_int32),
        ("cigar", ctypes.POINTER(ctypes.c_uint32)),
        ("cigarLen", ctypes.c_int32),
    ]


@pytest.fixture(scope="module")
def lib():
    l = ctypes.CDLL(LIB)
    l.ssw_init.restype = ctypes.c_void_p
    l.ssw_init.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int8,
    ]
    l.ssw_align.restype = ctypes.POINTER(_SAlign)
    l.ssw_align.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_uint8,
        ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint16, ctypes.c_int32,
        ctypes.c_int32,
    ]
    return l


def _ref_align(lib, read, ref, mat, gapO, gapE, maskLen):
    n = mat.shape[0]
    prof = lib.ssw_init(read.astype(np.int8).tobytes(), len(read),
                        mat.astype(np.int8).tobytes(), n, 2)
    r = lib.ssw_align(prof, ref.astype(np.int8).tobytes(), len(ref),
                      gapO, gapE, 2, 0, 0, maskLen)
    a = r.contents
    cig = [(a.cigar[i] >> 4, "MID"[a.cigar[i] & 0xF]) for i in range(a.cigarLen)]
    out = dict(score1=a.score1, score2=a.score2, ref_begin1=a.ref_begin1,
               ref_end1=a.ref_end1, read_begin1=a.read_begin1,
               read_end1=a.read_end1, ref_end2=a.ref_end2, cigar=cig)
    return out


def _case(rng, snp_aware, ref_len=300, read_len=100):
    refb = rng.integers(0, 4, ref_len)
    start = int(rng.integers(0, ref_len - read_len))
    read = refb[start : start + read_len].copy()
    # mutations + indels
    for _ in range(int(rng.integers(0, 8))):
        p = int(rng.integers(0, read_len))
        read[p] = rng.integers(0, 4)
    if rng.random() < 0.5:
        p = int(rng.integers(5, read_len - 5))
        if rng.random() < 0.5:
            read = np.concatenate([read[:p], [rng.integers(0, 4)], read[p:-1]])
        else:
            read = np.concatenate([read[:p], read[p + 1 :], [rng.integers(0, 4)]])
    if snp_aware:
        ref = (1 << refb).astype(np.int8)
        snp = rng.random(ref_len) < 0.05
        ref[snp] |= (1 << rng.integers(0, 4, snp.sum())).astype(np.int8)
        readc = (1 << read).astype(np.int8)
        return readc, ref, SCORE_MAT16
    return read.astype(np.int8), refb.astype(np.int8), SCORE_MAT5


@requires_lib
@pytest.mark.parametrize("snp_aware", [True, False])
def test_ssw_fuzz(lib, snp_aware):
    rng = np.random.default_rng(11 if snp_aware else 12)
    for trial in range(40):
        read, ref, mat = _case(rng, snp_aware)
        want = _ref_align(lib, read, ref, mat, 3, 1, len(read) // 2)
        got = ssw_align(read, ref, mat, 3, 1, len(read) // 2)
        assert got.score1 == want["score1"], trial
        assert got.score2 == want["score2"], trial
        assert got.ref_begin1 == want["ref_begin1"], trial
        assert got.ref_end1 == want["ref_end1"], trial
        assert got.read_begin1 == want["read_begin1"], trial
        assert got.read_end1 == want["read_end1"], trial
        assert got.cigar == want["cigar"], (trial, got.cigar, want["cigar"])


def test_native_matches_python_emulation():
    """tools/ssw_native.cpp vs the numpy lane emulation on random inputs."""
    import numpy as np

    from salt_tpu.ops.lv import NT2BIT_NP
    from salt_tpu.ops.ssw import ssw_align_native, ssw_align_py

    if ssw_align_native(
        np.zeros(4, np.int8), np.zeros(8, np.int8), SCORE_MAT5, 3, 1, 2
    ) is None:
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(11)
    for trial in range(20):
        refLen = int(rng.integers(40, 500))
        readLen = int(rng.integers(20, 101))
        if trial % 2 == 0:
            mat = SCORE_MAT5
            ref = rng.integers(0, 4, refLen).astype(np.int8)
            read = rng.integers(0, 4, readLen).astype(np.int8)
            start = int(rng.integers(0, refLen - min(readLen, refLen) + 1))
            emb = min(readLen, refLen - start)
            ref[start : start + emb] = read[:emb]
        else:
            mat = SCORE_MAT16
            ref = (1 << rng.integers(0, 4, refLen)).astype(np.int8)
            read = NT2BIT_NP[rng.integers(0, 4, readLen)].astype(np.int8)
        a = ssw_align_py(read, ref, mat, 3, 1, readLen // 2)
        b = ssw_align_native(read, ref, mat, 3, 1, readLen // 2)
        for f in ("score1", "score2", "ref_begin1", "ref_end1",
                  "read_begin1", "read_end1", "ref_end2", "cigar"):
            assert getattr(a, f) == getattr(b, f), (trial, f)
