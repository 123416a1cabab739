"""Landau-Vishkin banded edit distance, SNP-aware.

Device side: batched distance computation replicating
Align_src/LandauVishkin.c:19-122 `computeEditDistance` semantics:

  * match(i, j)  = (read_onehot[i] & mixref_nibble[j]) != 0
  * phase 1 run from (0,0) uses AND-matching directly;
  * an (e, d) cell only extends its run when the first byte pair is
    EQUAL (LandauVishkin.c:79 `if (*p == *t)`), then the run continues
    while bytes AND-nonzero — an asymmetry we reproduce;
  * reaches are capped at endl = min(patternLen, textLen - d);
  * result is the smallest e <= k with reach == patternLen, else -1.

Host side: `lv_cigar` replicates computeEditDistanceWithCigar
(LandauVishkin.c:176-470) including its different d order
(0, -1, 1, -2, 2 ...) and backtrace, producing identical CIGAR strings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GAP_WINDOW_PAD, LV_MAX_K

NT2BIT_NP = np.array([1, 2, 4, 8, 15], dtype=np.uint8)


def lv_distance_batch(
    mixref: jnp.ndarray,   # uint8 [l_mref]
    pos: jnp.ndarray,      # int32 (N,) candidate start positions (in range)
    active: jnp.ndarray,   # bool  (N,)
    seq: jnp.ndarray,      # (N, L) read codes for the right strand
    k: int,
    window_pad: int = GAP_WINDOW_PAD,
    pat_precoded: bool = False,
    text_words: bool = False,
) -> jnp.ndarray:
    """Edit distances (int32); inactive or unalignable -> BIG (255).

    Text window length is L + window_pad (the aligner's gapped check
    uses GAP_WINDOW_PAD, ed_diff editdistance.c:373; polish scores
    windows of exactly the read length, window_pad=0).  With
    `pat_precoded` the rows of `seq` are already AND-match codes
    (e.g. polish's equality bit encoding) instead of 0..4 base codes.
    With `text_words` the reference arrives as 4-bit-packed uint32
    words (device_index.pack_nibbles) — halves the HBM residency of
    the reference text vs a byte array.
    """
    N, L = seq.shape
    TL = L + window_pad
    BIG = jnp.int32(255)
    k = min(LV_MAX_K - 1, k)
    D = 2 * k + 1  # diagonals -k..k

    base = jnp.where(active, pos, 0)
    # positions may exceed 2^31 (whole-genome mixRef): do the word
    # shift/mask through uint32, word index fits int32 again
    tidx = (base[:, None].astype(jnp.uint32)
            + jnp.arange(TL, dtype=jnp.uint32))
    if text_words:
        widx = jnp.clip((tidx >> 3).astype(jnp.int32), 0,
                        mixref.shape[0] - 1)
        w = mixref[widx].astype(jnp.uint32)
        text = ((w >> ((tidx & 7) * 4)) & 15).astype(
            jnp.uint8)
    else:
        tidx = jnp.clip(tidx.astype(jnp.int32), 0, mixref.shape[0] - 1)
        text = mixref[tidx]                               # (N, TL) nibbles
    if pat_precoded:
        pat = seq.astype(jnp.uint8)
    else:
        pat = jnp.array(NT2BIT_NP)[jnp.clip(seq, 0, 4)]   # (N, L) one-hot

    # padded views: pattern index 0..L (P[L] = 0), text index 0..TL+2k
    patp = jnp.pad(pat, ((0, 0), (0, 1)))                 # (N, L+1)
    textp = jnp.pad(text, ((0, 0), (0, 2 * k + 1)))       # (N, TL+2k+1)

    # per-diagonal AND-match matrix m[:, d, i] = AND(P[i], T[i+d]) != 0,
    # i in [0, L]; diagonal index dd = d + k
    ii = jnp.arange(L + 1, dtype=jnp.int32)
    dd = jnp.arange(D, dtype=jnp.int32) - k               # (D,)
    tix = jnp.clip(ii[None, :] + dd[:, None], 0, TL + 2 * k)  # (D, L+1)
    tmat = textp[:, tix]                                  # (N, D, L+1)
    m = (patp[:, None, :] & tmat) != 0                    # (N, D, L+1)

    endl = jnp.minimum(L, TL - dd)                        # (D,)

    def first_and_zero(r):
        """first i >= r with m False, per (N, D); r (N, D) in [0, L]."""
        cand = (~m) & (ii[None, None, :] >= r[..., None])
        has = jnp.any(cand, axis=-1)
        idx = jnp.argmax(cand, axis=-1).astype(jnp.int32)
        return jnp.where(has, idx, L + 1)

    # phase 1: run from 0 on diagonal 0, capped at endl = L
    r0 = jnp.zeros((N, D), dtype=jnp.int32)
    run0 = jnp.minimum(first_and_zero(r0)[:, k], L)       # (N,)
    done0 = run0 >= L
    NEG = jnp.int32(-2)
    Lrow = jnp.full((N, D), NEG)
    Lrow = Lrow.at[:, k].set(run0)

    result = jnp.where(done0, jnp.int32(0), BIG)

    def body(e, state):
        Lprev, result = state
        up = Lprev + 1
        left = jnp.concatenate([jnp.full((N, 1), NEG), Lprev[:, :-1]], axis=1)
        right = jnp.concatenate([Lprev[:, 1:] + 1, jnp.full((N, 1), NEG)], axis=1)
        best = jnp.maximum(jnp.maximum(up, left), right)
        in_band = (jnp.abs(dd) <= e)[None, :]
        bestc = jnp.clip(best, 0, L)
        # equality guard at (best, best+d) (LandauVishkin.c:79)
        pb = jnp.take_along_axis(patp, bestc, axis=1)             # (N, D)
        tb = jnp.take_along_axis(tmat, bestc[..., None], axis=-1)[..., 0]
        can_ext = (pb == tb) & (best >= 0)
        run = jnp.minimum(first_and_zero(bestc), endl[None, :])
        reach = jnp.where(can_ext, run, best)
        newL = jnp.where(in_band, reach, NEG)
        hit = in_band & (newL >= L)
        result = jnp.where(
            jnp.any(hit, axis=-1) & (result == BIG), jnp.int32(e), result
        )
        return newL, result

    Lrow, result = jax.lax.fori_loop(1, k + 1, body, (Lrow, result))
    return jnp.where(active, result, BIG)


# ---------------- host-side exact reimplementation (cigar) ----------------


def _run_match(p: np.ndarray, t: np.ndarray, start: int, endl: int) -> int:
    """8-byte-group run matching of LandauVishkin.c:41-57 from `start`;
    returns the capped reach.  p/t are zero-padded byte arrays."""
    i = start
    # group loop: process in chunks of 8 starting at `start`
    while True:
        g_p = p[i : i + 8]
        g_t = t[i : i + 8]
        if len(g_p) < 8:
            g_p = np.pad(g_p, (0, 8 - len(g_p)))
        if len(g_t) < 8:
            g_t = np.pad(g_t, (0, 8 - len(g_t)))
        if not np.array_equal(g_p, g_t):
            a = (g_p & g_t) != 0
            z = 0
            while z < 8 and a[z]:
                z += 1
            if z < 8:
                return min(i + z, endl)
            i += 8
            continue
        i += 8
        if i >= endl:
            return endl


_LPAD = 64  # stand-in for the bytes before the C buffers (read but never
            # matching: a one-hot pattern byte is nonzero, pad is zero)


def lv_distance_host(text: np.ndarray, pattern: np.ndarray, k: int) -> int:
    """Reference-exact computeEditDistance on byte arrays (one-hot codes)."""
    k = min(LV_MAX_K - 1, k)
    tl, pl = len(text), len(pattern)
    endl = min(pl, tl)
    tpad = np.pad(text.astype(np.uint8), (_LPAD, 64))
    ppad = np.pad(pattern.astype(np.uint8), (0, 64))
    L = {}
    L[(0, 0)] = _run_match(ppad, tpad[_LPAD:], 0, endl)
    if L[(0, 0)] == endl:
        return pl - endl if pl > endl else 0
    for e in range(1, k + 1):
        d = 0
        while d != e + 1:
            up = L.get((e - 1, d), -2) + 1
            left = L.get((e - 1, d - 1), -2)
            right = L.get((e - 1, d + 1), -2) + 1
            best = max(up, left, right)
            if best >= 0 and ppad[best] == tpad[_LPAD + d + best]:
                endl_d = min(pl, tl - d)
                best = _run_match(ppad, tpad[_LPAD + d :], best, endl_d)
            if best == pl:
                return e
            L[(e, d)] = best
            d = -d if d > 0 else -d + 1
    return -1


def lv_cigar_host(text: np.ndarray, pattern: np.ndarray, k: int,
                  straight_shortcut: bool = False):
    """Reference-exact computeEditDistanceWithCigar (useM=1, compact).
    Returns (e, cigar_string) or (-1, "").

    straight_shortcut enables the `straightMismatches` fast path that is
    live in the polish tool's LV (Polish_src/lv.c:279-300) but commented
    out in the aligner's (Align_src/LandauVishkin.c:296-351): when e
    equals the no-indel mismatch count, emit plain '<len>M'."""
    tl, pl = len(text), len(pattern)
    endl = min(pl, tl)
    tpad = np.pad(text.astype(np.uint8), (_LPAD, 64))
    ppad = np.pad(pattern.astype(np.uint8), (0, 64))
    L = {}
    A = {}
    L[(0, 0)] = _run_match(ppad, tpad[_LPAD:], 0, endl)
    if L[(0, 0)] == endl:
        return 0, f"{pl}M"
    for e in range(1, k + 1):
        d = 0
        while d != -(e + 1):
            up = L.get((e - 1, d), -2) + 1
            act = "X"
            best = up
            left = L.get((e - 1, d - 1), -2)
            if left > best:
                best = left
                act = "D"
            right = L.get((e - 1, d + 1), -2) + 1
            if right > best:
                best = right
                act = "I"
            A[(e, d)] = act
            if best >= 0 and ppad[best] == tpad[_LPAD + d + best]:
                endl_d = min(pl, tl - d)
                best = _run_match(ppad, tpad[_LPAD + d :], best, endl_d)
            L[(e, d)] = best
            if best == pl:
                if straight_shortcut:
                    endl0 = min(pl, tl)
                    sm = int(
                        ((ppad[:endl0] & tpad[_LPAD : _LPAD + endl0]) == 0).sum()
                    ) + (pl - endl0)
                    if sm == e:
                        return e, f"{pl}M"
                # backtrace (LandauVishkin.c:380-460, useM path)
                bt_action = {}
                bt_matched = {}
                cur_d = d
                for cur_e in range(e, 0, -1):
                    a = A[(cur_e, cur_d)]
                    bt_action[cur_e] = a
                    if a == "I":
                        nd = cur_d + 1
                        bt_matched[cur_e] = L[(cur_e, cur_d)] - L[(cur_e - 1, nd)] - 1
                    elif a == "D":
                        nd = cur_d - 1
                        bt_matched[cur_e] = L[(cur_e, cur_d)] - L[(cur_e - 1, nd)]
                    else:
                        nd = cur_d
                        bt_matched[cur_e] = L[(cur_e, cur_d)] - L[(cur_e - 1, nd)] - 1
                    cur_d = nd
                out = []
                acc = L[(0, 0)]

                def emit(count, code):
                    if count > 0:
                        out.append(f"{count}{code}")

                ce = 1
                while ce <= e:
                    action = bt_action[ce]
                    count = 1
                    while ce + 1 <= e and bt_matched[ce] == 0 and bt_action[ce + 1] == action:
                        count += 1
                        ce += 1
                    if action in ("=", "X"):
                        acc += count
                    else:
                        if acc != 0:
                            emit(acc, "M")
                            acc = 0
                        emit(count, action)
                    if bt_matched[ce] > 0:
                        acc += bt_matched[ce]
                    ce += 1
                if acc != 0:
                    emit(acc, "M")
                return e, "".join(out)
            d = -(d + 1) if d >= 0 else -d
    return -1, ""
