"""Loaders for the reference binaries' on-disk index formats.

Test-only helpers: we use the files written by the reference `salt-idx`
as oracles for our own index builder.  Format knowledge from
Align_src/bwtio.c:25-79, bwt.h:57-64, rbwt.c:258-297, lookup.c:47-65,
metaref.c:61-93, Index_src/bwtmisc.c:121-144.
"""

import numpy as np

OCC_INTERVAL = 0x80


def load_c_bwt(path):
    """Returns dict with primary, L2 (len5), seq_len, and the decoded BWT
    string (2-bit codes, sentinel removed => length seq_len)."""
    raw = np.fromfile(path, dtype=np.uint32)
    primary = int(raw[0])
    l2 = np.zeros(5, dtype=np.uint64)
    l2[1:] = raw[1:5]
    seq_len = int(l2[4])
    interleaved = raw[5:]
    # deinterleave: every OCC_INTERVAL symbols -> 4 occ words + 8 bwt words
    n_blocks = (seq_len + OCC_INTERVAL - 1) // OCC_INTERVAL + 1
    words = []
    k = 0
    nsym = 0
    i = 0
    while nsym < seq_len:
        i += 4  # skip occ counts
        # one bwt word holds 16 symbols
        for _ in range(min((seq_len - nsym + 15) // 16, 8)):
            words.append(interleaved[i])
            i += 1
            nsym += 16
            if nsym >= ((nsym - 1) // OCC_INTERVAL + 1) * OCC_INTERVAL:
                break
    # simpler exact decode using the bwt_bwt macro:
    def bwt_word(k):
        return interleaved[k // OCC_INTERVAL * 12 + 4 + k % OCC_INTERVAL // 16]

    syms = np.empty(seq_len, dtype=np.uint8)
    ks = np.arange(seq_len)
    word_idx = ks // OCC_INTERVAL * 12 + 4 + ks % OCC_INTERVAL // 16
    shifts = ((~ks) & 0xF) << 1
    syms = ((interleaved[word_idx] >> shifts) & 3).astype(np.uint8)
    return {"primary": primary, "L2": l2, "seq_len": seq_len, "bwt": syms}


def load_c_sa(path):
    raw = np.fromfile(path, dtype=np.uint32)
    primary = int(raw[0])
    sa_intv = int(raw[5])
    seq_len = int(raw[6])
    n_sa = (seq_len + sa_intv) // sa_intv
    sa = np.empty(n_sa, dtype=np.uint32)
    sa[0] = 0xFFFFFFFF
    sa[1:] = raw[7 : 7 + n_sa - 1]
    return {"primary": primary, "sa_intv": sa_intv, "seq_len": seq_len, "sa": sa}


def load_lkt(path):
    raw = np.fromfile(path, dtype=np.uint32)
    k = int(raw[0])
    return raw[1 : 1 + (1 << (2 * k)) + 1]


def load_mixref(path):
    raw = np.fromfile(path, dtype=np.uint32)
    l = int(raw[0])
    words = raw[1:]
    pos = np.arange(l)
    nib = (words[pos >> 3] >> (4 * (pos % 8))) & 15
    return nib.astype(np.uint8)


def load_r_pac(path):
    """4-bit packed local-pattern text (Index_src/4bit_bntseq.c).
    Layout: 2 chars/byte, high nibble first; trailing byte = l % 2."""
    raw = np.fromfile(path, dtype=np.uint8)
    ct = int(raw[-1])
    body = raw[:-1]
    if ct == 0:
        body = body[:-1] if len(body) * 2 % 2 == 0 and False else body
        # when l%2==0 an extra zero byte was appended before ct
        body = body[:-1]
        l = len(body) * 2
    else:
        l = (len(body) - 1) * 2 + ct
    chars = np.empty(len(body) * 2, dtype=np.uint8)
    chars[0::2] = body >> 4
    chars[1::2] = body & 15
    return chars[:l]


def load_r_bwt(path):
    """R-part bwt file: textLength, inverseSa0, cumFreq[1..5],
    bwtSizeInWord, bwtCode words (8 chars/word, big-endian nibbles)."""
    raw = np.fromfile(path, dtype=np.uint32)
    text_len = int(raw[0])
    inverse_sa0 = int(raw[1])
    cumfreq = np.zeros(6, dtype=np.uint64)
    cumfreq[1:] = raw[2:7]
    size_words = int(raw[7])
    code = raw[8 : 8 + size_words]
    pos = np.arange(text_len)
    shift = (7 - (pos % 8)) * 4
    syms = ((code[pos // 8] >> shift) & 15).astype(np.uint8)
    return {
        "text_len": text_len,
        "inverse_sa0": inverse_sa0,
        "cumfreq": cumfreq,
        "bwt": syms,
    }


def load_r_sa(path):
    raw = np.fromfile(path, dtype=np.uint32)
    n = int(raw[0])
    return raw[1 : 1 + n]
