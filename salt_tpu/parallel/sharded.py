"""Index sharding by reference bin (the GRCh38-scale mode of
SURVEY.md §2.6 / BASELINE.json config 5).

Design: the genome's contigs are partitioned into N shards and a
complete sub-index (BWT/SA/LKT/mixRef over that bin) is built per shard.
The shard arrays are padded to a common size, stacked with a leading
shard axis, and laid out over a device mesh axis `shard` — each device
holds exactly its own bin's tables in HBM.  A read batch is replicated;
under `shard_map` every device runs the full seed/locate/verify step
against its bin, then the per-read best candidates are merged with an
`argmin` collective over the shard axis (psum-style reduction on the
encoded (n_diff, shard) key).

Semantics note: the reference has no multi-index mode; per-seed width
caps (`max_seed`) and per-strand locate caps apply per shard here, so a
sharded run can differ from a monolithic run exactly where the
reference's own caps truncate — by design, never in the common case.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7 name
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..index.build import SaltIndex, build_index_from_data
from ..pipeline.device_index import DeviceIndex, to_device_index
from ..pipeline.se import se_ungapped


def partition_contigs(contig_data: Sequence[Tuple[str, str, str]], n_shards: int):
    """Greedy size-balanced partition of contigs into n_shards bins."""
    order = sorted(range(len(contig_data)), key=lambda i: -len(contig_data[i][2]))
    bins: List[List[int]] = [[] for _ in range(n_shards)]
    sizes = [0] * n_shards
    for i in order:
        j = int(np.argmin(sizes))
        bins[j].append(i)
        sizes[j] += len(contig_data[i][2])
    return [sorted(b) for b in bins]


def partition_contigs_contiguous(lengths: Sequence[int], n_shards: int):
    """Size-balanced partition into CONTIGUOUS contig runs (bins in
    global order).  Contiguity makes shard-local -> global coordinate
    lifting a single per-shard base offset (global = local + base),
    which the full sharded aligner (sharded_engine.py) relies on."""
    if n_shards > len(lengths):
        raise ValueError(
            f"cannot split {len(lengths)} contigs into {n_shards} "
            "contiguous shards; reduce --shards"
        )
    total = sum(lengths)
    target = total / n_shards
    bins: List[List[int]] = []
    cur: List[int] = []
    acc = 0
    for i, L in enumerate(lengths):
        cur.append(i)
        acc += L
        bins_left = n_shards - len(bins)       # incl. the current one
        contigs_left = len(lengths) - i - 1
        # cut when the running bin reached its share, or when every
        # remaining contig is needed to fill the remaining bins
        must_cut = bins_left > 1 and contigs_left == bins_left - 1
        want_cut = bins_left > 1 and acc >= target
        if must_cut or want_cut:
            bins.append(cur)
            cur = []
            acc = 0
    bins.append(cur)
    return bins


def build_sharded_indexes(contig_data, blocks, n_shards, l_seed=19):
    """One SaltIndex per shard.  SNP blocks are matched to contigs by
    position in the (global) contig order, as the monolithic build does."""
    bins = partition_contigs(contig_data, n_shards)
    shard_indexes = []
    for b in bins:
        cd = [contig_data[i] for i in b]
        bl = [blocks[i] if i < len(blocks) else None for i in b]
        bl = [x for x in bl if x is not None]
        shard_indexes.append(build_index_from_data(cd, bl, l_seed=l_seed))
    return shard_indexes, bins


def _pad_to(arr: np.ndarray, n: int):
    out = np.zeros((n,) + arr.shape[1:], dtype=arr.dtype)
    out[: len(arr)] = arr
    return out


@dataclass
class StackedIndex:
    """Shard-stacked DeviceIndex arrays (leading axis = shard)."""

    tree: DeviceIndex        # every array has a leading shard axis
    base_offsets: np.ndarray  # global genome offset of each shard's bin


def _stack_sa_cat(dixes):
    """Stack per-shard fused SA tables: each shard's csa part is padded
    to the max c_sa_len so the R offset is a single static constant."""
    cl = max(d.c_sa_len for d in dixes)
    parts = []
    for d in dixes:
        a = np.asarray(d.sa_cat)
        c = _pad_to(a[: d.c_sa_len], cl)
        parts.append(np.concatenate([c, a[d.c_sa_len :]]))
    n = max(p.shape[0] for p in parts)
    return jnp.asarray(np.stack([_pad_to(p, n) for p in parts]))


def stack_indexes(shard_indexes: List[SaltIndex], bins, contig_data=None,
                  contig_lengths=None) -> StackedIndex:
    dixes = [to_device_index(ix) for ix in shard_indexes]
    # global offset of each shard's first contig, for coordinate lifting
    if contig_lengths is None:
        contig_lengths = [len(c[2]) for c in contig_data]
    glob_off = np.cumsum([0] + list(contig_lengths))[:-1]
    base = np.array(
        [glob_off[b[0]] if b else 0 for b in bins], dtype=np.uint32
    )

    def stack(getter):
        arrs = [np.asarray(getter(d)) for d in dixes]
        n = max(a.shape[0] for a in arrs)
        return jnp.asarray(np.stack([_pad_to(a, n) for a in arrs]))

    t0 = dixes[0]
    from ..ops.rank import RankIndex

    def stack_rank(g):
        rs = [g(d) for d in dixes]
        # per-shard indexes may share one fused C+R plane array
        # (RankIndex.row_off); slice this family's own rows out of it
        # (n_sym = len(cfreq) - 1: the padding slot is not a plane)
        bc = [
            np.asarray(r.bc)[
                r.row_off : r.row_off + (r.cfreq.shape[0] - 1) * r.n_words
            ]
            for r in rs
        ]
        W = max(r.n_words for r in rs)
        bc_resh = []
        for r, b in zip(rs, bc):
            b2 = b.reshape(-1, r.n_words, 2)
            b2 = np.concatenate(
                [b2, np.repeat(b2[:, -1:, :], W - r.n_words, axis=1)], axis=1
            ) if r.n_words < W else b2
            bc_resh.append(b2.reshape(-1, 2))
        n = max(x.shape[0] for x in bc_resh)
        stacked = jnp.asarray(np.stack([_pad_to(x, n) for x in bc_resh]))
        cfreq = jnp.asarray(np.stack([np.asarray(r.cfreq) for r in rs]))
        ns = max(r.n for r in rs)
        return stacked, cfreq, ns, W

    cbc, ccf, cn, cW = stack_rank(lambda d: d.ri_c)
    rbc, rcf, rn, rW = stack_rank(lambda d: d.ri_r)
    tree = DeviceIndex(
        ri_c=RankIndex(bc=cbc, cfreq=ccf, n=cn, n_words=cW),
        ri_r=RankIndex(bc=rbc, cfreq=rcf, n=rn, n_words=rW),
        lkt=stack(lambda d: d.lkt),
        r_lkt_sp=stack(lambda d: d.r_lkt_sp),
        r_lkt_ep=stack(lambda d: d.r_lkt_ep),
        sa_cat=_stack_sa_cat(dixes),
        mixref_words=stack(lambda d: d.mixref_words),
        l_pac=max(d.l_pac for d in dixes),
        l_seed=dixes[0].l_seed,
        c_sa_len=max(d.c_sa_len for d in dixes),
    )
    return StackedIndex(tree=tree, base_offsets=base)


def _per_shard_n(shard_indexes):
    return [ix.l_pac for ix in shard_indexes]


def sharded_se_step(
    mesh: Mesh,
    stacked: StackedIndex,
    shard_l_pac: jnp.ndarray,   # int32 (n_shards,) true l_pac per shard
    seq_f: jnp.ndarray,         # (B, L) replicated
    seq_r: jnp.ndarray,
    *,
    l_overlap: int,
    max_seed: int,
    max_locate: int,
    cap: int,
    u: int = 64,
    k_hits: int = 16,
    return_hits: bool = False,
):
    """Runs the ungapped SE step on every shard and argmin-merges the
    per-read primaries over the `shard` mesh axis.

    Returns (found, global_pos (uint32), strand, n_diff, shard_id) per
    read — coordinates lifted into the global genome via base_offsets.
    With `return_hits=True` additionally returns the raw per-shard hit
    lists (hits_pos uint32 (n_shards,B,2,K) global coords, hits_ndiff,
    n_hits) for an exact cross-shard XA merge via
    `merge_sharded_hits` below.

    NOTE: the stacked tables are padded to the largest shard, so each
    shard's step masks candidates beyond its true l_pac.
    """
    n_shards = mesh.devices.size
    base = jnp.asarray(stacked.base_offsets)

    shard_spec = P("shard")
    rep = P()

    def step(tree, base_off, l_pac_true, sf, sr):
        # tree/base_off/l_pac arrive with the leading shard axis sliced off
        tree = jax.tree_util.tree_map(lambda a: a[0], tree)
        base_off = base_off[0]
        l_pac_true = l_pac_true[0]
        out = se_ungapped(
            tree, sf, sr,
            l_overlap=l_overlap, max_seed=max_seed, max_locate=max_locate,
            cap=cap, u=u, k_hits=k_hits,
        )
        res = out.res
        # mask candidates that fall into the padded tail
        ok = res.found & (res.pos < l_pac_true.astype(jnp.uint32))
        nd = jnp.where(ok, res.n_diff, 255)
        my = jax.lax.axis_index("shard").astype(jnp.int32)
        # encode (n_diff, shard) so the all-shard min picks the lowest
        # n_diff, ties to the lowest shard id
        key = nd * 1024 + my
        best_key = jax.lax.pmin(key, axis_name="shard")
        win = best_key == key  # unique winner: key embeds the shard id
        gpos = jnp.where(ok, res.pos + base_off, jnp.uint32(0xFFFFFFFF))
        # winner broadcast: psum of the winner's value (losers contribute 0)
        pos_sel = jax.lax.psum(
            jnp.where(win, gpos, jnp.uint32(0)).astype(jnp.int32),
            axis_name="shard",
        )  # int32 bit-pattern of the winning uint32 position
        strand_sel = jax.lax.psum(
            jnp.where(win, res.strand, 0), axis_name="shard"
        )
        nd_best = best_key // 1024
        found_any = nd_best < 255
        shard_sel = best_key % 1024
        prim = (
            found_any[None], pos_sel[None], strand_sel[None], nd_best[None],
            shard_sel[None],
        )
        if not return_hits:
            return prim
        # raw per-shard hit lists lifted into global coordinates; hits in
        # the padded tail are masked out so the host merge never sees them
        hok = (res.hits_pos < l_pac_true.astype(jnp.uint32)) & (
            res.hits_ndiff < 255
        )
        hpos = jnp.where(
            hok, res.hits_pos + base_off, jnp.uint32(0xFFFFFFFF)
        )
        hnd = jnp.where(hok, res.hits_ndiff, 255)
        nh = jnp.sum(hok, axis=-1, dtype=jnp.int32)
        # flag reads whose per-shard survivor list was truncated at K
        # (then the merged replay can miss survivors — caller re-runs wide)
        trunc = jnp.any(res.n_hits > res.hits_pos.shape[-1], axis=-1)
        return prim + (hpos[None], hnd[None], nh[None], trunc[None])

    n_out = 9 if return_hits else 5
    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: shard_spec, stacked.tree),
            shard_spec, shard_spec, rep, rep,
        ),
        out_specs=(shard_spec,) * n_out,
        check_vma=False,
    )
    tree_sharded = jax.tree_util.tree_map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(*(["shard"] + [None] * (a.ndim - 1))))
        ),
        stacked.tree,
    )
    base_s = jax.device_put(base, NamedSharding(mesh, P("shard")))
    lpac_s = jax.device_put(shard_l_pac, NamedSharding(mesh, P("shard")))
    seqf_r = jax.device_put(seq_f, NamedSharding(mesh, P()))
    seqr_r = jax.device_put(seq_r, NamedSharding(mesh, P()))
    out = fn(tree_sharded, base_s, lpac_s, seqf_r, seqr_r)
    found, pos, strand, nd, shard = out[:5]
    # every shard now holds the merged result; take shard 0's copy
    pos_u32 = np.asarray(pos)[0].view(np.uint32).astype(np.int64)
    prim = (
        np.asarray(found)[0], pos_u32,
        np.asarray(strand)[0], np.asarray(nd)[0], np.asarray(shard)[0],
    )
    if not return_hits:
        return prim
    hpos, hnd, nh, trunc = (np.asarray(a) for a in out[5:])
    return prim + (hpos, hnd, nh, trunc)


def merge_sharded_hits(hpos, hnd, max_diff0: int, k_hits: int):
    """Exact cross-shard merge of per-shard SE hit lists.

    Each shard's threshold replay (ops/verify.py replay_and_select,
    mirroring alnse.c:348-393) uses shard-local running minima, which are
    >= the global running minima — so every monolithic survivor survives
    in its own shard, and re-running the replay over the union (sorted by
    global position per strand, strand 0 first) reproduces the monolithic
    hit lists exactly, provided no shard truncated its list at K.

    hpos: uint32 (n_shards, B, 2, K) global coords (0xFFFFFFFF = empty)
    hnd:  int32  (n_shards, B, 2, K)
    Returns dict(found, pos, strand, n_diff, hits_pos (B,2,k_hits),
    hits_ndiff, n_hits (B,2), first_hit_ndiff (B,2)) in numpy.
    """
    S, B, _, K = hpos.shape
    BIG = 255
    # (B, 2, S*K) candidate pool per strand, position-sorted
    cp = np.moveaxis(hpos, 0, 2).reshape(B, 2, S * K).astype(np.uint64)
    cn = np.moveaxis(hnd, 0, 2).reshape(B, 2, S * K)
    order = np.argsort(cp, axis=-1, kind="stable")
    cp = np.take_along_axis(cp, order, axis=-1)
    cn = np.take_along_axis(cn, order, axis=-1)
    valid = cp != 0xFFFFFFFF
    cnt = np.where(valid, cn, BIG)
    # strand-0-then-strand-1 sequential threshold replay
    flat_c = cnt.reshape(B, 2 * S * K)
    run = np.minimum.accumulate(flat_c, axis=-1)
    excl = np.concatenate(
        [np.full((B, 1), BIG, dtype=run.dtype), run[:, :-1]], axis=-1
    )
    thr = np.minimum(max_diff0, excl)
    hit = (flat_c <= thr).reshape(B, 2, S * K) & valid

    hits_pos = np.full((B, 2, k_hits), 0xFFFFFFFF, dtype=np.uint32)
    hits_ndiff = np.full((B, 2, k_hits), BIG, dtype=np.int32)
    n_hits = hit.sum(axis=-1).astype(np.int32)
    first_hit_ndiff = np.full((B, 2), BIG, dtype=np.int32)
    for s in range(2):
        hrow = hit[:, s]
        sel = np.argsort(~hrow, axis=-1, kind="stable")[:, :k_hits]
        got = np.take_along_axis(hrow, sel, axis=-1)
        hits_pos[:, s] = np.where(
            got, np.take_along_axis(cp[:, s], sel, axis=-1), 0xFFFFFFFF
        ).astype(np.uint32)
        hits_ndiff[:, s] = np.where(
            got, np.take_along_axis(cn[:, s], sel, axis=-1), BIG
        )
        any_s = hrow.any(axis=-1)
        first = np.argmax(hrow, axis=-1)
        first_hit_ndiff[:, s] = np.where(
            any_s, np.take_along_axis(cnt[:, s], first[:, None], axis=-1)[:, 0],
            BIG,
        )
    # primary selection (replay_and_select semantics: strand 1's first
    # hit displaces an equal strand-0 best).  The min is taken over ALL
    # survivors (the compacted k_hits list may truncate before the min).
    val = np.min(np.where(hit, cnt, BIG), axis=-1)
    use1 = n_hits[:, 1] > 0
    found = (n_hits.sum(axis=-1) > 0)
    strand = np.where(use1, 1, 0)
    n_diff = np.where(use1, val[:, 1], val[:, 0])

    def best_pos(s):
        sel_min = hit[:, s] & (cnt[:, s] == val[:, s][:, None])
        i = np.argmax(sel_min, axis=-1)
        return np.take_along_axis(cp[:, s], i[:, None], axis=-1)[:, 0].astype(
            np.uint32
        )

    pos = np.where(use1, best_pos(1), best_pos(0))
    pos = np.where(found, pos, np.uint32(0xFFFFFFFF))
    return {
        "found": found, "pos": pos, "strand": strand,
        "n_diff": np.where(found, n_diff, BIG),
        "hits_pos": hits_pos, "hits_ndiff": hits_ndiff,
        "n_hits": n_hits, "first_hit_ndiff": first_hit_ndiff,
    }
