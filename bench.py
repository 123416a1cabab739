"""Benchmark: single-chip SE alignment throughput on the bundled test
genome (BASELINE.md config 1 style).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference `salt` binary aligns this fixture at ~2477
reads/s on one CPU thread (measured: 20k reads in 8.08s, single thread,
`-d -r 1 -l 100 -n 20 -c -m 500 -t 1`; see tools/make_oracle.sh).
"""

import json
import os
import sys
import time

# Compiles go through the axon relay (PALLAS_AXON_REMOTE_COMPILE=1, the
# driver default): the relay terminal's libtpu is a different build than
# the local AOT one, so locally-compiled executables are REJECTED at
# execution ("libtpu version mismatch").  Remote compiles are slow
# (minutes per big program) but land in the persistent XLA cache
# (~/.cache/salt_tpu/xla), so a pre-warmed cache makes reruns fast.
# Two safety nets for the driver's timeout budget:
#   * every measured chunk updates a best-so-far rate;
#   * a watchdog prints the best-so-far JSON line and exits rc=0 at
#     SALT_TPU_BENCH_BUDGET seconds (default 460) if main hasn't.

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import threading

_BUDGET = float(os.environ.get("SALT_TPU_BENCH_BUDGET", "460"))
_T0 = time.time()
_BEST = {"rate": 0.0, "pe": None, "printed": False,
         "lock": threading.Lock()}


def _emit(rate, aborted=False):
    rec = {
        "metric": "se_reads_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "reads/s",
        "vs_baseline": round(rate / BASELINE_READS_PER_SEC, 3),
    }
    if _BEST["pe"] is not None:
        # secondary metric rides along (the driver's contract is the
        # SE line; extra keys are informational)
        rec["pe_pairs_per_sec"] = round(_BEST["pe"], 1)
    if _BEST.get("scale") is not None:
        # chr21-scale SNP-aware measurement on a REPEAT-RICH synthetic
        # genome (salt_tpu.sim.genome_gen: SINE/LINE families,
        # satellite arrays, segdups, N runs) — the honest at-scale
        # number, measured budget permitting
        rec["scale45mb_repeat_se_reads_per_sec"] = round(_BEST["scale"], 1)
    if aborted:
        # mark partial/failed runs so the driver's parsed JSON can tell
        # a best-so-far emission from a clean measurement
        rec["aborted"] = True
    print(json.dumps(rec), flush=True)


def _finish(rate, aborted=False):
    with _BEST["lock"]:
        if _BEST["printed"]:
            return
        _BEST["printed"] = True
    _emit(rate, aborted=aborted)


def _watchdog():
    while True:
        left = _BUDGET - (time.time() - _T0)
        if left <= 0:
            break
        time.sleep(min(left, 5.0))
    with _BEST["lock"]:
        if _BEST["printed"]:
            return
        _BEST["printed"] = True
    sys.stderr.write(
        f"[bench] watchdog: budget {_BUDGET:.0f}s exceeded, emitting "
        f"best-so-far ({_BEST['rate']:.1f} reads/s)\n")
    try:
        import faulthandler

        faulthandler.dump_traceback(file=sys.stderr)  # where were we stuck?
    except Exception:
        pass
    _emit(_BEST["rate"], aborted=_BEST["rate"] == 0.0)
    sys.stderr.flush()
    sys.stdout.flush()
    os._exit(0)

import numpy as np

BASELINE_READS_PER_SEC = 2477.0
GENOME = "/root/reference/Test/Genome/Genome.fa"
READ_LEN = 100
N_READS = 24576
# 8192 measured 12.5k reads/s vs 10.2k at 4096 on the chip (round 4):
# per-batch relay RPC latency amortizes over more reads
BATCH = int(os.environ.get("SALT_TPU_BENCH_BATCH", "8192"))


def make_fixture():
    """Simulate SNP table + reads from the bundled genome (fixed seed)."""
    from salt_tpu.io.fasta import read_records
    from salt_tpu.io.snp import SnpBlock

    recs = list(read_records(GENOME))
    contigs = [(r.name, r.comment or "(null)", r.seq) for r in recs]
    rng = np.random.default_rng(42)
    bases = "ACGT"
    blocks = []
    mutated = []
    for name, _, seq in contigs:
        L = len(seq)
        n_snp = int(L * 0.05)
        pos = np.sort(rng.choice(np.arange(L), size=n_snp, replace=False))
        stype = []
        mseq = list(seq)
        keep_pos = []
        for p in pos:
            c = seq[p].upper()
            if c not in bases:
                continue
            ref = bases.index(c)
            alt = (ref + int(rng.integers(1, 4))) % 4
            stype.append((1 << ref) | (1 << alt) | (ref << 4))
            mseq[p] = bases[alt]
            keep_pos.append(p)
        blocks.append(
            SnpBlock(name, np.array(keep_pos, np.uint32), np.array(stype, np.uint8))
        )
        mutated.append("".join(mseq))
    # paired sampling like wgsim: reads from the mutated haplotype
    reads = []
    for _ in range(N_READS):
        ci = int(rng.integers(0, len(mutated)))
        hap = mutated[ci]
        start = int(rng.integers(0, len(hap) - READ_LEN))
        reads.append(hap[start : start + READ_LEN])
    return contigs, blocks, reads


def make_pe_fixture(contigs, blocks, n_pairs, isize=450, sd=30):
    """PE read pairs (FR orientation) from the SNP haplotypes."""
    rng = np.random.default_rng(1234)
    bases = "ACGT"
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    haps = []
    for (name, _, seq), blk in zip(contigs, blocks):
        h = list(seq.upper())
        for p, st in zip(blk.pos, blk.stype):
            alts = [b for b in range(4) if (st & (1 << b)) and b != (st >> 4)]
            if alts:
                h[p] = bases[alts[0]]
        haps.append("".join(h))
    r1, r2 = [], []
    for _ in range(n_pairs):
        ci = int(rng.integers(0, len(haps)))
        hap = haps[ci]
        tl = int(np.clip(rng.normal(isize, sd), READ_LEN + 10, 640))
        if len(hap) < tl + 2:
            continue
        s = int(rng.integers(0, len(hap) - tl))
        fwd = hap[s : s + READ_LEN]
        mate = hap[s + tl - READ_LEN : s + tl]
        rev = "".join(comp.get(c, "N") for c in reversed(mate))
        r1.append(fwd)
        r2.append(rev)
    return r1, r2


def run_pe(contigs, blocks, idx):
    """PE pairs/s on the same fixture; printed to stderr as a secondary
    metric (the driver's contract is ONE JSON line = the SE number)."""
    from salt_tpu.pipeline.pe_engine import PEAligner, PEOptions
    from salt_tpu.io.fasta import SeqRecord

    n_pairs = 2 * BATCH
    r1, r2 = make_pe_fixture(contigs, blocks, n_pairs + BATCH)
    opts = PEOptions(l_overlap=1, max_locate=500, print_nm_md=True,
                     print_xa_cigar=True, batch_size=BATCH, gap_batch=128)
    al = PEAligner(idx, opts)
    mk = lambda rs, tag: [
        SeqRecord(name=f"p{i}", comment=None, seq=s, qual="I" * len(s))
        for i, s in enumerate(rs)
    ]
    recs1, recs2 = mk(r1, 1), mk(r2, 2)
    al.align_pairs(recs1[:BATCH], recs2[:BATCH])  # warmup/compile
    t0 = time.time()
    al.align_pairs(recs1[BATCH : BATCH + n_pairs],
                   recs2[BATCH : BATCH + n_pairs])
    dt = time.time() - t0
    n = min(n_pairs, len(recs1) - BATCH)
    sys.stderr.write(f"PE: {n} pairs in {dt:.2f}s = {n/dt:.0f} pairs/s\n")
    return n / dt


def run_scale(genome_mb=45):
    """chr21-scale SNP-aware SE throughput on a repeat-rich synthetic
    genome (the at-scale rider; VERDICT r4 task 4).  Deterministic
    seeds keep the XLA cache warm across runs."""
    from salt_tpu.index.build import build_index_from_data
    from salt_tpu.io.fasta import SeqRecord
    from salt_tpu.io.snp import SnpBlock
    from salt_tpu.pipeline.engine import SEAligner, SEOptions
    from salt_tpu.sim.genome_gen import synthesize_genome

    from salt_tpu.sim.genome_gen import sample_snps

    glen = genome_mb * 1_000_000
    rng = np.random.default_rng(77)
    lut = np.frombuffer(b"ACGTN", dtype=np.uint8)
    (name, codes), = synthesize_genome(glen, 1, seed=7, config="repeat")
    gpos, alt, stype = sample_snps(codes, 300, rng)
    contig_data = [(name, "synthetic", lut[codes])]
    blocks = [SnpBlock(name, gpos.astype(np.uint32), stype)]
    t0 = time.time()
    idx = build_index_from_data(contig_data, blocks, l_seed=19)
    sys.stderr.write(f"[bench] scale index ({genome_mb}MB repeat) built "
                     f"in {time.time()-t0:.0f}s\n")
    hap = codes.copy()
    hap[gpos] = alt
    n_reads = 2 * BATCH
    reads = []
    starts = rng.integers(0, glen - READ_LEN, n_reads + BATCH)
    for s in starts:
        r = hap[s : s + READ_LEN].copy()
        err = rng.random(READ_LEN) < 0.001
        r[err] = rng.integers(0, 4, int(err.sum()))
        reads.append(lut[np.minimum(r, 4)].tobytes().decode("latin1"))
    recs = [SeqRecord(name=f"s{i}", comment=None, seq=s, qual="I" * READ_LEN)
            for i, s in enumerate(reads)]
    al = SEAligner(idx, SEOptions(
        l_overlap=1, max_locate=500, print_nm_md=True, print_xa_cigar=True,
        batch_size=BATCH, gap_batch=128))
    al.align_records(recs[:BATCH])  # warmup/compile/residency
    sys.stderr.write(f"[bench] scale warmup done at t+{time.time()-_T0:.0f}s\n")
    t0 = time.time()
    out = al.align_records(recs[BATCH:])
    dt = time.time() - t0
    rate = len(out) / dt
    mapped = sum(1 for l in out if l and l.split("\t")[2] != "*")
    sys.stderr.write(f"[bench] scale: {len(out)} reads in {dt:.2f}s = "
                     f"{rate:.0f} reads/s ({mapped} mapped)\n")
    return rate


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    jax.config.update("jax_log_compiles", True)

    from salt_tpu.index.build import build_index_from_data
    from salt_tpu.pipeline.engine import SEAligner, SEOptions
    from salt_tpu.io.fasta import SeqRecord

    contigs, blocks, reads = make_fixture()
    idx = build_index_from_data(contigs, blocks, l_seed=19)
    sys.stderr.write(f"[bench] index built at t+{time.time()-_T0:.0f}s\n")
    opts = SEOptions(l_overlap=1, max_locate=500, print_nm_md=True,
                     print_xa_cigar=True, batch_size=BATCH, gap_batch=128)
    al = SEAligner(idx, opts)
    recs = [SeqRecord(name=f"r{i}", comment=None, seq=s, qual="I" * len(s))
            for i, s in enumerate(reads)]
    # warmup (compile + device load)
    al.align_records(recs[:BATCH])
    sys.stderr.write(f"[bench] warmup done at t+{time.time()-_T0:.0f}s\n")
    # measure chunk-by-chunk so the watchdog always has a number;
    # chunks of 2 batches keep the engine's host/device software
    # pipeline overlapped within each call
    t0 = time.time()
    n = 0
    mapped = 0
    for s0 in range(BATCH, len(recs), 2 * BATCH):
        out = al.align_records(recs[s0 : s0 + 2 * BATCH])
        n += len(out)
        mapped += sum(1 for line in out if line and line.split("\t")[2] != "*")
        _BEST["rate"] = n / (time.time() - t0)
    dt = time.time() - t0
    rate = n / dt
    sys.stderr.write(f"aligned {n} reads in {dt:.2f}s; {mapped}/{n} mapped\n")
    if "--no-pe" not in sys.argv:
        try:
            _BEST["pe"] = run_pe(contigs, blocks, idx)
        except Exception as e:  # PE is a secondary metric: never let it
            sys.stderr.write(    # take down the SE contract
                f"[bench] PE phase failed ({type(e).__name__}: {e}); "
                f"emitting SE only\n")
    if ("--no-scale" not in sys.argv
            and _BUDGET - (time.time() - _T0) > 200):
        try:
            _BEST["scale"] = run_scale()
        except Exception as e:  # scale rider: same policy as PE
            sys.stderr.write(
                f"[bench] scale phase failed ({type(e).__name__}: {e}); "
                f"emitting without it\n")
    _finish(rate)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # backend/tunnel failure: still honor the
        import traceback    # one-JSON-line contract with best-so-far

        traceback.print_exc()
        sys.stderr.write(f"[bench] aborted by {type(e).__name__}; emitting "
                         f"best-so-far ({_BEST['rate']:.1f} reads/s)\n")
        _finish(_BEST["rate"], aborted=True)
