"""SNP ETL: convert public variant call formats into the aligner's
hapmap-style SNP table (``chrom\\tpos\\talleles\\tref``, 1-based pos,
alleles like ``A/G`` in A<C<G<T order).

Re-expresses the reference's offline tooling
(Index_src/convert_dbsnp.py, Index_src/extract_snp.py,
Index_src/extract_vcf_snp.py — the last is unfinished/broken upstream;
this module implements its evident intent) as working Python 3.

All functions stream: they never hold a whole variant file in memory.
"""

from __future__ import annotations

import gzip
import sys
from typing import Iterable, Iterator, Optional, TextIO

_COMPLEMENT = {"A": "T", "T": "A", "C": "G", "G": "C"}
_NT_ORDER = "ACGT"


def _open_text(path: str) -> TextIO:
    if path == "-":
        return sys.stdin
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "r")


def _allele_string(present: dict) -> str:
    """Alleles joined '/' in the fixed A,C,G,T order
    (Index_src/convert_dbsnp.py:67-71)."""
    return "/".join(nt for nt in _NT_ORDER if present.get(nt))


def dbsnp_to_hapmap(
    lines: Iterable[str],
    ref_ncbi: bool = False,
    alleles_from_rs: bool = False,
    min_freq: float = 0.1,
) -> Iterator[str]:
    """UCSC dbSNP table dump -> hapmap lines.

    Column layout and filters follow Index_src/convert_dbsnp.py:17-72:
    keep only ``variantType == 'single'`` spanning exactly one base;
    take alleles either from the observed ``A/C`` rs string (strand
    corrected) or from the frequency columns (>= min_freq); the
    reference base is always included.  Output position is the 1-based
    ``chromEnd``.
    """
    for line in lines:
        words = line.rstrip("\n").split("\t")
        if len(words) < 12:
            continue
        chrom = words[1]
        try:
            chrom_start = int(words[2])
            chrom_end = int(words[3])
        except ValueError:
            continue
        if words[11] != "single" or chrom_end - chrom_start != 1:
            continue
        strand = words[6]
        ref = words[7] if ref_ncbi else words[8]
        ref = ref.upper()
        if ref not in _COMPLEMENT:
            continue
        present = {ref: True}
        if alleles_from_rs:
            for nt in words[9].upper().split("/"):
                if len(nt) != 1 or nt not in _COMPLEMENT:
                    continue
                present[nt if strand == "+" else _COMPLEMENT[nt]] = True
        else:
            if len(words) < 26:
                continue
            freqs = words[25].split(",")
            for nt, f in zip(words[23].split(","), freqs):
                nt = nt.upper()
                if len(nt) != 1 or nt not in _COMPLEMENT:
                    continue
                try:
                    if float(f) < min_freq:
                        continue
                except ValueError:
                    continue
                present[nt if strand == "+" else _COMPLEMENT[nt]] = True
        alleles = _allele_string(present)
        if "/" not in alleles:  # monomorphic after filtering: no SNP
            continue
        yield f"{chrom}\t{chrom_end}\t{alleles}\t{ref}"


def vcf_to_hapmap(
    lines: Iterable[str],
    min_qual: Optional[float] = None,
    pass_only: bool = False,
) -> Iterator[str]:
    """VCF -> hapmap lines (bi-/multi-allelic SNPs only; indels are
    skipped — the aligner's SNP overlay is substitution-only).

    This is the working form of Index_src/extract_vcf_snp.py (broken
    upstream): keep records where REF is one base and at least one ALT
    is one base; pos is VCF's 1-based POS.
    """
    for line in lines:
        if not line or line[0] == "#":
            continue
        words = line.rstrip("\n").split("\t")
        if len(words) < 8:
            continue
        chrom, pos_s, _rsid, ref, alt, qual, filt = words[:7]
        ref = ref.upper()
        if len(ref) != 1 or ref not in _COMPLEMENT:
            continue
        if pass_only and filt not in (".", "PASS"):
            continue
        if min_qual is not None:
            try:
                if float(qual) < min_qual:
                    continue
            except ValueError:
                pass
        present = {ref: True}
        for a in alt.upper().split(","):
            if len(a) == 1 and a in _COMPLEMENT:
                present[a] = True
        alleles = _allele_string(present)
        if "/" not in alleles:
            continue
        yield f"{chrom}\t{pos_s}\t{alleles}\t{ref}"


def filter_hapmap_against_genome(
    genome_fa: str,
    hapmap_lines: Iterable[str],
    out_fa: Optional[TextIO] = None,
    wrap: int = 60,
) -> Iterator[str]:
    """Drop hapmap records whose stated position doesn't carry one of
    the listed alleles in the actual genome, and optionally re-emit the
    genome restricted to contigs that have variants
    (Index_src/extract_snp.py:80-104 semantics: the reference checks
    ``seq[pos-1] in alleles``).

    Yields the surviving hapmap lines in input order per contig.
    """
    from ..io.fasta import read_records

    seqs = {}
    order = []
    for rec in read_records(genome_fa):
        seqs[rec.name] = rec.seq.upper()
        order.append(rec.name)

    by_chrom: dict = {}
    for line in hapmap_lines:
        words = line.rstrip("\n").split("\t")
        if len(words) < 3:
            continue
        by_chrom.setdefault(words[0], []).append(words)

    for name in order:
        if name not in by_chrom:
            print(
                f"chrom {name} has no variants",
                file=sys.stderr,
            )
            continue
        if out_fa is not None:
            print(f">{name}", file=out_fa)
            s = seqs[name]
            for i in range(0, len(s), wrap):
                print(s[i : i + wrap], file=out_fa)
        seq = seqs[name]
        for words in by_chrom[name]:
            try:
                pos = int(words[1])
            except ValueError:
                continue
            if not (1 <= pos <= len(seq)):
                continue
            if seq[pos - 1] not in words[2]:
                continue
            yield "\t".join(words[:4] if len(words) >= 4 else words)


def _main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        prog="salt-tpu-snp-etl",
        description="variant-format converters for the SNP-aware index",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dbsnp", help="UCSC dbSNP table -> hapmap")
    d.add_argument("-n", "--ncbi", action="store_true")
    d.add_argument("-s", "--rs", action="store_true")
    d.add_argument("-f", "--frequency", type=float, default=0.1)
    d.add_argument("table")

    v = sub.add_parser("vcf", help="VCF -> hapmap (SNPs only)")
    v.add_argument("--min-qual", type=float, default=None)
    v.add_argument("--pass-only", action="store_true")
    v.add_argument("vcf")

    f = sub.add_parser("filter", help="drop hapmap rows contradicting the genome")
    f.add_argument("genome_fa")
    f.add_argument("hapmap")
    f.add_argument("--out-fa", default=None)

    args = ap.parse_args(argv)
    if args.cmd == "dbsnp":
        with _open_text(args.table) as fp:
            for line in dbsnp_to_hapmap(
                fp, ref_ncbi=args.ncbi, alleles_from_rs=args.rs,
                min_freq=args.frequency,
            ):
                print(line)
    elif args.cmd == "vcf":
        with _open_text(args.vcf) as fp:
            for line in vcf_to_hapmap(
                fp, min_qual=args.min_qual, pass_only=args.pass_only
            ):
                print(line)
    else:
        out_fa = open(args.out_fa, "w") if args.out_fa else None
        with _open_text(args.hapmap) as fp:
            for line in filter_hapmap_against_genome(
                args.genome_fa, fp, out_fa=out_fa
            ):
                print(line)
        if out_fa:
            out_fa.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
