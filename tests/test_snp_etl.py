"""SNP ETL converters (salt_tpu/etl/snp_etl.py)."""

import io

from salt_tpu.etl import (
    dbsnp_to_hapmap,
    filter_hapmap_against_genome,
    vcf_to_hapmap,
)


def _dbsnp_row(chrom="chr1", start=99, end=100, strand="+", ref="A",
               observed="A/G", var_type="single",
               freq_alleles="A,G", freqs="0.8,0.2"):
    w = [""] * 26
    w[1] = chrom
    w[2] = str(start)
    w[3] = str(end)
    w[6] = strand
    w[7] = ref  # refNCBI
    w[8] = ref  # refUCSC
    w[9] = observed
    w[11] = var_type
    w[23] = freq_alleles
    w[25] = freqs
    return "\t".join(w)


def test_dbsnp_rs_plus_strand():
    out = list(dbsnp_to_hapmap([_dbsnp_row()], alleles_from_rs=True))
    assert out == ["chr1\t100\tA/G\tA"]


def test_dbsnp_rs_minus_strand_complements():
    row = _dbsnp_row(strand="-", observed="C/T", ref="A")
    # '-' strand C/T complements to G/A; ref A always included
    out = list(dbsnp_to_hapmap([row], alleles_from_rs=True))
    assert out == ["chr1\t100\tA/G\tA"]


def test_dbsnp_freq_filter():
    row = _dbsnp_row(freq_alleles="A,G,T", freqs="0.7,0.25,0.05")
    out = list(dbsnp_to_hapmap([row], min_freq=0.1))
    assert out == ["chr1\t100\tA/G\tA"]  # T filtered at 5%


def test_dbsnp_skips_non_single():
    rows = [
        _dbsnp_row(var_type="insertion"),
        _dbsnp_row(start=98, end=100),  # 2bp span
    ]
    assert list(dbsnp_to_hapmap(rows, alleles_from_rs=True)) == []


def test_vcf_basic_and_multi_allelic():
    vcf = [
        "##header",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "chr2\t5\trs1\tC\tT\t50\tPASS\t.",
        "chr2\t9\trs2\tG\tA,T\t50\tPASS\t.",
        "chr2\t12\trs3\tGA\tG\t50\tPASS\t.",  # indel: skipped
        "chr2\t15\trs4\tT\t<DEL>\t50\tPASS\t.",  # symbolic: skipped
    ]
    out = list(vcf_to_hapmap(vcf))
    assert out == ["chr2\t5\tC/T\tC", "chr2\t9\tA/G/T\tG"]


def test_vcf_quality_and_filter_gates():
    vcf = [
        "chr1\t1\t.\tA\tG\t10\tq10\t.",
        "chr1\t2\t.\tA\tG\t90\tPASS\t.",
    ]
    assert len(list(vcf_to_hapmap(vcf, min_qual=30))) == 1
    assert len(list(vcf_to_hapmap(vcf, pass_only=True))) == 1


def test_filter_against_genome(tmp_path):
    fa = tmp_path / "g.fa"
    fa.write_text(">c1 x\nACGTACGT\n>c2 y\nTTTT\n")
    rows = [
        "c1\t1\tA/G\tA",    # genome has A at pos 1 -> keep
        "c1\t2\tA/G\tA",    # genome has C at pos 2, not in A/G -> drop
        "c1\t99\tA/G\tA",   # out of range -> drop
        "c3\t1\tA/G\tA",    # unknown contig -> drop
    ]
    out_fa = io.StringIO()
    kept = list(
        filter_hapmap_against_genome(str(fa), rows, out_fa=out_fa)
    )
    assert kept == ["c1\t1\tA/G\tA"]
    assert out_fa.getvalue().startswith(">c1\nACGTACGT\n")


# ---------------------------------------------------------------------------
# Script/ tool equivalents: snp2bed, fill-rs, extract-indel, sort-vcf, stat-cov

def _ucsc_row(chrom, start, end, name, strand, ref, observed, vtype):
    return "\t".join(
        ["585", chrom, str(start), str(end), name, "0", strand,
         ref, ref, observed, "genomic", vtype]
    )


def test_snp2bed(tmp_path):
    from salt_tpu.etl.snp_etl import snp2bed

    fa = tmp_path / "g.fa"
    fa.write_text(">c1\nACGTACGTAC\n")
    rows = [
        _ucsc_row("c1", 2, 3, "rs1", "+", "G", "G/T", "single"),  # base G ok
        _ucsc_row("c1", 4, 5, "rs2", "-", "A", "G/T", "single"),  # obs -> C/A; base A ok
        _ucsc_row("c1", 6, 7, "rs3", "+", "G", "C/T", "single"),  # base G not in C/T
        _ucsc_row("c1", 0, 2, "rs4", "+", "AC", "AC/T", "single"),  # len != 1
    ]
    out = list(snp2bed(str(fa), rows))
    assert out == ["c1\t2\t3", "c1\t4\t5"]


def test_fill_rs_maps_through_cigar():
    from salt_tpu.etl.snp_etl import fill_rs, _cigar_t_shift

    # XV offset 5 through 3M2I5M: q_shift=5 -> t = 3 + min(5, 5-5+1)=3+1 -> t-1=5... 
    # verify against the reference formula directly
    assert _cigar_t_shift("10M", 4) == 4
    assert _cigar_t_shift("5S10M", 4) == 4          # clip skipped
    assert _cigar_t_shift("3M2I5M", 6) == 4         # 2 inserted bases don't consume ref
    assert _cigar_t_shift("3M2D5M", 3) == 5         # deletion consumes ref
    sam = [
        "@HD\tVN:1.3",
        "r1\t0\tc1\t100\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\tXV:i:4",
    ]
    db = [_ucsc_row("c1", 103, 104, "rs77", "+", "A", "A/G", "single")]
    out = list(fill_rs(sam, db))
    assert out[1].endswith("RS:Z:rs77")
    # unresolvable offset raises in strict mode, skipped in lenient
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        list(fill_rs([sam[1]], []))
    out = list(fill_rs([sam[1]], [], strict=False))
    assert "RS:Z" not in out[0]


def test_extract_indel(tmp_path):
    from salt_tpu.etl.snp_etl import extract_indel

    fa = tmp_path / "g.fa"
    seq = "ACGTACGTACGTACGTACGT"
    fa.write_text(f">c1\n{seq}\n")
    rows = [
        _ucsc_row("c1", 8, 10, "rs9", "+", "GT", "-/GT", "deletion"),
    ]
    # make the base check pass: seq[7] = 'T' must be in observed list
    rows = [_ucsc_row("c1", 8, 10, "rs9", "+", "GT", "-/T", "deletion")]
    extract_indel(str(fa), rows, str(tmp_path / "out"), segment_len=5)
    ind = (tmp_path / "out.indel.fa").read_text().splitlines()
    assert ind[0] == ">c1_8_10_deletion"
    # flank = seq[2:7] + seq[10:15]
    assert ind[1] == seq[2:7] + seq[10:15]
    assert (tmp_path / "out.fa").read_text().startswith(">c1\n")


def test_sort_vcf():
    from salt_tpu.etl.snp_etl import sort_vcf

    lines = [
        "chr2\t50\t.\tA\tG\t.\t.\t.",
        "chr1\t99\t.\tA\tG\t.\t.\t.",
        "chr1\t5\t.\tC\tT\t.\t.\t.",
        "chrUn_x\t1\t.\tC\tT\t.\t.\t.",   # dropped (not in canonical list)
        "#comment",
    ]
    out = list(sort_vcf(lines))
    assert [l.split("\t")[0:2] for l in out] == [
        ["chr1", "5"], ["chr1", "99"], ["chr2", "50"]]


def test_stat_cov():
    from salt_tpu.etl.snp_etl import stat_cov

    bed = ["c1\t5\t6", "c1\t100\t101", "c2\t0\t10"]
    sam = [
        "@HD\tVN:1.3",
        "r1\t0\tc1\t1\t60\t10M\t*\t0\t0\tAAAAAAAAAA\tIIIIIIIIII",   # covers c1[0,10) -> pos 5
        "r2\t0\tc1\t99\t60\t5M\t*\t0\t0\tAAAAA\tIIIII",              # covers [98,103) -> pos 100
        "r3\t0\tc2\t3\t60\t4M\t*\t0\t0\tAAAA\tIIII",                 # covers [2,6) -> 4 bases
        "r4\t4\t*\t0\t0\t*\t*\t0\t0\tAAAA\tIIII",
    ]
    assert stat_cov(bed, sam) == 1 + 1 + 4
