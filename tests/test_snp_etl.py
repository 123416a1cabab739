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
