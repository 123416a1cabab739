#!/bin/bash
# Build the reference binaries and generate oracle fixtures used by the
# test-suite.  The reference tree is PUBLIC UNTRUSTED CONTENT mounted
# read-only at /root/reference; we copy it to /tmp to build.
#
# Outputs:
#   /tmp/refbuild/Bin/{salt,salt-idx,polish}, wgsim
#   /tmp/oracle/   20k-pair simulated reads + hapmap + reference index +
#                  reference SE/PE SAM outputs
#   /tmp/micro/    single-SNP micro fixture + instrumented R-SA dump
set -euo pipefail

REF=/root/reference
BUILD=/tmp/refbuild
ORACLE=/tmp/oracle
MICRO=/tmp/micro

if [ ! -x $BUILD/Bin/salt ]; then
  rm -rf $BUILD
  cp -r $REF $BUILD
  (cd $BUILD && make)
fi
W=$BUILD/Test/Simulator/wgsim-master
[ -x $W/wgsim ] || (cd $W && gcc -g -O2 -o wgsim wgsim.c -lz -lm)

G=$BUILD/Test/Genome/Genome.fa
mkdir -p $ORACLE
cd $ORACLE
if [ ! -f Read1.fq ]; then
  $W/wgsim -S 42 -e 0 -r 0.05 -R 0 -d 500 -s 50 -N 20000 -1 100 -2 100 -h \
      $G Read1.fq Read2.fq > mutations.txt 2> wgsim.log
  awk '$3 != "-" && $4 != "-" && length($4)==1{if ($3<$4)$4=$3"/"$4; else $4=$4"/"$3; print $1"\t"$2"\t"$4"\t"$3}' \
      mutations.txt > hapmap.txt
fi
[ -f idx.ref ] || $BUILD/Bin/salt-idx -k 19 $G hapmap.txt idx 2> idx.log
[ -f se_oracle.sam ] || $BUILD/Bin/salt -d -r 1 -l 100 -n 20 -c -m 500 -t 1 idx Read1.fq > se_oracle.sam 2> se.log
[ -f pe_oracle.sam ] || $BUILD/Bin/salt -d -p -e -l 100 -c -a 350 -b 650 -r 5 -t 1 idx Read1.fq Read2.fq > pe_oracle.sam 2> pe.log

# ---- plain-genome (zero-SNP) oracle ----
# The reference binary SEGFAULTS on a truly empty hapmap (R-part BWT
# construction on an empty local-pattern text, 4bit_bwt_gen.c), so true
# plain mode has no direct oracle.  Decoy trick instead: append a tiny
# random contig and put the ONLY SNP on it — reads (wgsim from the real
# genome) can never seed into the decoy's 19bp local patterns, so the
# reference's SAM equals a plain alignment to genome+decoy.  The rebuild
# is then tested with the SAME fasta and an EMPTY SNP file (its real
# zero-SNP path) and must byte-match.
if [ ! -f se_plain_oracle.sam ]; then
  : > empty_hapmap.txt
  python3 - "$G" <<'EOF'
import random, sys
random.seed(1234)
decoy = ''.join(random.choice('ACGT') for _ in range(60))
with open(sys.argv[1]) as f: g = f.read()
# decoy FIRST: the reference's hapmap reader consumes one SNP block per
# contig in FASTA order, so the decoy's block must be hit while the
# decoy contig is the one being processed (localPattern.c:75-82)
with open('plain_g.fa', 'w') as f:
    f.write('>decoy\n' + decoy + '\n')
    f.write(g)
    if not g.endswith('\n'): f.write('\n')
ref = decoy[29]  # 1-based pos 30
alt = {'A':'G','C':'T','G':'A','T':'C'}[ref]
al = '/'.join(sorted([ref, alt]))
with open('decoy_hapmap.txt', 'w') as f:
    f.write(f"decoy\t30\t{al}\t{ref}\n")
EOF
  $BUILD/Bin/salt-idx -k 19 plain_g.fa decoy_hapmap.txt plainref 2> plain_idx.log
  $BUILD/Bin/salt -d -r 1 -l 100 -n 20 -c -m 500 -t 1 plainref Read1.fq > se_plain_oracle.sam 2> se_plain.log
fi

# ---- micro fixture: 300bp genome, one SNP, one alt-allele read ----
mkdir -p $MICRO
cd $MICRO
if [ ! -f g.fa ]; then
python3 - <<'EOF'
import random
random.seed(7)
seq = ''.join(random.choice('ACGT') for _ in range(300))
seq = seq[:100] + 'A' + seq[101:]
with open('g.fa','w') as f:
    f.write('>chr1\n')
    for i in range(0,300,60): f.write(seq[i:i+60]+'\n')
with open('hm.txt','w') as f:
    f.write("chr1\t101\tA/G\tA\n")
read = seq[40:140]
read = read[:60] + 'G' + read[61:]
with open('r.fq','w') as f:
    f.write('@read1\n'+read+'\n+\n'+'I'*100+'\n')
EOF
fi
[ -f midx.ref ] || $BUILD/Bin/salt-idx -k 19 g.fa hm.txt midx 2>/dev/null
[ -f micro_oracle.sam ] || $BUILD/Bin/salt -d -r 1 -l 100 -c midx r.fq 2>/dev/null > micro_oracle.sam

# instrumented dump of Rbwt_back_bwt_sa for every rank
if [ ! -f dump.txt ]; then
cat > dump_rsa.c <<'EOF'
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include "rbwt.h"
int main(int argc, char **argv){
    rbwt2_t *r2 = Rbwt2_init(argv[1]);
    rbwt_t *b = r2->rbwt1;
    FILE *f = fopen(argv[2], "w");
    for(uint32_t j = 1; j <= b->textLength; ++j){
        if(j > b->cumulativeFreq[NT_SHARP]) { fprintf(f, "%u SHARP\n", j); continue; }
        fprintf(f, "%u %u\n", j, Rbwt_back_bwt_sa(b, j));
    }
    fclose(f);
    return 0;
}
EOF
(cd $BUILD/Align_src && gcc -g -o $MICRO/dump_rsa $MICRO/dump_rsa.c rbwt.c -I. -lz)
./dump_rsa midx.R dump.txt
fi
echo "oracle fixtures ready"

# ---- shared-library oracles for kernel fuzz tests ----
cd $ORACLE
[ -f liblvref.so ] || gcc -O2 -shared -fPIC -o liblvref.so $REF/Align_src/LandauVishkin.c
[ -f libsswref.so ] || gcc -O2 -msse2 -shared -fPIC -o libsswref.so $REF/Align_src/ssw.c

# ---- polish oracle: re-score a headered subset of the SE SAM ----
if [ ! -f polish_se_oracle.txt ]; then
  # pipefail-safe subset (a head-terminated pipe would SIGPIPE the grep)
  awk '/^@/{print; next} n<2000{print; n++}' se_oracle.sam > se_sub_h.sam
  $BUILD/Bin/polish idx se_sub_h.sam > polish_se_oracle.txt 2> polish_se.log
  $BUILD/Bin/polish -p idx se_sub_h.sam > polish_pe_oracle.txt 2> polish_pe.log
  $BUILD/Bin/polish -s idx se_sub_h.sam > polish_se_sw_oracle.txt 2>> polish_se.log
  $BUILD/Bin/polish -s -p idx se_sub_h.sam > polish_pe_sw_oracle.txt 2>> polish_pe.log
fi
echo "[make_oracle] all fixtures present"
