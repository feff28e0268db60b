#!/bin/bash
# Byte-compare ngmlr_tpu output against the reference binary's golden SAMs
# for every dataset (run from the repo root). @PG lines are excluded.
set -u
cd "$(dirname "$0")/.."
PASS=0; FAIL=0
check () {
  local name=$1; shift
  local golden=$1; shift
  local out; out=$(mktemp)
  python -m ngmlr_tpu.cli "$@" -o "$out" 2>/dev/null
  if diff <(grep -v "^@PG" "$golden") <(grep -v "^@PG" "$out") >/dev/null; then
    echo "$name: BYTE-IDENTICAL"; PASS=$((PASS+1))
  else
    echo "$name: DIFFERS"; FAIL=$((FAIL+1))
    diff <(grep -v "^@PG" "$golden") <(grep -v "^@PG" "$out") | head -4
  fi
  rm -f "$out"
}
check test_1 tests/golden/test_1.sam -r tests/data/test_1/ref_chr6_140kb.fa -q tests/data/test_1/long_name.fa
check test_2 tests/golden/test_2.sam -r tests/data/test_2/ref_chr21_20kb.fa -q tests/data/test_2/reads_100_2200bp.fa
check test_2_ont tests/golden/test_2_ont.sam -r tests/data/test_2/ref_chr21_20kb.fa -q tests/data/test_2/reads_100_2200bp.fa -x ont
check test_4 tests/golden/test_4.sam -r tests/data/test_4/reference.fasta.gz -q tests/data/test_4/read.fa.gz -x pacbio
check test_5 tests/golden/test_5.sam -r tests/data/test_5/reference.fasta.gz -q tests/data/test_5/read.fa.gz -x pacbio
check test_6 tests/golden/test_6.sam -r tests/data/test_6/reference.fasta.gz -q tests/data/test_6/read.fa.gz -x pacbio
echo "pass=$PASS fail=$FAIL"
[ "$FAIL" -eq 0 ]
