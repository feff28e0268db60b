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
# test_3: the reference binary segfaults on the whole file AND on 58 of the
# 142 reads individually (tests/golden/test_3_reference_crashes.txt); the
# golden holds per-read output for the 84 reads it survives. QUAL is
# excluded (reference prints reversed heap garbage for reverse-strand FASTA
# records — docs/DIVERGENCES.md #1).
t3out=$(mktemp)
python -m ngmlr_tpu.cli -r tests/data/test_3/reference.fasta.gz -q tests/data/test_3/read.fa.gz -o "$t3out" 2>/dev/null
if python3 - "$t3out" <<'PYEOF'
import sys
def load(p):
    d = {}
    for line in open(p):
        if line.startswith("@"): continue
        f = line.rstrip("\n").split("\t")
        f[10] = "QUAL"
        d.setdefault(f[0], []).append(f)
    return d
golden = load("tests/golden/test_3_perread.sam")
ours = load(sys.argv[1])
bad = [q for q, g in golden.items() if ours.get(q) != g]
print(f"test_3: {len(golden)-len(bad)}/{len(golden)} reads identical")
sys.exit(1 if bad else 0)
PYEOF
then PASS=$((PASS+1)); else FAIL=$((FAIL+1)); fi
rm -f "$t3out"

# test_7: SV-rich ont-preset dataset (scripts/make_ont_golden.py, seed 77).
# Reference crashes whole-file AND on 44/120 reads individually
# (tests/golden/test_7_reference_crashes.txt); golden holds per-read output
# of the 76 survivors, QUAL pre-sanitized to '*' (docs/DIVERGENCES.md #1).
t7out=$(mktemp)
python -m ngmlr_tpu.cli -r tests/data/test_7/ref.fa -q tests/data/test_7/reads.fa -x ont -o "$t7out" 2>/dev/null
if python3 - "$t7out" <<'PYEOF'
import sys
def load(p):
    d = {}
    for line in open(p):
        if line.startswith("@"): continue
        f = line.rstrip("\n").split("\t")
        d.setdefault(f[0], []).append(f)
    return d
golden = load("tests/golden/test_7_ont_sv.sam")
ours = load(sys.argv[1])
bad = [q for q, g in golden.items() if ours.get(q) != g]
print(f"test_7_ont_sv: {len(golden)-len(bad)}/{len(golden)} reads identical")
if bad:
    print("first diffs:", bad[:3])
sys.exit(1 if bad else 0)
PYEOF
then PASS=$((PASS+1)); else FAIL=$((FAIL+1)); fi
rm -f "$t7out"

# test_8: ultra-long (50-250 kb) SV-rich dataset, pacbio preset
# (scripts/make_ultralong_golden.py, seed 4242). Reference crashes on 3/13
# reads individually (tests/golden/test_8_reference_crashes.txt); golden
# holds per-read output of the 10 survivors, QUAL pre-sanitized to '*'
# (docs/DIVERGENCES.md #1). Skippable for quick iteration:
# NGMLR_TPU_SKIP_ULTRALONG=1 (a 250 kb read takes minutes on the CPU
# scan fallback).
if [ -z "${NGMLR_TPU_SKIP_ULTRALONG:-}" ]; then
t8out=$(mktemp)
python -m ngmlr_tpu.cli -r tests/data/test_8/ref.fa -q tests/data/test_8/reads.fa -o "$t8out" 2>/dev/null
if python3 - "$t8out" <<'PYEOF'
import sys
def load(p):
    d = {}
    for line in open(p):
        if line.startswith("@"): continue
        f = line.rstrip("\n").split("\t")
        d.setdefault(f[0], []).append(f)
    return d
golden = load("tests/golden/test_8_ultralong.sam")
ours = load(sys.argv[1])
bad = [q for q, g in golden.items() if ours.get(q) != g]
print(f"test_8_ultralong: {len(golden)-len(bad)}/{len(golden)} reads identical")
if bad:
    print("first diffs:", bad[:3])
sys.exit(1 if bad else 0)
PYEOF
then PASS=$((PASS+1)); else FAIL=$((FAIL+1)); fi
rm -f "$t8out"
fi

echo "pass=$PASS fail=$FAIL"
[ "$FAIL" -eq 0 ]
