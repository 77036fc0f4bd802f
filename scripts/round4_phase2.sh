#!/bin/bash
# Phase 2: gtdb_cli stage diagnosis + seed-chain A/B. Waits for the
# phase-1 battery to finish (its marker line in battery.log).
set -u
cd /root/repo
OUT=.bench_data/round4
mkdir -p $OUT

while ! grep -q "battery done" $OUT/battery.log 2>/dev/null; do
    sleep 30
done

echo "=== phase2 gtdb_cli --stages: $(date -u +%H:%M:%S) ===" | tee -a $OUT/battery.log
timeout 7200 python bench.py --config gtdb_cli --stages > $OUT/gtdb_cli_diag.log 2>&1
echo "exit=$? $(tail -1 $OUT/gtdb_cli_diag.log)" | tee -a $OUT/battery.log

echo "=== phase2 gbench prefix (rolled default): $(date -u +%H:%M:%S) ===" | tee -a $OUT/battery.log
timeout 3600 python scripts/gbench.py --reps 3 prefix > $OUT/gbench_rolled.log 2>&1
echo "exit=$?" | tee -a $OUT/battery.log

echo "=== phase2 gbench prefix (SYLPH_RC_REV=1 revpairs): $(date -u +%H:%M:%S) ===" | tee -a $OUT/battery.log
SYLPH_RC_REV=1 timeout 3600 python scripts/gbench.py --reps 3 prefix > $OUT/gbench_rcrev.log 2>&1
echo "exit=$?" | tee -a $OUT/battery.log
echo "=== phase2 done: $(date -u +%H:%M:%S) ===" | tee -a $OUT/battery.log
