#!/bin/bash
# Phase 3: clean headline re-runs (rolled seed chain restored) + the
# fine-grained gtdb_cli stage diagnosis. Box must stay quiet.
set -u
cd /root/repo
OUT=.bench_data/round4
mkdir -p $OUT

run() {
    name=$1; shift
    echo "=== phase3 $name: $(date -u +%H:%M:%S) ===" | tee -a $OUT/battery.log
    timeout 7200 python bench.py "$@" > $OUT/$name.log 2>&1
    echo "exit=$? $(tail -1 $OUT/$name.log)" | tee -a $OUT/battery.log
}

run gtdb_clean      --config gtdb
run gtdb_dup_clean  --config gtdb --dup
run gtdb_cli_diag2  --config gtdb_cli --stages
echo "=== phase3 done: $(date -u +%H:%M:%S) ===" | tee -a $OUT/battery.log
