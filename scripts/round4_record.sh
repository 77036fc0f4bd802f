#!/bin/bash
# Final round-4 record battery: every config fresh on the round-4 code.
set -u
cd /root/repo
OUT=.bench_data/round4
mkdir -p $OUT
run() {
    name=$1; shift
    echo "=== $name: $(date -u +%H:%M:%S) ===" | tee -a $OUT/record.log
    timeout 7200 python bench.py "$@" > $OUT/rec_$name.log 2>&1
    echo "exit=$? $(tail -1 $OUT/rec_$name.log)" | tee -a $OUT/record.log
}
run gtdb        --config gtdb
run gtdb_dup    --config gtdb --dup
run multisample --config gtdb --samples 8
run e2e         --config e2e
echo "=== record done: $(date -u +%H:%M:%S) ===" | tee -a $OUT/record.log
