#!/bin/bash
# Round-4 benchmark battery: runs each config sequentially on the single
# attached chip, appending one JSON line per config to .bench_data/round4/.
# Waits for any in-flight gtdb_cli process to release the chip first.
set -u
cd /root/repo
OUT=.bench_data/round4
mkdir -p $OUT

while pgrep -f "bench.py --config gtdb_cli" > /dev/null 2>&1; do
    sleep 30
done

run() {
    name=$1; shift
    echo "=== $name: $(date -u +%H:%M:%S) ===" | tee -a $OUT/battery.log
    timeout 7200 python bench.py "$@" > $OUT/$name.log 2>&1
    echo "exit=$? $(tail -1 $OUT/$name.log)" | tee -a $OUT/battery.log
}

run gtdb        --config gtdb
run gtdb_dup    --config gtdb --dup
run multisample --config gtdb --samples 8
if [ ! -f .bench_data/e2e/db.syldb ]; then
    echo "=== e2e fixture gen ===" | tee -a $OUT/battery.log
    timeout 7200 python scripts/gen_e2e_fixture.py > $OUT/e2e_fixture.log 2>&1
fi
run e2e         --config e2e
echo "=== battery done: $(date -u +%H:%M:%S) ===" | tee -a $OUT/battery.log
