#!/bin/bash
# Focused benchmark sweep on the local TPU; appends JSON lines to
# bench_results.jsonl.  Run configs sequentially (one chip, one process).
set -u
cd "$(dirname "$0")/.."
OUT=bench_results.jsonl
for args in \
    "--model large-v3 --batch 16" \
    "--model large-v3 --batch 16 --kv-int8" \
    "--model large-v3 --batch 16 --quantize int8 --kv-int8" \
    "--model large-v3 --batch 8 --beam 5" \
    "--model large-v3 --batch 1" \
    "--model large-v3 --batch 1 --quantize int8 --kv-int8" \
    ; do
    echo "=== bench $args" >&2
    python bench.py $args 2>/dev/null | tail -1 | tee -a "$OUT"
done
