#!/bin/bash
# Focused benchmark sweep on the local TPU; appends JSON lines to
# bench_results.jsonl.  Run configs sequentially (one chip, one process).
set -u
cd "$(dirname "$0")/.."
OUT=bench_results.jsonl
for args in \
    "--model large-v3-turbo --batch 16" \
    "--model large-v3-turbo --batch 1" \
    "--model large-v3 --batch 1" \
    "--model tiny --batch 16" \
    ; do
    echo "=== bench $args" >&2
    python bench.py $args 2>/dev/null | tail -1 | tee -a "$OUT"
done
