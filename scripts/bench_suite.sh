#!/bin/bash
# Full benchmark sweep on the local TPU; writes JSON lines to bench_results.jsonl.
# Run variants sequentially (one chip, one process at a time).
set -u
cd "$(dirname "$0")/.."
OUT=bench_results.jsonl
: > "$OUT"
for args in \
    "--model large-v3 --batch 8" \
    "--model large-v3 --batch 16" \
    "--model large-v3-turbo --batch 16" \
    "--model large-v3-turbo --batch 32" \
    "--model medium --batch 16" \
    "--model small --batch 16" \
    "--model base --batch 16" \
    "--model tiny --batch 16" \
    "--model large-v3 --batch 1" \
    "--model large-v3-turbo --batch 1" \
    ; do
    echo "=== bench $args" >&2
    python bench.py $args 2>/dev/null | tail -1 | tee -a "$OUT"
done
