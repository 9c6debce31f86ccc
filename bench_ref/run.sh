#!/bin/sh
# Build + run the reference-C baselines (gcc -O2, host CPU).
# Usage: sh bench_ref/run.sh [> BENCHREF.json]
#
# micro_aes.h hard-codes AES___ 128 (no #ifndef), so the 256-bit build
# uses a sed-patched TEMP copy of the header (never committed) that
# shadows the original on the include path.
set -e
cd "$(dirname "$0")"
REF=${REF:-/root/reference}
mkdir -p /tmp/ref256
sed 's/^#define AES___     128/#define AES___     256/' \
    "$REF/micro_aes.h" > /tmp/ref256/micro_aes.h
cp "$REF/micro_fpe.h" /tmp/ref256/ 2>/dev/null || true
gcc -O2 -I/tmp/ref256 bench_ref.c "$REF/micro_aes.c" -o /tmp/bench_ref_256
gcc -O2 -I"$REF" bench_ref.c "$REF/micro_aes.c" -o /tmp/bench_ref_128
/tmp/bench_ref_256
/tmp/bench_ref_128
