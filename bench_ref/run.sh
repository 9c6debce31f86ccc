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
# fail loudly if the sed pattern stopped matching the header (ADVICE r4:
# a silent no-op would just drop rows from the baseline table)
grep -q '^#define AES___     256' /tmp/ref256/micro_aes.h || {
    echo "ERROR: AES___ sed patch did not apply to $REF/micro_aes.h" >&2
    exit 1
}
cp "$REF/micro_fpe.h" /tmp/ref256/ 2>/dev/null || true
gcc -O2 -I/tmp/ref256 bench_ref.c "$REF/micro_aes.c" -o /tmp/bench_ref_256
gcc -O2 -I"$REF" bench_ref.c "$REF/micro_aes.c" -o /tmp/bench_ref_128
# FF3-1 variants: FF_X is likewise hard-coded (1), so patch it the same way
mkdir -p /tmp/ref128ff3 /tmp/ref256ff3
sed 's/^#define FF_X            1/#define FF_X            3/' \
    "$REF/micro_aes.h" > /tmp/ref128ff3/micro_aes.h
sed 's/^#define FF_X            1/#define FF_X            3/' \
    /tmp/ref256/micro_aes.h > /tmp/ref256ff3/micro_aes.h
grep -q '^#define FF_X            3' /tmp/ref128ff3/micro_aes.h || {
    echo "ERROR: FF_X sed patch did not apply to $REF/micro_aes.h" >&2
    exit 1
}
cp "$REF/micro_fpe.h" /tmp/ref128ff3/ 2>/dev/null || true
cp "$REF/micro_fpe.h" /tmp/ref256ff3/ 2>/dev/null || true
gcc -O2 -I/tmp/ref256ff3 bench_ref.c "$REF/micro_aes.c" -o /tmp/bench_ref_256f3
gcc -O2 -I/tmp/ref128ff3 bench_ref.c "$REF/micro_aes.c" -o /tmp/bench_ref_128f3
/tmp/bench_ref_256
/tmp/bench_ref_128
/tmp/bench_ref_256f3 | grep FF3 || true
/tmp/bench_ref_128f3 | grep FF3 || true
