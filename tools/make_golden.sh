#!/bin/sh
# Regenerate golden parity vectors by building and RUNNING the reference
# library (never copied into the package; used as an external oracle only).
set -e
cd "$(dirname "$0")/.."
mkdir -p .refbuild
cp -r /root/reference/src /root/reference/arch.mk /root/reference/common.mk .refbuild/
( cd .refbuild/src && make BUILD=release ARCH=x86_64 libdwt.a )
gcc -std=c99 -O2 -I.refbuild/src tools/gen_golden.c .refbuild/src/libdwt.a \
    -o .refbuild/gen_golden -lm -fopenmp
( cd .refbuild && ./gen_golden )
python tests/make_golden.py
