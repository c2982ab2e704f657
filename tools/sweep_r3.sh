#!/bin/bash
# Round-3 chip sweep: run when the axon relay tunnel is up
# (python3 -c 'import socket; socket.create_connection(("127.0.0.1",8083),2)').
#
# Measures, in order:
#  1. headline bench (validates cos4 harmonic + measured-margin bound +
#     one-rsqrt cphi + eta^2 packing: r2 tail was 539M; expect 600-680M)
#  2. gapbench schedule sweep over the NEW knobs
#     (spec: era3_h/era3_rounds/K/far/bulk/skip1/dual_h/round0_draws)
#  3. bench --all cross-config table (exotic lenses with the tighter bound)
#
# Serialize everything; never overlap two TPU processes (1-core host,
# relay wedges on kill — see .claude/skills/verify/SKILL.md).
set -e
cd "$(dirname "$0")/.."
echo "=== 1. headline ==="
timeout 3000 python bench.py 2>bench_r3_err.log | tee /tmp/bench_r3_headline.json
echo "=== 2. schedule sweep (dual_h x round0_draws) ==="
timeout 3000 python tools/gapbench.py --sweep \
  8/1/4/1/0/0/0/0,8/1/4/1/0/0/8/0,8/1/4/1/0/0/32/0,8/1/4/1/0/0/8/8,8/1/4/1/0/0/0/8,8/1/4/1/0/0/0/13,8/1/6/1/0/0/8/8 \
  2>&1 | tail -20
echo "=== 3. dead-heavy K re-sweep (fisheye) ==="
# the r2 optimum K=13 predates the cos4+margin bound: dead keys now
# pre-reject ~100% of draws, so deeper pure-precheck chains (up to the
# whole budget) may win
timeout 3000 python tools/gapbench.py --lens fisheye_muller_f4.0 \
  --fstop 4.0 --dead-heavy on --sweep \
  8/1/13/1/0/0/0/0,8/1/20/1/0/0/0/0,8/1/26/1/0/0/0/0,8/1/13/1/0/0/8/0 \
  2>&1 | tail -8
echo "=== 4. cross-config ==="
timeout 3000 python bench.py --all 2>&1 | tail -30
