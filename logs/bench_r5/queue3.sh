#!/bin/bash
cd /root/repo
run() { name=$1; shift; echo "=== $name: $* $(date +%T)" >> logs/bench_r5/queue.log; timeout 3600 python bench.py "$@" > logs/bench_r5/$name.out 2> logs/bench_r5/$name.err; echo "$name rc=$? $(date +%T)" >> logs/bench_r5/queue.log; tail -1 logs/bench_r5/$name.out >> logs/bench_r5/queue.log; }
# Probes ON TOP of the NEW default (wf50d32+scan8):
run wf25d32_scan8 --set augment.warp_fraction=0.25
run we3wf50d32_scan8 --set augment.warp_every=3
run b256_default --batch 256
# no-scan budget rates for any gate of the above:
run wf25d32_noscan --set augment.warp_fraction=0.25 scan_groups=1
run we3wf50d32_noscan --set augment.warp_every=3 scan_groups=1
echo "QUEUE3 DONE $(date +%T)" >> logs/bench_r5/queue.log
