#!/bin/bash
cd /root/repo
run() { name=$1; shift; echo "=== $name: $* $(date +%T)" >> logs/bench_r5/queue.log; timeout 3600 python bench.py "$@" > logs/bench_r5/$name.out 2> logs/bench_r5/$name.err; echo "$name rc=$? $(date +%T)" >> logs/bench_r5/queue.log; tail -1 logs/bench_r5/$name.out >> logs/bench_r5/queue.log; }
run wf50d32_scan8 --set model.decoder_out_size=32 loss.vgg_resolution=32 augment.warp_fraction=0.5
echo "QUEUE2 DONE $(date +%T)" >> logs/bench_r5/queue.log
