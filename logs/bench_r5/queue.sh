#!/bin/bash
cd /root/repo
run() { name=$1; shift; echo "=== $name: $* $(date +%T)" >> logs/bench_r5/queue.log; timeout 3600 python bench.py "$@" > logs/bench_r5/$name.out 2> logs/bench_r5/$name.err; echo "$name rc=$? $(date +%T)" >> logs/bench_r5/queue.log; tail -1 logs/bench_r5/$name.out >> logs/bench_r5/queue.log; }
run d32_noscan --set model.decoder_out_size=32 loss.vgg_resolution=32 scan_groups=1
run wf50_noscan --set augment.warp_fraction=0.5 scan_groups=1
run wf50d32_noscan --set model.decoder_out_size=32 loss.vgg_resolution=32 augment.warp_fraction=0.5 scan_groups=1
run we3_noscan --set augment.warp_every=3 scan_groups=1
run d32_scan8 --set model.decoder_out_size=32 loss.vgg_resolution=32
run default_scan8
run default_noscan --set scan_groups=1
echo "QUEUE DONE $(date +%T)" >> logs/bench_r5/queue.log
