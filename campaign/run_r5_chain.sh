#!/bin/bash
# Round-5 chain: once the primary TPU queue exits, run a SECOND pass of
# run_r5.sh (it is DONE-marker-resumable — the second pass repairs any
# cell a transient relay failure killed mid-sweep, e.g. the 06:10 UTC
# "remote_compile: response body closed" that took out the
# mcdropout-cifar a_7_w_8 quant cell), then hand the chip to the perf
# payload (campaign/post_r5_perf.sh).
set -x
while [ -d /root/campaign_tpu.lock ]; do sleep 60; done
bash /root/repo/campaign/run_r5.sh
exec bash /root/repo/campaign/post_r5_perf.sh
