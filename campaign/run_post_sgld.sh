#!/bin/bash
# Waits for the post-bbb chained driver (perf session + sgld quant +
# figures) to exit, then runs campaign/post_sgld_payload.sh. The payload
# is a separate file so it can be edited right up until it is invoked
# (bash reads scripts incrementally; editing a RUNNING script corrupts
# it, editing a not-yet-started file is safe).
set -x
POST_BBB_PID=${POST_BBB_PID:?pass the running run_post_bbb.sh pid}
while kill -0 "$POST_BBB_PID" 2>/dev/null; do sleep 60; done
echo "post-bbb driver $POST_BBB_PID exited $(date)"
bash /root/repo/campaign/post_sgld_payload.sh
echo "POST_SGLD_DONE $(date)"
