#!/bin/bash
# Sequential TPU job queue (one job at a time; graceful timeouts only).
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 30; done
echo "=== bench done; starting queue at $(date) ==="
echo "--- sweep_inner ---"
timeout -s TERM 4000 python tools/sweep_inner.py > /tmp/sweep_inner.log 2>&1
echo "sweep rc=$?"
sleep 30
echo "--- northstar mixing ---"
timeout -s TERM 3000 python -m nupgcm_tpu.tools.northstar --out artifacts --steps 1000 > /tmp/northstar_mixing.log 2>&1
echo "northstar rc=$?"
sleep 30
echo "--- northstar full physics ---"
timeout -s TERM 3000 python -m nupgcm_tpu.tools.northstar --out artifacts --steps 1000 --physics full > /tmp/northstar_full.log 2>&1
echo "northstar-full rc=$?"
sleep 30
echo "--- production channel_basin ---"
timeout -s TERM 4000 python -m nupgcm_tpu.tools.production --h 0.02 --steps 50 --out artifacts > /tmp/production.log 2>&1
echo "production rc=$?"
echo "=== queue done at $(date) ==="
