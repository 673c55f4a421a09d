#!/bin/bash
# 400k-iteration reference-schedule run (VERDICT r3 item 1) with
# auto-restart: train_real.py auto-resumes from the latest checkpoint, so
# tunnel outages / OOM kills only cost the iterations since the last
# validation. Reference schedule: /root/reference/diffusion_engine.py
# :52-76,183-209 (400k iters, b128, AdamW 1e-4, MultiStepLR
# 100k/200k/350k gamma 0.2, EMA 0.995 from 20k).
#
# Usage: bash scripts/run_400k.sh [max_restarts]
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=runs/real_train_wald
ITERS=${ITERS:-400000}
MAX_RESTARTS=${1:-100}
mkdir -p "$OUT"
for i in $(seq 1 "$MAX_RESTARTS"); do
  if [ -f "$OUT/DONE.json" ]; then
    echo "[run_400k] DONE.json present — finished"; break
  fi
  echo "[run_400k] launch attempt $i/$MAX_RESTARTS $(date -u +%FT%TZ)" \
      | tee -a "$OUT/restarts.log"
  python scripts/train_real.py \
      --iters "$ITERS" --data wald --n-train 8192 --n-valid 64 \
      --steps-per-call 50 --valid-every 5000 \
      --out "$OUT" >> "$OUT/driver.log" 2>&1
  rc=$?
  echo "[run_400k] attempt $i exited rc=$rc $(date -u +%FT%TZ)" \
      | tee -a "$OUT/restarts.log"
  [ -f "$OUT/DONE.json" ] && break
  sleep 60
done
