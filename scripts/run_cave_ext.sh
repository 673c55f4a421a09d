#!/bin/bash
# CAVE/MHIF family run past the EMA start (VERDICT r3 item 4): 16000
# iters with ema_start 4000 (lowered vs the reference's 20k and STATED
# here and in RUN_CONFIG.json — the r3 critique was the lowering being
# undocumented, not the lowering itself), then regenerate the full-res
# Harvard-shaped whole-image demo from the EMA weights. The round-3 CAVE
# checkpoint was lost to the 08-18 VM reset, so this trains from scratch
# on the round-4 structured Wald HISR data (the discriminative set).
# Borrows the chip from the 400k run via its cooperative PAUSE file and
# returns it afterwards. This runner honors the same protocol itself:
# it writes runs/real_train_cave/train.pid and stops its trainer when a
# PAUSE file appears there (bench.py's pause_local_training relies on
# both), resuming from the orbax checkpoint once PAUSE is removed.
# Pre-generate the data cache with scripts/pregen_cave_data.py so the
# borrowed-chip window is training only.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
WALD=runs/real_train_wald
OUT=runs/real_train_cave
ITERS=${ITERS:-16000}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-40}
mkdir -p "$OUT"

echo "[cave_ext] pausing the 400k run"
touch "$WALD/PAUSE"
# wait for the wald trainer to exit (watchdog kills it within ~2 min)
for i in $(seq 1 30); do
  pid=$(cat "$WALD/train.pid" 2>/dev/null || echo "")
  [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null || break
  sleep 10
done

# a DONE.json from an earlier, SHORTER completed run must not
# short-circuit an extension to a larger ITERS (ADVICE r4 medium: the
# loop no-oped and re-snapshotted the old checkpoint). train_real.py now
# only writes DONE.json on true completion, but old files may linger.
if [ -f "$OUT/DONE.json" ]; then
  prev=$(python -c "import json;print(json.load(open('$OUT/DONE.json'))\
.get('final_step',0))" 2>/dev/null || echo 0)
  if [ "$prev" -lt "$ITERS" ]; then
    echo "[cave_ext] stale DONE.json (final_step=$prev < $ITERS) — removing"
    rm -f "$OUT/DONE.json"
  fi
fi

echo "[cave_ext] training cave to $ITERS"
i=0
while [ "$i" -lt "$MAX_ATTEMPTS" ]; do
  [ -f "$OUT/DONE.json" ] && break
  while [ -f "$OUT/PAUSE" ]; do sleep 15; done
  python scripts/train_real.py \
      --family cave --data wald --iters "$ITERS" --batch-size 32 \
      --n-train 2048 --n-valid 32 --valid-every 1000 --ema-start 4000 \
      --steps-per-call 25 --out "$OUT" >> "$OUT/driver.log" 2>&1 &
  pid=$!
  echo "$pid" > "$OUT/train.pid"
  paused=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 20
    if [ -f "$OUT/PAUSE" ]; then
      echo "[cave_ext] PAUSE requested — stopping $pid"
      paused=1
      # long grace: SIGKILL mid-validation can strand a checkpoint
      # without its valid.jsonl row (ADVICE r4; the engine also now
      # writes the metrics row before the save)
      kill "$pid" 2>/dev/null; sleep 60
      kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  rc=$?
  # PAUSE-initiated exits don't consume the attempt budget: repeated
  # bench borrows must not abandon a healthy run (ADVICE r4)
  if [ "$paused" -eq 0 ]; then i=$((i + 1)); fi
  echo "[cave_ext] attempt $i (paused=$paused) exited rc=$rc"
  [ -f "$OUT/DONE.json" ] && break
  sleep 30
done

if [ -f "$OUT/DONE.json" ]; then
  echo "[cave_ext] durable snapshot"
  bash scripts/snapshot_ckpt.sh "$OUT" cave
  echo "[cave_ext] regenerating the whole-image full-res demo"
  timeout 3600 python scripts/fullres_demo.py --whole-image \
      --weights "$OUT/weights" --out runs/fullres_whole.json
  echo "[cave_ext] demo rc=$?"
else
  echo "[cave_ext] not finished after $MAX_ATTEMPTS attempts — snapshotting progress"
  bash scripts/snapshot_ckpt.sh "$OUT" cave || true
fi

echo "[cave_ext] resuming the 400k run"
rm -f "$WALD/PAUSE"
