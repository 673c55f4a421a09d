#!/bin/bash
# Post-training artifact regeneration (run AFTER scripts/train_real.py
# completes; serialized — the 1-core host and single TPU chip can't overlap
# these). Produces: RUN.md, PARITY_E2E.md, NFE_STUDY.md, BENCH_EXTRA.json.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

RUN=${RUN:-runs/real_train_wald}
STEP=$(ls "$RUN/weights" | sort -n | tail -1)

echo "=== 1/4 RUN.md ==="
python scripts/run_report.py --run "$RUN" --out RUN.md

echo "=== 2/4 PARITY_E2E.md (CPU, torch reference side) ==="
python scripts/parity_protocol_e2e.py --weights "$RUN/weights" \
    --desc "scripts/train_real.py 400k-schedule run at step $STEP (batch 128, 64px wv3, Wald-protocol data, bf16, MultiStepLR 100k/200k/350k)"

echo "=== 3/4 NFE_STUDY.md (TPU) ==="
python scripts/nfe_study.py --weights "$RUN/weights"

echo "=== 4/4 BENCH_EXTRA.json (TPU) ==="
python scripts/bench_extra.py

echo "=== post_train done ==="
