#!/bin/bash
# Snapshot the latest orbax checkpoint of a run into the git-tracked
# ckpts/ directory and commit it.
#
# Why: `runs/` is gitignored, and only git-tracked content survives a VM
# reset in this environment — the 2026-08-18 08:32 UTC reset wiped the
# round-3 checkpoints (47.5k-iter WV3 run + the CAVE run). A long run
# (the 400k reference schedule is ~19 h at 5.9 it/s) must be able to
# resume from a durable snapshot, not restart from scratch.
#
# Retention (VERDICT r4 item 6): the working tree keeps the LATEST
# checkpoint plus a milestone ladder (steps divisible by LADDER_EVERY,
# default 25k) so retrospective studies (learning curves, NFE re-bases)
# survive resets; other superseded steps are pruned from the tree but
# remain in git history. Run logs (scalars/valid JSONL, RUN_CONFIG) ride
# along — they're small and make the snapshot self-describing. The
# checkpoint lives under ckpt/ (not weights/ — that name is gitignored).
# To resume from a snapshot after a reset:
#   mkdir -p runs/<run> && cp -r ckpts/<name>/ckpt runs/<run>/weights
#   (train_real.py auto-resumes from the latest step in weights/)
#
# RUN.md regeneration (VERDICT r4 item 5): every snapshot of the wald run
# re-runs scripts/run_report.py so the committed report can never go
# stale relative to the durable JSONLs (round 4 shipped a RUN.md that
# said 6100/400k with one validation row while valid.jsonl held 25k and
# the degrading trend).
#
# Usage: bash scripts/snapshot_ckpt.sh [run_dir] [name]
set -eu
cd "$(dirname "$0")/.."
RUN=${1:-runs/real_train_wald}
NAME=${2:-wald}
DST="ckpts/$NAME"
LADDER_EVERY=${LADDER_EVERY:-25000}

latest=$(ls "$RUN/weights" | sort -n | tail -1)
[ -n "$latest" ] || { echo "no checkpoint in $RUN/weights"; exit 1; }

# orbax writes atomically (tmp dir + rename), so the latest completed
# step dir is safe to copy while training continues
rm -rf "$DST.tmp"
mkdir -p "$DST.tmp/ckpt"
cp -r "$RUN/weights/$latest" "$DST.tmp/ckpt/$latest"
# carry over previously snapshotted milestone steps (ladder retention)
if [ -d "$DST/ckpt" ]; then
  for d in "$DST"/ckpt/*; do
    s=$(basename "$d")
    [ "$s" = "$latest" ] && continue
    if [ $((s % LADDER_EVERY)) -eq 0 ]; then
      mv "$d" "$DST.tmp/ckpt/$s"
    fi
  done
fi
for f in scalars.jsonl valid.jsonl RUN_CONFIG.json restarts.log; do
  [ -f "$RUN/$f" ] && cp "$RUN/$f" "$DST.tmp/$f"
done
rm -rf "$DST"
mv "$DST.tmp" "$DST"

# regenerate the committed run report from the durable JSONLs so it
# cannot go stale (wald drives RUN.md; other runs only snapshot)
if [ "$NAME" = "wald" ]; then
  PYTHONPATH=/root/repo python scripts/run_report.py --run "$RUN" \
    --out RUN.md && git add RUN.md || true
fi

git add -A "$DST"
git commit -m "ckpts/$NAME: durable snapshot at step $latest" \
  -- "$DST" RUN.md \
  || echo "[snapshot] nothing to commit"
echo "[snapshot] $NAME @ step $latest ($(du -sh "$DST" | cut -f1); \
ladder: $(ls "$DST/ckpt" | tr '\n' ' '))"
