#!/bin/bash
# Snapshot a run's latest checkpoint into the git-tracked ckpts/ dir and
# commit it. Only git-tracked content survives a VM reset here (the
# 2026-08-18 and 2026-08-20 resets both wiped runs/), so durable
# snapshots are what long runs resume from.
#
# Round-6 rewrite (VERDICT r5 items 3+5, ADVICE r5):
#  - NON-DESTRUCTIVE: the old version did `rm -rf "$DST"` and re-populated
#    a 4-file whitelist, which silently deleted the evidence files the
#    studies cite (x0_probe.json, baseline_s43.json, archive_multisensor/).
#    Now we only ever ADD to $DST and prune a known set (superseded
#    non-ladder FULL checkpoints), guarded by a KEEP manifest.
#  - SLIM PAYLOAD: at the 5k cadence we commit only an EMA-params extract
#    (~14 MB compressed, scripts/extract_ema.py) — all studies consume
#    EMA params only. The FULL resumable state (params+AdamW+EMA, ~148 MB)
#    is committed only at ladder milestones (step % LADDER_EVERY == 0).
#    Resume-after-reset restores the newest full-state ladder step and
#    loses at most LADDER_EVERY-1 iterations (the accepted trade).
#  - CITED-PATH GUARD: refuses to commit if any study-cited path is
#    missing from the tree, so this failure mode cannot recur.
#
# To resume from a snapshot after a reset:
#   mkdir -p runs/<run>/weights && cp -r ckpts/<name>/ckpt/<latest> \
#       runs/<run>/weights/<latest>
#   (train_real.py auto-resumes from the latest step in weights/)
#
# Usage: bash scripts/snapshot_ckpt.sh [run_dir] [name]
set -eu
cd "$(dirname "$0")/.."
RUN=${1:-runs/real_train_wald}
NAME=${2:-wald}
DST="ckpts/$NAME"
LADDER_EVERY=${LADDER_EVERY:-25000}

latest=$(ls "$RUN/weights" | grep -E '^[0-9]+$' | sort -n | tail -1)
[ -n "$latest" ] || { echo "no checkpoint in $RUN/weights"; exit 1; }

mkdir -p "$DST/ckpt" "$DST/ema"

# EMA-only extract at every cadence step (studies consume this)
if [ ! -f "$DST/ema/$latest.npz" ]; then
  PYTHONPATH=/root/repo python scripts/extract_ema.py \
    "$RUN/weights/$latest" "$DST/ema/$latest.npz"
fi

# FULL state only at ladder milestones (orbax writes atomically — the
# completed step dir is safe to copy while training continues)
if [ $((latest % LADDER_EVERY)) -eq 0 ] && [ ! -d "$DST/ckpt/$latest" ]; then
  cp -r "$RUN/weights/$latest" "$DST/ckpt/$latest.tmp"
  mv "$DST/ckpt/$latest.tmp" "$DST/ckpt/$latest"
fi

# prune superseded non-ladder FULL checkpoints from the tree (they stay
# in git history) — but NEVER a step listed in the KEEP manifest
# (e.g. 105000 = the best-x0 checkpoint, ADVICE r5)
touch "$DST/KEEP"
for d in "$DST"/ckpt/*/; do
  [ -d "$d" ] || continue
  s=$(basename "$d")
  [ "$s" = "$latest" ] && continue
  grep -qx "$s" "$DST/KEEP" && continue
  if [ $((s % LADDER_EVERY)) -ne 0 ]; then
    git rm -r -q --cached "$d" 2>/dev/null || true
    rm -rf "$d"
  fi
done

# run logs ride along — small, and they make the snapshot self-describing
for f in scalars.jsonl valid.jsonl RUN_CONFIG.json restarts.log; do
  [ -f "$RUN/$f" ] && cp "$RUN/$f" "$DST/$f"
done

# regenerate the committed run report from the durable JSONLs so it
# cannot go stale (wald drives RUN.md; other runs only snapshot)
if [ "$NAME" = "wald" ]; then
  PYTHONPATH=/root/repo python scripts/run_report.py --run "$RUN" \
    --out RUN.md && git add RUN.md || true
fi

# cited-path guard: every ckpts/ path a committed study cites must exist
missing=0
for p in ckpts/wald/x0_probe.json ckpts/wald/baseline_s43.json ckpts/wald/x0_drift_ema.json \
         ckpts/wald/x0_drift_raw.json \
         ckpts/wald/archive_multisensor ckpts/wald/valid.jsonl \
         ckpts/wald/scalars.jsonl; do
  [ -e "$p" ] || { echo "[snapshot] GUARD: cited path missing: $p"; missing=1; }
done
[ "$missing" -eq 0 ] || { echo "[snapshot] refusing to commit"; exit 1; }

git add -A "$DST"
git commit -m "ckpts/$NAME: durable snapshot at step $latest" \
  -- "$DST" RUN.md \
  || echo "[snapshot] nothing to commit"
echo "[snapshot] $NAME @ step $latest ($(du -sh "$DST" | cut -f1); \
full: $(ls "$DST/ckpt" | tr '\n' ' '); ema: $(ls "$DST/ema" | wc -l) extracts)"
