#!/bin/bash
# Watch a run dir and snapshot every new orbax checkpoint into the
# git-tracked ckpts/ dir (see snapshot_ckpt.sh). Survives VM resets:
# only git-tracked content persists in this environment.
# Usage: bash scripts/snapshot_watch.sh [run_dir] [name] [poll_s]
cd "$(dirname "$0")/.."
RUN=${1:-runs/real_train_wald}
NAME=${2:-wald}
POLL=${3:-120}
last=""
while true; do
  sleep "$POLL"
  [ -d "$RUN/weights" ] || continue
  cur=$(ls "$RUN/weights" 2>/dev/null | sort -n | tail -1)
  [ -n "$cur" ] || continue
  if [ "$cur" != "$last" ]; then
    # make sure orbax finished the rename (dir exists, non-tmp)
    if [ -d "$RUN/weights/$cur" ] && [[ "$cur" != *tmp* ]]; then
      bash scripts/snapshot_ckpt.sh "$RUN" "$NAME" \
        >> "$RUN/snapshot_watch.log" 2>&1 && last="$cur"
    fi
  fi
done
