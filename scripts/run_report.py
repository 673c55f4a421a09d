"""Generate RUN.md from a scripts/train_real.py output directory.

Collects the loss trajectory (scalars.jsonl), the validation metric
trajectory + EMA phase evidence (valid.jsonl) and the completion record
(DONE.json) into one committed report — the proof that the system trains
through the reference schedule (EMA start at 20k, MultiStepLR drops at
100k/200k/350k — the `lr` column of the validation table shows the
milestones being crossed), not just that the math matches.

The run's config is read from its RUN_CONFIG.json (written at launch by
train_real.py) so the report describes what actually ran. Everything at
and below the `<!-- MANUAL -->` marker in the existing --out file is
preserved verbatim — hand-written narrative (outage windows, archive of
earlier runs) survives regeneration.

Usage: python scripts/run_report.py --run runs/real_train_wald --out RUN.md
"""

from __future__ import annotations

import argparse
import json
import os

MARKER = "<!-- MANUAL -->"


def read_jsonl(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def subsample(rows, max_rows=45):
    """First + last + evenly spaced marks, snapped to round step numbers."""
    if len(rows) <= max_rows:
        return rows
    last = rows[-1]["step"]
    # round the stride up to a clean multiple of 1000
    stride = -(-last // (max_rows - 2))
    stride = -(-stride // 1000) * 1000
    keep = {rows[0]["step"], last}
    keep.update(r["step"] for r in rows if r["step"] % stride == 0)
    return [r for r in rows if r["step"] in keep]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/real_train_wald")
    ap.add_argument("--out", default="RUN.md")
    args = ap.parse_args()

    def dedupe(rows):
        # auto-resumed segments re-log the steps between the restored
        # checkpoint and where the previous segment died; keep the LAST
        # record per step (the one whose lineage continued)
        by_step = {r["step"]: r for r in rows}
        return [by_step[s] for s in sorted(by_step)]

    scalars = dedupe(read_jsonl(os.path.join(args.run, "scalars.jsonl")))
    valids = dedupe(read_jsonl(os.path.join(args.run, "valid.jsonl")))
    done, cfg = {}, {}
    done_path = os.path.join(args.run, "DONE.json")
    if os.path.exists(done_path):
        try:
            done = json.load(open(done_path))
        except json.JSONDecodeError:  # mid-write / truncated
            done = {}
    cfg_path = os.path.join(args.run, "RUN_CONFIG.json")
    if os.path.exists(cfg_path):
        cfg = json.load(open(cfg_path))

    family = cfg.get("family", "wv3")
    data = cfg.get("data", "smooth")
    data_desc = {
        "wald": "structured Wald-protocol scenes (edges/textures/"
                "materials, MTF-matched degradation; `data/synthetic.py` "
                "`make_wald_*`)",
        "smooth": "band-limited smooth fixtures (`data/synthetic.py`)",
    }[data]
    lines = [
        "# RUN — the reference training schedule on TPU",
        "",
        f"Engine: `difpan_tpu.train.engine.train` at the reference "
        f"training config (`/root/reference/diffusion_engine.py:52-76,"
        f"183-209`): {family}, batch {cfg.get('batch_size', 128)}, 64px, "
        f"cosine T=3000, AdamW {cfg.get('lr', 1e-4)} + MultiStepLR"
        f"({cfg.get('lr_milestones', [100000, 200000, 350000])}, "
        f"gamma {cfg.get('lr_gamma', 0.2)}), grad-clip 0.003, "
        f"{cfg.get('compute_dtype', 'bfloat16')} compute / f32 master, "
        f"EMA decay {cfg.get('ema_decay', 0.995)} from iteration "
        f"{cfg.get('ema_start_iter', 20000)}, target "
        f"{cfg.get('iters', 400000)} iterations. Data: {data_desc}; real "
        f"h5 sets are not mounted in this environment; train "
        f"n={cfg.get('n_train', '?')} (seed 42), valid "
        f"n={cfg.get('n_valid', '?')} (seed 43). Harness: "
        f"`scripts/train_real.py` via `scripts/run_400k.sh` (auto-resume "
        f"from the orbax checkpoint, stale-progress watchdog, cooperative "
        f"PAUSE; loss/valid teed to JSONL; durable snapshots in "
        f"`ckpts/` via `scripts/snapshot_ckpt.sh`).",
        "",
    ]
    last_step = scalars[-1]["step"] if scalars else 0
    if done and done.get("final_step", 0) >= last_step:
        lines += [
            f"**Completed**: {done['final_step']} iterations "
            f"({done['wall_h']:.2f} h wall for the final auto-resumed "
            "segment) on the single tunnel TPU chip "
            f"(final EMA-to-params L2 distance {done['ema_l2']:.4f}).",
            "",
        ]
    elif scalars:
        # the run is live or was ended by a wall-clock bound: report the
        # true frontier; checkpoints are saved at every validation
        target = cfg.get("iters", 400_000)
        lines += [
            f"**Progress**: {last_step} / {target} iterations "
            f"({100 * last_step / target:.1f}%) on the single tunnel TPU "
            "chip (checkpointed at every validation, auto-resumable; "
            "full tables in the JSONLs under `ckpts/wald/`).",
            "",
        ]

    if scalars:
        lines += ["## Loss trajectory", "",
                  "| iter | loss (l1, residual) | it/s |", "|---|---|---|"]
        for r in subsample(scalars):
            lines.append(f"| {r['step']} | {r['loss']:.6f} | "
                         f"{r['it_per_s']:.2f} |")
        first, last = scalars[0], scalars[-1]
        lines += [
            "",
            f"Loss {first['loss']:.4f} @ iter {first['step']} -> "
            f"{last['loss']:.4f} @ iter {last['step']}.",
            "",
        ]

    if valids:
        # union of keys across rows, first-seen order: later segments add
        # columns (x0_* posterior-mean metrics) that early rows lack
        keys = []
        for r in valids:
            for k in r:
                if k not in ("step", "ema_l2", "ema_phase") and k not in keys:
                    keys.append(k)
        lines += [
            "## Validation trajectory (DDIM-25 protocol on EMA params; "
            "x0_* = one-shot posterior-mean NFE=1 distortion metrics. "
            "The two lenses answer different questions and since the "
            "100k LR drop they move in OPPOSITE directions — protocol "
            "improving, x0 drifting up from its 105k minimum — which is "
            "the model sharpening toward the conditional median, not "
            "degrading; see X0_STUDY.md round-6 addendum)",
            "",
            "| iter | " + " | ".join(keys) + " | EMA phase | EMA-params L2 |",
            "|---|" + "---|" * (len(keys) + 2),
        ]
        for r in subsample(valids):
            vals = " | ".join(
                "—" if k not in r
                else f"{r[k]:.4g}" if k == "lr" or isinstance(r[k], int)
                else f"{r[k]:.4f}"
                for k in keys)
            lines.append(f"| {r['step']} | {vals} | {r['ema_phase']} | "
                         f"{r['ema_l2']:.4f} |")
        decay = [r for r in valids if r["ema_phase"] == "decay"]
        copy = [r for r in valids if r["ema_phase"] == "copy"]
        lines += [
            "",
            "## EMA decay-phase evidence",
            "",
            f"Until iteration {cfg.get('ema_start_iter', 20000)} the EMA "
            "is a plain copy (`utils/optim_utils.py:43-58` parity -> "
            "`train/state.py`): EMA-params L2 distance is exactly 0. "
            "After that the decay mix "
            f"({cfg.get('ema_decay', 0.995)}) engages and the EMA trails "
            "the raw params at a nonzero, shrinking-towards-steady-state "
            "distance:",
            "",
        ]
        if copy:
            lines.append(
                f"* copy phase: {len(copy)} validations, max L2 = "
                f"{max(r['ema_l2'] for r in copy):.2e} (exactly 0 "
                "expected)")
        if decay:
            lines.append(
                f"* decay phase: {len(decay)} validations, L2 in "
                f"[{min(r['ema_l2'] for r in decay):.4f}, "
                f"{max(r['ema_l2'] for r in decay):.4f}] — the EMA is "
                "genuinely averaging, no longer copying")
        milestones = [m for m in cfg.get("lr_milestones", [])
                      if m <= last_step]
        if milestones:
            lines.append(
                f"* MultiStepLR milestones crossed: {milestones} — the "
                "`lr` column shows each gamma-0.2 drop taking effect")
        lines.append("")

    manual = ""
    if os.path.exists(args.out):
        prev = open(args.out).read()
        if MARKER in prev:
            manual = prev[prev.index(MARKER):]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n" + manual)
    print(f"wrote {args.out} ({len(scalars)} loss points, "
          f"{len(valids)} validations)")


if __name__ == "__main__":
    main()
