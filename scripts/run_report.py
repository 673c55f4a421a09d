"""Generate RUN.md from a scripts/train_real.py output directory.

Collects the loss trajectory (scalars.jsonl), the validation metric
trajectory + EMA phase evidence (valid.jsonl) and the completion record
(DONE.json) into one committed report — the proof that the system trains
through the EMA start iteration, not just that the math matches
(VERDICT r2 item 1).

Usage: python scripts/run_report.py --run runs/real_train --out RUN.md
"""

from __future__ import annotations

import argparse
import json
import os


def read_jsonl(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/real_train")
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
    done = {}
    done_path = os.path.join(args.run, "DONE.json")
    if os.path.exists(done_path):
        try:
            done = json.load(open(done_path))
        except json.JSONDecodeError:  # mid-write / truncated
            done = {}

    lines = [
        "# RUN — long training past the EMA start iteration",
        "",
        "Engine: `difpan_tpu.train.engine.train` at the reference training "
        "config (`/root/reference/diffusion_engine.py:52-76,183-209`): "
        "batch 128, 64px WV3 8-band, cosine T=3000, AdamW 1e-4 + "
        "MultiStepLR, grad-clip 0.003, bf16 compute / f32 master, "
        "EMA decay 0.995 starting at iteration 20k. Data: synthetic WV3 "
        "fixtures (`data/synthetic.py`; real h5 sets are not mounted in "
        "this environment), train n=4096 (seed 42), valid n=64 (seed 43). "
        "Harness: `scripts/train_real.py` (auto-resume from the orbax "
        "checkpoint; loss/valid teed to JSONL).",
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
        # DONE.json is stale (an auto-resumed segment was ended by a
        # wall-clock bound after the recorded completion): report the true
        # frontier; checkpoints are saved at every validation, so the run
        # resumes from the last validated step
        lines += [
            f"**Progress**: {last_step} iterations on the single tunnel "
            "TPU chip; the latest segment was ended by its wall-clock "
            "bound (checkpointed at every validation, auto-resumable).",
            "",
        ]

    if scalars:
        lines += ["## Loss trajectory", "",
                  "| iter | loss (l1, residual) | it/s |", "|---|---|---|"]
        # first, then every ~1000, then last
        marks = {scalars[0]["step"], scalars[-1]["step"]}
        marks.update(r["step"] for r in scalars if r["step"] % 1000 == 0)
        for r in scalars:
            if r["step"] in marks:
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
        keys = [k for k in valids[0]
                if k not in ("step", "ema_l2", "ema_phase")]
        lines += [
            "## Validation trajectory (DDIM-25 protocol on EMA params)",
            "",
            "| iter | " + " | ".join(keys) + " | EMA phase | EMA-params L2 |",
            "|---|" + "---|" * (len(keys) + 2),
        ]
        for r in valids:
            vals = " | ".join(f"{r[k]:.4f}" for k in keys)
            lines.append(f"| {r['step']} | {vals} | {r['ema_phase']} | "
                         f"{r['ema_l2']:.4f} |")
        decay = [r for r in valids if r["ema_phase"] == "decay"]
        copy = [r for r in valids if r["ema_phase"] == "copy"]
        lines += [
            "",
            "## EMA decay-phase evidence",
            "",
            "Until iteration 20k the EMA is a plain copy "
            "(`utils/optim_utils.py:43-58` parity -> `train/state.py`): "
            "EMA-params L2 distance is exactly 0. After 20k the decay mix "
            "(0.995) engages and the EMA trails the raw params at a "
            "nonzero, shrinking-towards-steady-state distance:",
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
        lines.append("")

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} ({len(scalars)} loss points, "
          f"{len(valids)} validations)")


if __name__ == "__main__":
    main()
