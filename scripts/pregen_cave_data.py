"""Pre-generate the CAVE/MHIF Wald-protocol data cache on the host.

Mirrors scripts/train_real.py's generate-or-load block (same cache path
and key layout) so run_cave_ext.sh can borrow the TPU only for actual
training — generation happens while another run holds the chip.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/real_train_cave")
    ap.add_argument("--n-train", type=int, default=2048)
    ap.add_argument("--n-valid", type=int, default=32)
    args = ap.parse_args()

    cache = os.path.join(
        args.out, f"data_wald_cave_{args.n_train}_{args.n_valid}.npz")
    if os.path.exists(cache):
        print(f"[pregen] cache already present: {cache}")
        return
    os.makedirs(args.out, exist_ok=True)

    from difpan_tpu.data.synthetic import make_wald_hisr_h5
    gen = lambda n, seed: make_wald_hisr_h5(n=n, bands=31, size=64,
                                            seed=seed)
    d_train, d_valid = gen(args.n_train, 42), gen(args.n_valid, 43)
    np.savez(cache, **{f"train_{k}": v for k, v in d_train.items()},
             **{f"valid_{k}": v for k, v in d_valid.items()})
    print(f"[pregen] cached data -> {cache}")


if __name__ == "__main__":
    main()
