"""EMA-extract snapshot payload (scripts/extract_ema.py).

The 5k-cadence durable snapshots commit only this compressed EMA-params
extract (VERDICT r5 item 5); the studies load it back with
`load_ema_npz`. Round-trip fidelity is what makes the slim payload a
safe substitute for the full orbax state in every study that consumes
EMA params."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from extract_ema import _flatten, _unflatten, load_ema_npz  # noqa: E402


def _tree():
    rng = np.random.default_rng(0)
    return {
        "encoder": {
            "conv0": {"kernel": rng.normal(size=(3, 3, 4, 8)).astype(
                np.float32), "bias": np.zeros((8,), np.float32)},
            "gn": {"scale": np.ones((8,), np.float32)},
        },
        "final": {"kernel": rng.normal(size=(1, 1, 8, 4)).astype(
            np.float32)},
    }


def test_flatten_unflatten_roundtrip():
    t = _tree()
    flat = _flatten(t)
    assert set(flat) == {"encoder/conv0/kernel", "encoder/conv0/bias",
                         "encoder/gn/scale", "final/kernel"}
    back = _unflatten(flat)
    assert set(back) == set(t)
    np.testing.assert_array_equal(back["encoder"]["conv0"]["kernel"],
                                  t["encoder"]["conv0"]["kernel"])


def test_npz_roundtrip_exact(tmp_path):
    t = _tree()
    p = str(tmp_path / "ema.npz")
    np.savez_compressed(p, **_flatten(t))
    back = load_ema_npz(p)
    flat_a, flat_b = _flatten(t), _flatten(back)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])
        assert flat_a[k].dtype == flat_b[k].dtype
