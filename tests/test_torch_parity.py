"""Cross-framework parity: convert a reference-layout torch state_dict and
compare forwards bit-closely. Skipped when torch or the reference tree is
unavailable (the hermetic regression golden in test_models.py covers the
same path without them)."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference tree not mounted")


def _shim_timm():
    """The reference imports timm's DropPath; provide a minimal shim."""
    import sys
    import types
    if "timm.models.layers" in sys.modules:
        return
    timm = types.ModuleType("timm")
    timm_m = types.ModuleType("timm.models")
    timm_l = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x  # eval-mode identity is all parity tests need

    timm_l.DropPath = DropPath
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = timm_m
    sys.modules["timm.models.layers"] = timm_l


def test_sr3_dwt_forward_parity_via_weight_conversion():
    import sys
    _shim_timm()
    sys.path.insert(0, REF)
    try:
        from models.sr3_dwt import UNetSR3 as TorchUNet
    finally:
        sys.path.remove(REF)

    import jax
    import jax.numpy as jnp
    from difpan_tpu.models import UNetSR3DWT
    from difpan_tpu.utils.torch_convert import convert_sr3_dwt_state_dict

    torch.manual_seed(0)
    tnet = TorchUNet(in_channel=4, out_channel=4, lms_channel=4,
                     pan_channel=1, inner_channel=32, norm_groups=1,
                     channel_mults=(1, 2, 2, 4), attn_res=(8,), dropout=0.2,
                     image_size=64, self_condition=True)
    tnet.eval()

    x_nchw = np.linspace(-1, 1, 4 * 64 * 64,
                         dtype=np.float32).reshape(1, 4, 64, 64)
    cond_nchw = np.linspace(0, 1, 12 * 64 * 64,
                            dtype=np.float32).reshape(1, 12, 64, 64)
    with torch.no_grad():
        y_ref = tnet(torch.tensor(x_nchw), torch.tensor([7]),
                     torch.tensor(cond_nchw)).numpy()

    params = convert_sr3_dwt_state_dict(tnet.state_dict())
    jnet = UNetSR3DWT(in_channel=4, out_channel=4, lms_channel=4,
                      pan_channel=1, inner_channel=32, norm_groups=1,
                      channel_mults=(1, 2, 2, 4), attn_res=(8,),
                      res_blocks=3, dropout=0.2, image_size=64,
                      self_condition=True)
    x = jnp.transpose(jnp.asarray(x_nchw), (0, 2, 3, 1))
    cond = jnp.transpose(jnp.asarray(cond_nchw), (0, 2, 3, 1))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    y = jnet.apply({"params": params}, x, jnp.array([7]), cond, train=False)
    y_nchw = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(y_nchw, y_ref, atol=5e-5)
