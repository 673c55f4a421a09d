"""Convert reference PyTorch checkpoints (294coder/Dif-PAN layout) to
difpan_tpu flax params.

Lets users of the reference bring their trained UNetSR3 (dwt) weights
(`torch.save(state_dict)` files written by `diffusion_engine.py:333-341`)
straight onto TPU. Pure numpy — torch is only needed to `torch.load` the
file, and only imported then.

Layout rules:
  * conv weight OIHW -> HWIO (also covers depthwise convs: (C,1,kh,kw) ->
    (kh,kw,1,C));
  * linear weight (out,in) -> (in,out);
  * GroupNorm/LayerNorm weight -> scale;
  * reference `module.` prefixes (DataParallel leftovers, `utils/misc.py:110-115`)
    are stripped.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Sequence, Tuple

import numpy as np


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value
    return tree


def _convert_value(torch_key: str, v: np.ndarray) -> Tuple[str, np.ndarray]:
    """Map (torch param name, value) -> (flax leaf name, transformed value)."""
    leaf = torch_key.rsplit(".", 1)[-1]
    if leaf == "weight":
        if v.ndim == 4:        # conv OIHW -> HWIO
            return "kernel", np.transpose(v, (2, 3, 1, 0))
        if v.ndim == 2:        # linear (out,in) -> (in,out)
            return "kernel", np.transpose(v, (1, 0))
        return "scale", v      # norm scale
    return "bias", v


def _sr3_dwt_index_maps(channel_mults: Sequence[int], res_blocks: int):
    """Sequential torch ModuleList indices -> our named modules
    (`models/sr3_dwt.py:86-159` construction order)."""
    downs = {0: ("head_conv", "conv")}
    i = 1
    num = len(channel_mults)
    for ind in range(num):
        for blk in range(res_blocks):
            downs[i] = (f"down_{ind}_{blk}",)
            i += 1
        if ind != num - 1:
            downs[i] = (f"downsample_{ind}", "conv", "conv")
            i += 1
    ups = {}
    i = 0
    for ind in reversed(range(num)):
        for blk in range(res_blocks + 1):
            ups[i] = (f"up_{ind}_{blk}",)
            i += 1
        if ind >= 1:
            ups[i] = (f"upsample_{ind}", "conv", "conv")
            i += 1
    return downs, ups


# Suffix translation inside a ResnetBlocWithAttn (either variant).
_BLOCK_RULES = [
    (r"^res_block\.block1\.block\.0$", ("res_block", "block1", "norm")),
    (r"^res_block\.block1\.block\.3$", ("res_block", "block1", "conv", "conv")),
    (r"^res_block\.block2\.block\.0$", ("res_block", "block2", "norm")),
    (r"^res_block\.block2\.block\.3$", ("res_block", "block2", "conv", "conv")),
    (r"^res_block\.noise_func\.noise_func\.0$",
     ("res_block", "noise_func", "noise_func", "dense")),
    (r"^res_block\.res_conv$", ("res_block", "res_conv", "conv")),
    (r"^attn\.norm$", ("attn", "norm")),
    (r"^attn\.qkv$", ("attn", "qkv", "conv")),
    (r"^attn\.out$", ("attn", "out", "conv")),
    # CSM CondInjection
    (r"^cond_inj\.body\.0$", ("cond_inj", "body_conv1", "conv")),
    (r"^cond_inj\.body\.1$", ("cond_inj", "body_norm")),
    (r"^cond_inj\.body\.3$", ("cond_inj", "body_conv2")),
    (r"^cond_inj\.x_conv$", ("cond_inj", "x_conv", "conv")),
    # FWM FastAttnCondInjection
    (r"^cond_inj\.prenorm_x$", ("cond_inj", "prenorm_x")),
    (r"^cond_inj\.q\.0$", ("cond_inj", "q_dw", "conv")),
    (r"^cond_inj\.q\.1$", ("cond_inj", "q_pw", "conv")),
    (r"^cond_inj\.kv\.0$", ("cond_inj", "kv_dw", "conv")),
    (r"^cond_inj\.kv\.1$", ("cond_inj", "kv_pw", "conv")),
    (r"^cond_inj\.attn_out$", ("cond_inj", "attn_out", "conv")),
    (r"^cond_inj\.attn_res$", ("cond_inj", "attn_res", "conv")),
    (r"^cond_inj\.ffn\.0$", ("cond_inj", "ffn_conv1", "conv")),
    (r"^cond_inj\.ffn\.2$", ("cond_inj", "ffn_conv2", "conv")),
    (r"^cond_inj\.ffn\.3$", ("cond_inj", "ffn_conv3", "conv")),
]


def _translate_block_suffix(suffix: str) -> Tuple[str, ...]:
    for pat, path in _BLOCK_RULES:
        if re.match(pat, suffix):
            return path
    raise KeyError(f"unmapped block param: {suffix}")


def convert_sr3_dwt_state_dict(
    state_dict: Mapping[str, Any],
    channel_mults: Sequence[int] = (1, 2, 2, 4),
    res_blocks: int = 3,
) -> Dict[str, Any]:
    """Reference `UNetSR3` (sr3_dwt) state_dict -> flax params tree for
    `difpan_tpu.models.UNetSR3DWT` (wrap as {'params': tree} for .apply)."""
    downs_map, ups_map = _sr3_dwt_index_maps(channel_mults, res_blocks)
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for key, val in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        v = np.asarray(val.detach().cpu().numpy()
                       if hasattr(val, "detach") else val)
        mod_key, param_name = key.rsplit(".", 1)
        leaf, v = _convert_value(key, v)

        if mod_key.startswith("noise_level_mlp."):
            idx = int(mod_key.split(".")[1])
            path = ("noise_level_mlp", {1: "lin1", 3: "lin2"}[idx], "dense")
        elif mod_key.startswith("final_conv.block."):
            idx = int(mod_key.split(".")[2])
            path = (("final_conv", "norm") if idx == 0
                    else ("final_conv", "conv", "conv"))
        elif mod_key.startswith(("downs.", "ups.", "mid.")):
            parts = mod_key.split(".")
            seq, idx = parts[0], int(parts[1])
            suffix = ".".join(parts[2:])
            if seq == "mid":
                prefix = (f"mid_{idx}",)
            elif seq == "downs":
                prefix = downs_map[idx]
            else:
                prefix = ups_map[idx]
            if len(prefix) > 1:  # head_conv / down-/upsample raw conv
                path = prefix
            else:
                path = prefix + _translate_block_suffix(suffix)
        else:
            raise KeyError(f"unmapped reference param: {key}")
        flat[path + (leaf,)] = v
    return _unflatten(flat)


def _flatten(tree: Mapping[str, Any], prefix: Tuple[str, ...] = ()
             ) -> Dict[Tuple[str, ...], np.ndarray]:
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            flat.update(_flatten(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = np.asarray(v)
    return flat


def convert_to_reference_state_dict(
    params: Mapping[str, Any],
    channel_mults: Sequence[int] = (1, 2, 2, 4),
    res_blocks: int = 3,
) -> Dict[str, np.ndarray]:
    """Inverse of `convert_sr3_dwt_state_dict`: difpan_tpu UNetSR3DWT params
    -> reference-layout torch state_dict (numpy values; wrap with
    torch.tensor for torch.save). Lets TPU-trained weights flow back into
    the reference ecosystem."""
    downs_map, ups_map = _sr3_dwt_index_maps(channel_mults, res_blocks)
    # invert prefix maps: flax first-component -> (torch seq prefix, rest)
    prefix_inv: Dict[Tuple[str, ...], str] = {}
    for idx, path in downs_map.items():
        prefix_inv[path] = f"downs.{idx}"
    for idx, path in ups_map.items():
        prefix_inv[path] = f"ups.{idx}"
    suffix_inv = {path: pat.strip("^$").replace("\\", "")
                  for pat, path in _BLOCK_RULES}

    out: Dict[str, np.ndarray] = {}
    for path, v in _flatten(params).items():
        mod_path, leaf = path[:-1], path[-1]
        if leaf == "kernel":
            if v.ndim == 4:
                tv, pname = np.transpose(v, (3, 2, 0, 1)), "weight"
            else:
                tv, pname = np.transpose(v, (1, 0)), "weight"
        elif leaf == "scale":
            tv, pname = v, "weight"
        else:
            tv, pname = v, "bias"

        head = mod_path[0]
        if head == "noise_level_mlp":
            idx = {"lin1": 1, "lin2": 3}[mod_path[1]]
            key = f"noise_level_mlp.{idx}.{pname}"
        elif head == "final_conv":
            key = ("final_conv.block.0" if mod_path[1] == "norm"
                   else "final_conv.block.3") + f".{pname}"
        elif head == "head_conv":
            key = f"downs.0.{pname}"
        elif head.startswith("mid_"):
            seq = f"mid.{head.split('_')[1]}"
            key = f"{seq}.{suffix_inv[mod_path[1:]]}.{pname}"
        elif head.startswith(("downsample_", "upsample_")):
            seq = prefix_inv[(head, "conv", "conv")]
            key = f"{seq}.conv.{pname}"
        elif head.startswith(("down_", "up_")):
            seq = prefix_inv[(head,)]
            key = f"{seq}.{suffix_inv[mod_path[1:]]}.{pname}"
        else:
            raise KeyError(f"unmapped flax module: {'/'.join(path)}")
        out[key] = tv
    return out


def load_reference_checkpoint(path: str, **kwargs) -> Dict[str, Any]:
    """torch.load + convert in one call (strips DataParallel prefixes like
    the reference's `model_load`, `utils/misc.py:89-133`)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_sr3_dwt_state_dict(sd, **kwargs)
