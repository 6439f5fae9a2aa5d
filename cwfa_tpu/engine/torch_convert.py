"""Convert reference PyTorch checkpoints into cwfa_tpu parameter trees.

The reference serializes one torch checkpoint per pyramid step
(networks.py:708-730) containing the FrEIA ``GraphINN`` state dict
('INN_state_dict') and the condition net / LRNN state dict
('condition_state_dict').  This module maps those names onto our functional
param trees so users can bring trained reference models across.

Name map (reference module attribute -> our key):

GraphINN (CAT default graph, networks.py:305-366):
  module_list.<i>.subnet.block1 / block12      -> input/blocks b1
  module_list.<i>.subnet.block{2,4,6}.{0,2}    -> b{2,4,6}{a,b}
  module_list.<i>.subnet.block7.1 / block72.1  -> b7
  module_list.<i>.perm / perm_inv              -> permutation spec overrides

cond_network (networks.py:165-242):
  subnetworks.0.conv1.0 -> conv1 ; subnetworks.0.conv1.1 (PReLU) -> prelu
  subnetworks.0.conv2.0 -> conv2 ; subnetworks.0.downsample.0 -> down
  subnetworks.0.conv3d.0 -> c3a  ; subnetworks.0.conv3d.3 -> c3b

Encoder/LRNN (networks.py:505-584):
  net.deconv.0 -> proj ; net.deconv.1.* (UNet) -> unet.* ;
  net.conv3d.{0,1}.* (ConvNeXt) -> cnx{1,2}.* ; net.attention_3d.m.{0,2} -> attn
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _t(sd, name):
    v = sd[name]
    return jnp.asarray(np.asarray(v, np.float32))


def _conv(sd, prefix):
    p = {"w": _t(sd, prefix + ".weight")}
    if prefix + ".bias" in sd:
        p["b"] = _t(sd, prefix + ".bias")
    return p


def convert_subnet(sd, prefix, first: bool) -> dict:
    """One wavelet_flow_subnetwork2D(_first) (networks.py:608-638)."""
    b1 = "block1" if first else "block12"
    b7 = "block7.1" if first else "block72.1"
    return {
        "b1": _conv(sd, f"{prefix}.{b1}"),
        "b2a": _conv(sd, f"{prefix}.block2.0"),
        "b2b": _conv(sd, f"{prefix}.block2.2"),
        "b4a": _conv(sd, f"{prefix}.block4.0"),
        "b4b": _conv(sd, f"{prefix}.block4.2"),
        "b6a": _conv(sd, f"{prefix}.block6.0"),
        "b6b": _conv(sd, f"{prefix}.block6.2"),
        "b7": _conv(sd, f"{prefix}.{b7}"),
    }


def convert_graph_inn(sd, n_blocks: int, use_final_perm: bool):
    """Full CAT step GraphINN state dict -> (flow params, perm overrides).

    Module order in the reference graph (networks.py:305-366 with topo sort
    preserving construction order for this chain): Haar, Split, CAT_first,
    then n_blocks x (Permute, CAT), optional final PermuteRandom.  Modules
    are located by name pattern rather than fixed indices."""
    subnet_prefixes = sorted(
        {k.rsplit(".subnet.", 1)[0] + ".subnet" for k in sd
         if ".subnet." in k},
        key=lambda s: int(s.split(".")[1]))
    assert len(subnet_prefixes) == n_blocks + 1, (
        f"expected {n_blocks + 1} coupling subnets, found "
        f"{len(subnet_prefixes)}")
    first_prefix = subnet_prefixes[0]
    is_first = any(k.startswith(first_prefix + ".block1.")
                   for k in sd)
    params = {
        "input_block": {"subnet": convert_subnet(
            sd, first_prefix, first=is_first)},
        "blocks": [{"subnet": convert_subnet(sd, p, first=False)}
                   for p in subnet_prefixes[1:]],
    }
    # permutation buffers, in module order
    perm_prefixes = sorted(
        {k.rsplit(".perm", 1)[0] for k in sd
         if k.endswith(".perm") and not k.endswith(".perm_inv")},
        key=lambda s: int(s.split(".")[1]))
    perms = []
    for p in perm_prefixes:
        perm = np.asarray(sd[p + ".perm"], np.int64)
        inv = np.asarray(sd[p + ".perm_inv"], np.int64)
        perms.append((perm.astype(np.int32), inv.astype(np.int32)))
    expected = n_blocks + (1 if use_final_perm else 0)
    if len(perms) != expected:
        raise ValueError(
            f"checkpoint carries {len(perms)} permutation modules but the "
            f"config (n_blocks={n_blocks}, use_final_perm={use_final_perm}) "
            f"expects {expected} — --INN_n_blocks/--INN_use_perm disagree "
            f"with the checkpoint's architecture")
    return params, perms


def apply_perm_overrides(spec, perms):
    """Replace the spec's permutation tables with checkpoint buffers.

    The axis choice of PermuteDim is not serialized by the reference (only
    perm/perm_inv are Parameters, INN_utils.py:70-71); the spec's replayed
    axis is kept — correct whenever the checkpoint was built with the same
    construction-order seeding."""
    import dataclasses
    if len(perms) != len(spec.perms):
        raise ValueError(
            f"checkpoint has {len(perms)} permutation buffers but the "
            f"configured architecture expects {len(spec.perms)} — the "
            f"checkpoint was built with different --INN_n_blocks/"
            f"--INN_use_perm settings (a silent zip would apply wrong "
            f"permutations)")
    new = []
    for entry, (perm, inv) in zip(spec.perms, perms):
        if entry[0] == "channel":
            new.append(("channel", perm, inv))
        else:
            new.append(("spatial", entry[1], perm, inv))
    return dataclasses.replace(spec, perms=tuple(new))


def convert_cond_network(sd, prefix: str = "subnetworks.0") -> dict:
    return {
        "conv1": _conv(sd, f"{prefix}.conv1.0"),
        "conv2": _conv(sd, f"{prefix}.conv2.0"),
        "down": _conv(sd, f"{prefix}.downsample.0"),
        "c3a": _conv(sd, f"{prefix}.conv3d.0"),
        "c3b": _conv(sd, f"{prefix}.conv3d.3"),
        "prelu": {"alpha": _t(sd, f"{prefix}.conv1.1.weight")},
    }


def _convert_unet_block(sd, prefix, batch_norm=True):
    p = {"conv1": _conv(sd, f"{prefix}.block.0"),
         "act1": {"alpha": _t(sd, f"{prefix}.block.1.weight")},
         "conv2": _conv(sd, f"{prefix}.block.3"),
         "act2": {"alpha": _t(sd, f"{prefix}.block.4.weight")}}
    s = {}
    if batch_norm:
        for ix, tag in ((2, "bn1"), (5, "bn2")):
            p[tag] = {"scale": _t(sd, f"{prefix}.block.{ix}.weight"),
                      "bias": _t(sd, f"{prefix}.block.{ix}.bias")}
            s[tag] = {"mean": _t(sd, f"{prefix}.block.{ix}.running_mean"),
                      "var": _t(sd, f"{prefix}.block.{ix}.running_var"),
                      "count": jnp.zeros((), jnp.int32)}
    return p, s


def convert_unet(sd, prefix, depth=3):
    params = {"down": [], "up": []}
    state = {"down": [], "up": []}
    for i in range(depth):
        p, s = _convert_unet_block(sd, f"{prefix}.down_path.{i}")
        params["down"].append(p)
        state["down"].append(s)
    for i in range(depth - 1):
        up = {"up": _conv(sd, f"{prefix}.up_path.{i}.up")}
        p, s = _convert_unet_block(sd, f"{prefix}.up_path.{i}.conv_block")
        up["conv_block"] = p
        params["up"].append(up)
        state["up"].append(s)
    params["last"] = {"conv": _conv(sd, f"{prefix}.last.0"),
                      "act": {"alpha": _t(sd, f"{prefix}.last.1.weight")}}
    return params, state


def _convert_convnext(sd, prefix):
    return {"inp": _conv(sd, f"{prefix}.input"),
            "dw": _conv(sd, f"{prefix}.m.0"),
            "ln": {"scale": _t(sd, f"{prefix}.m.1.weight"),
                   "bias": _t(sd, f"{prefix}.m.1.bias")},
            "pw": _conv(sd, f"{prefix}.m.2")}


def convert_lrnn(sd, unet_depth=3):
    """Encoder state dict (keys rooted at 'net.') -> (params, state)."""
    params = {
        "proj": _conv(sd, "net.deconv.0"),
        "cnx1": _convert_convnext(sd, "net.conv3d.0"),
        "cnx2": _convert_convnext(sd, "net.conv3d.1"),
        "attn": {"c1": _conv(sd, "net.attention_3d.m.0"),
                 "c2": _conv(sd, "net.attention_3d.m.2")},
    }
    params["unet"], unet_state = convert_unet(sd, "net.deconv.1",
                                              depth=unet_depth)
    return params, {"unet": unet_state}


def load_torch_state_dict(path: str) -> dict:
    """Load a reference checkpoint file; returns the payload dict with
    state dicts converted to numpy."""
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for key in ("INN_state_dict", "condition_state_dict"):
        sd = payload.get(key)
        out[key] = ({k: v.detach().cpu().numpy() for k, v in sd.items()}
                    if sd else None)
    out["epoch"] = payload.get("epoch")
    out["training_statistics"] = payload.get("training_statistics")
    return out
