"""Torch-checkpoint interop: load reference CartNet weights into cartnet_tpu.

The reference saves ``{"model_state": state_dict, "optimizer_state": ...}``
(/root/reference/train/train.py:92-100); a user switching frameworks has
trained ``best.ckpt`` files in that layout. This module maps the reference's
``state_dict`` key space (module attribute names from
/root/reference/models/cartnet.py — ``encoder.encoder_edge.0.weight``,
``layers.{i}.MLP_gate.2.bias``, ``head.MLP.0.weight``, BN ``norm``/``norm2``
running stats, ExpNormalSmearing ``rbf.means``/``rbf.betas`` buffers) onto this
framework's param/BN-state pytrees, and back.

Conventions translated:
  * torch ``nn.Linear.weight`` is [out, in]; ours is ``w`` [in, out] (transposed).
  * ``nn.Embedding.weight`` is [num, dim] on both sides (no transpose).
  * BatchNorm: ``weight/bias`` -> ``gamma/beta`` (params);
    ``running_mean/running_var/num_batches_tracked`` -> ``mean/var/count``
    (bn_state).

Only CartNet is covered (the flagship; Comformer checkpoints are rare and the
e3nn tensor-product weight layout has no 1:1 mapping to our dense CG blocks).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from cartnet_tpu.config import ModelConfig


def _lin_out(prefix: str, p: Dict[str, Any], sd: Dict[str, np.ndarray]):
    sd[f"{prefix}.weight"] = np.asarray(p["w"]).T
    if "b" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["b"])


def _lin_in(prefix: str, sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    p = {"w": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        p["b"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def export_state_dict(params, bn_state, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """cartnet_tpu (params, bn_state) -> reference-layout torch state_dict
    (numpy values; pass through ``torch.as_tensor`` to save with torch)."""
    if cfg.name != "cartnet":
        raise ValueError(f"torch interop only supports CartNet, got {cfg.name}")
    sd: Dict[str, np.ndarray] = {}
    enc = params["encoder"]
    if "embedding" in enc:
        sd["encoder.embedding.weight"] = np.asarray(enc["embedding"]["w"])
    if "temp_proj" in enc:
        _lin_out("encoder.temperature_proj_atom", enc["temp_proj"], sd)
    if "bias" in enc:
        sd["encoder.bias"] = np.asarray(enc["bias"])
    if "atom_mlp" in enc:
        # reference Sequential(SiLU, Linear, SiLU): the Linear is index 1
        _lin_out("encoder.encoder_atom.1", enc["atom_mlp"], sd)
    _lin_out("encoder.encoder_edge.0", enc["edge_mlp"]["lin0"], sd)
    _lin_out("encoder.encoder_edge.2", enc["edge_mlp"]["lin1"], sd)
    sd["encoder.rbf.means"] = np.asarray(enc["rbf_means"])
    sd["encoder.rbf.betas"] = np.asarray(enc["rbf_betas"])
    for i in range(cfg.num_layers):
        lp, ls = params[f"layer{i}"], bn_state[f"layer{i}"]
        for ours, theirs in (("mlp_gate", "MLP_gate"), ("mlp_aggr", "MLP_aggr")):
            _lin_out(f"layers.{i}.{theirs}.0", lp[ours]["lin0"], sd)
            _lin_out(f"layers.{i}.{theirs}.2", lp[ours]["lin1"], sd)
        for ours, theirs in (("bn", "norm"), ("bn2", "norm2")):
            sd[f"layers.{i}.{theirs}.weight"] = np.asarray(lp[ours]["gamma"])
            sd[f"layers.{i}.{theirs}.bias"] = np.asarray(lp[ours]["beta"])
            sd[f"layers.{i}.{theirs}.running_mean"] = np.asarray(ls[ours]["mean"])
            sd[f"layers.{i}.{theirs}.running_var"] = np.asarray(ls[ours]["var"])
            sd[f"layers.{i}.{theirs}.num_batches_tracked"] = np.asarray(
                ls[ours]["count"], np.int64)
    _lin_out("head.MLP.0", params["head"]["mlp"]["lin0"], sd)
    _lin_out("head.MLP.2", params["head"]["mlp"]["lin1"], sd)
    return sd


def import_state_dict(sd: Dict[str, Any], cfg: ModelConfig) -> Tuple[Any, Any]:
    """Reference-layout state_dict -> (params, bn_state) pytrees (f32 numpy).

    ``sd`` values may be torch tensors or arrays; shapes are validated against
    the config so a mismatched ``--dim_in``/``--num_layers`` fails loudly.
    """
    if cfg.name != "cartnet":
        raise ValueError(f"torch interop only supports CartNet, got {cfg.name}")
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu()
                        if hasattr(v, "cpu") else v) for k, v in sd.items()}
    d = cfg.dim_in
    # the encoder's parameter set depends on the (use_temperature,
    # use_atom_types) ablation branch (reference models/cartnet.py:112-127);
    # a checkpoint trained under a different branch must fail loudly here,
    # not with a missing-key crash mid-forward.
    need = {"encoder.encoder_edge.0.weight", "encoder.encoder_edge.2.weight",
            "encoder.rbf.means", "encoder.rbf.betas"}
    if cfg.use_atom_types:
        need.add("encoder.embedding.weight")
        need.add("encoder.bias" if not cfg.use_temperature else
                 "encoder.temperature_proj_atom.weight")
    elif cfg.use_temperature:
        need.add("encoder.temperature_proj_atom.weight")
    else:
        need.add("encoder.embedding.weight")
    if cfg.use_temperature or cfg.use_atom_types:
        need.add("encoder.encoder_atom.1.weight")
    missing = sorted(need - sd.keys())
    if missing:
        raise ValueError(
            f"checkpoint is missing {missing} — it was trained under a "
            f"different (use_temperature={cfg.use_temperature}, "
            f"use_atom_types={cfg.use_atom_types}) encoder ablation branch")
    enc: Dict[str, Any] = {}
    if "encoder.embedding.weight" in sd:
        enc["embedding"] = {"w": sd["encoder.embedding.weight"]}
    if "encoder.temperature_proj_atom.weight" in sd:
        enc["temp_proj"] = _lin_in("encoder.temperature_proj_atom", sd)
    if "encoder.bias" in sd:
        enc["bias"] = sd["encoder.bias"]
    if "encoder.encoder_atom.1.weight" in sd:
        enc["atom_mlp"] = _lin_in("encoder.encoder_atom.1", sd)
    enc["edge_mlp"] = {"lin0": _lin_in("encoder.encoder_edge.0", sd),
                       "lin1": _lin_in("encoder.encoder_edge.2", sd)}
    enc["rbf_means"] = sd["encoder.rbf.means"]
    enc["rbf_betas"] = sd["encoder.rbf.betas"]
    if enc["edge_mlp"]["lin0"]["w"].shape[1] != 2 * d:
        raise ValueError(
            f"checkpoint dim_in {enc['edge_mlp']['lin0']['w'].shape[1] // 2} "
            f"!= config dim_in {d}")

    params: Dict[str, Any] = {"encoder": enc}
    bn_state: Dict[str, Any] = {}
    for i in range(cfg.num_layers):
        if f"layers.{i}.MLP_gate.0.weight" not in sd:
            raise ValueError(f"checkpoint has < {cfg.num_layers} layers "
                             f"(missing layers.{i})")
        lp: Dict[str, Any] = {}
        ls: Dict[str, Any] = {}
        for ours, theirs in (("mlp_gate", "MLP_gate"), ("mlp_aggr", "MLP_aggr")):
            lp[ours] = {"lin0": _lin_in(f"layers.{i}.{theirs}.0", sd),
                        "lin1": _lin_in(f"layers.{i}.{theirs}.2", sd)}
        for ours, theirs in (("bn", "norm"), ("bn2", "norm2")):
            lp[ours] = {"gamma": sd[f"layers.{i}.{theirs}.weight"],
                        "beta": sd[f"layers.{i}.{theirs}.bias"]}
            ls[ours] = {"mean": sd[f"layers.{i}.{theirs}.running_mean"],
                        "var": sd[f"layers.{i}.{theirs}.running_var"],
                        "count": sd[f"layers.{i}.{theirs}.num_batches_tracked"]
                        .astype(np.int32).reshape(())}
        params[f"layer{i}"] = lp
        bn_state[f"layer{i}"] = ls
    params["head"] = {"mlp": {"lin0": _lin_in("head.MLP.0", sd),
                              "lin1": _lin_in("head.MLP.2", sd)}}
    head_out = params["head"]["mlp"]["lin1"]["w"].shape[1]
    if head_out != (6 if cfg.cholesky else 1):
        raise ValueError(f"checkpoint head width {head_out} does not match "
                         f"cholesky={cfg.cholesky}")

    import jax.numpy as jnp
    to_jax = lambda a: jnp.asarray(a, cfg.param_dtype
                                   if np.issubdtype(a.dtype, np.floating)
                                   else None)
    import jax
    return (jax.tree.map(to_jax, params), jax.tree.map(to_jax, bn_state))


def load_torch_checkpoint(path: str, cfg: ModelConfig) -> Tuple[Any, Any]:
    """Load a reference ``best.ckpt`` (or bare state_dict ``.pt``) file."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    sd = obj.get("model_state", obj) if isinstance(obj, dict) else obj
    return import_state_dict(sd, cfg)
