"""Torch-checkpoint interop: reference state_dict layout <-> our pytrees.

Pins the contract against a REAL torch module built with the reference's
attribute names and Sequential indices (/root/reference/models/cartnet.py:
encoder :108-138, CartNet_layer :185-201, Cholesky_head :289-291), via strict
``load_state_dict`` — any key or shape drift fails. Linear orientation is
checked numerically (torch [out,in] vs ours [in,out]).
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cartnet_tpu import interop
from cartnet_tpu.config import ModelConfig
from cartnet_tpu.models.cartnet import cartnet_init


CFG = ModelConfig(dim_in=32, dim_rbf=8, num_layers=2, cholesky=True)


def _reference_layout_module(cfg: ModelConfig) -> torch.nn.Module:
    """Parameter-holding torch module with the reference's state_dict keys."""
    d = cfg.dim_in
    act = torch.nn.SiLU()

    enc = torch.nn.Module()
    # ablation-dependent branch (reference models/cartnet.py:112-127)
    if cfg.use_atom_types:
        enc.embedding = torch.nn.Embedding(119, 2 * d)
    elif not cfg.use_temperature:
        enc.embedding = torch.nn.Embedding(1, d)
    if cfg.use_temperature:
        enc.temperature_proj_atom = torch.nn.Linear(1, 2 * d)
    elif cfg.use_atom_types:
        enc.bias = torch.nn.Parameter(torch.zeros(2 * d))
    if cfg.use_temperature or cfg.use_atom_types:
        enc.encoder_atom = torch.nn.Sequential(act, torch.nn.Linear(2 * d, d),
                                               act)
    dim_edge = cfg.dim_rbf + 3
    enc.encoder_edge = torch.nn.Sequential(
        torch.nn.Linear(dim_edge, 2 * d), act, torch.nn.Linear(2 * d, d), act)
    rbf = torch.nn.Module()
    rbf.register_buffer("means", torch.zeros(cfg.dim_rbf))
    rbf.register_buffer("betas", torch.ones(cfg.dim_rbf))
    enc.rbf = rbf

    layers = []
    for _ in range(cfg.num_layers):
        lay = torch.nn.Module()
        lay.MLP_aggr = torch.nn.Sequential(
            torch.nn.Linear(3 * d, d), act, torch.nn.Linear(d, d))
        lay.MLP_gate = torch.nn.Sequential(
            torch.nn.Linear(3 * d, d), act, torch.nn.Linear(d, d))
        lay.norm = torch.nn.BatchNorm1d(d)
        lay.norm2 = torch.nn.BatchNorm1d(d)
        layers.append(lay)

    head = torch.nn.Module()
    head.MLP = torch.nn.Sequential(
        torch.nn.Linear(d, d // 2), act, torch.nn.Linear(d // 2, 6))

    model = torch.nn.Module()
    model.encoder = enc
    model.layers = torch.nn.Sequential(*layers)
    model.head = head
    return model


def test_export_matches_reference_layout_strict():
    params, bn_state = cartnet_init(jax.random.key(0), CFG)
    sd = interop.export_state_dict(params, bn_state, CFG)
    ref = _reference_layout_module(CFG)
    # strict load: exported key set and every shape must match the reference
    ref.load_state_dict({k: torch.as_tensor(np.array(v)) for k, v in sd.items()},
                        strict=True)


def test_linear_orientation_numeric():
    params, bn_state = cartnet_init(jax.random.key(1), CFG)
    sd = interop.export_state_dict(params, bn_state, CFG)
    w = torch.as_tensor(np.array(sd["layers.0.MLP_gate.0.weight"]))
    b = torch.as_tensor(np.array(sd["layers.0.MLP_gate.0.bias"]))
    v = torch.randn(5, 3 * CFG.dim_in, dtype=torch.float64)
    ours = np.asarray(v.numpy() @ np.asarray(
        params["layer0"]["mlp_gate"]["lin0"]["w"], np.float64)
        + np.asarray(params["layer0"]["mlp_gate"]["lin0"]["b"], np.float64))
    theirs = torch.nn.functional.linear(v, w.double(), b.double()).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_round_trip_identity():
    params, bn_state = cartnet_init(jax.random.key(2), CFG)
    sd = interop.export_state_dict(params, bn_state, CFG)
    p2, s2 = interop.import_state_dict(sd, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(bn_state), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_import_from_torch_init_and_forward():
    """Import weights initialized BY torch and run a jax forward — torch
    checkpoints load end-to-end and drive the model."""
    ref = _reference_layout_module(CFG)
    params, bn_state = interop.import_state_dict(ref.state_dict(), CFG)

    from cartnet_tpu.data.batching import collate
    from cartnet_tpu.data.synthetic import synthetic_dataset
    from cartnet_tpu.models.cartnet import cartnet_apply
    recs = synthetic_dataset(2, mean_atoms=12, radius=5.0, adp=True, seed=3)
    batch = collate(recs, 40, 1024, 2)
    pred, mask, _ = cartnet_apply(params, bn_state, batch, CFG, training=False)
    assert np.isfinite(np.asarray(pred)[np.asarray(mask)]).all()


def test_load_torch_checkpoint_file(tmp_path):
    """Reference best.ckpt wrapping ({'model_state': sd}) round-trips."""
    ref = _reference_layout_module(CFG)
    path = tmp_path / "best.ckpt"
    torch.save({"model_state": ref.state_dict(), "optimizer_state": {}}, path)
    params, bn_state = interop.load_torch_checkpoint(str(path), CFG)
    np.testing.assert_allclose(
        np.asarray(params["head"]["mlp"]["lin1"]["w"]),
        ref.head.MLP[2].weight.detach().numpy().T, rtol=1e-6)


def test_import_shape_validation():
    params, bn_state = cartnet_init(jax.random.key(4), CFG)
    sd = interop.export_state_dict(params, bn_state, CFG)
    with pytest.raises(ValueError, match="dim_in"):
        interop.import_state_dict(sd, dataclasses.replace(CFG, dim_in=64))
    with pytest.raises(ValueError, match="layers"):
        interop.import_state_dict(sd, dataclasses.replace(CFG, num_layers=3))
    with pytest.raises(ValueError, match="head"):
        interop.import_state_dict(sd, dataclasses.replace(CFG, cholesky=False))
    with pytest.raises(ValueError, match="ablation branch"):
        interop.import_state_dict(
            sd, dataclasses.replace(CFG, use_temperature=False))


def test_no_temp_branch_round_trip():
    """(use_temperature=False, use_atom_types=True): encoder.bias layout."""
    cfg = dataclasses.replace(CFG, use_temperature=False)
    ref = _reference_layout_module(cfg)
    params, _ = interop.import_state_dict(ref.state_dict(), cfg)
    assert "bias" in params["encoder"] and "temp_proj" not in params["encoder"]
    sd2 = interop.export_state_dict(params, cartnet_init(
        jax.random.key(0), cfg)[1], cfg)
    ref.load_state_dict({k: torch.as_tensor(np.array(v))
                         for k, v in sd2.items()}, strict=True)
