"""Per-layer activation parity: JAX CartNet vs an independent torch oracle.

The reference itself cannot be imported (torch_geometric/torch_scatter are not
in this image), so the oracle is a from-scratch torch implementation of the
reference math (models/cartnet.py semantics, cited inline). Weights are copied
from the JAX params, and encoder / every layer / head activations must agree
elementwise. This pins down cross-framework numerics: MLP order, BN eval
semantics, envelope, scatter, Cholesky assembly.
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cartnet_tpu.config import ModelConfig
from cartnet_tpu.data.batching import collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models import cartnet as M

def _t(a):
    return torch.tensor(np.asarray(a, np.float64))


def _lin(p):
    lin = torch.nn.Linear(p["w"].shape[0], p["w"].shape[1]).double()
    with torch.no_grad():
        lin.weight.copy_(_t(p["w"]).T)
        lin.bias.copy_(_t(p["b"]))
    return lin


def _mlp_silu_final(p):  # Linear -> SiLU -> Linear (no final act)
    return torch.nn.Sequential(_lin(p["lin0"]), torch.nn.SiLU(), _lin(p["lin1"]))


class TorchOracle(torch.nn.Module):
    """Eval-mode CartNet with reference semantics (models/cartnet.py)."""

    def __init__(self, params, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        enc = params["encoder"]
        self.emb = _t(enc["embedding"]["w"])
        self.temp_proj = _lin(enc["temp_proj"])
        self.atom_mlp = _lin(enc["atom_mlp"])
        self.edge_mlp = torch.nn.Sequential(_lin(enc["edge_mlp"]["lin0"]),
                                            torch.nn.SiLU(),
                                            _lin(enc["edge_mlp"]["lin1"]),
                                            torch.nn.SiLU())
        self.rbf_means = _t(enc["rbf_means"])
        self.rbf_betas = _t(enc["rbf_betas"])
        self.layers = []
        for i in range(cfg.num_layers):
            lp = params[f"layer{i}"]
            bn = torch.nn.BatchNorm1d(cfg.dim_in).double().eval()
            bn2 = torch.nn.BatchNorm1d(cfg.dim_in).double().eval()
            with torch.no_grad():
                bn.weight.copy_(_t(lp["bn"]["gamma"]))
                bn.bias.copy_(_t(lp["bn"]["beta"]))
                bn2.weight.copy_(_t(lp["bn2"]["gamma"]))
                bn2.bias.copy_(_t(lp["bn2"]["beta"]))
            self.layers.append({
                "gate": _mlp_silu_final(lp["mlp_gate"]),
                "aggr": _mlp_silu_final(lp["mlp_aggr"]),
                "bn": bn, "bn2": bn2})
        self.head = torch.nn.Sequential(_lin(params["head"]["mlp"]["lin0"]),
                                        torch.nn.SiLU(),
                                        _lin(params["head"]["mlp"]["lin1"]))

    def encoder(self, z, temp, graph_id, dist, cart_dir):
        # x = embedding[z] + temp_proj(T)[graph] ; Sequential(SiLU, Linear,
        # SiLU) applies the activation BEFORE the linear (cartnet.py:125-127,145)
        x = self.emb[z] + self.temp_proj(temp[:, None])[graph_id]
        x = torch.nn.functional.silu(self.atom_mlp(torch.nn.functional.silu(x)))
        # ExpNormalSmearing (models/utils.py:56-61) + cosine cutoff
        r = self.cfg.radius
        d = dist[:, None]
        env = 0.5 * (torch.cos(d * math.pi / r) + 1.0) * (d < r)
        alpha = 5.0 / r
        feats = env * torch.exp(-self.rbf_betas *
                                (torch.exp(-alpha * d) - self.rbf_means) ** 2)
        e = self.edge_mlp(torch.cat([feats, cart_dir], dim=-1))
        return x, e

    def layer(self, i, x, e, src, dst, dist):
        L = self.layers[i]
        x_in, e_in = x, e
        cat = torch.cat([x[dst], x[src], e], dim=-1)  # [x_i ‖ x_j ‖ e]
        gate = torch.sigmoid(L["bn"](L["gate"](cat)))
        r = self.cfg.radius
        env = 0.5 * (torch.cos(dist * math.pi / r) + 1.0) * (dist < r)
        sigma = env[:, None] * gate
        sender = L["aggr"](cat)
        aggr = torch.zeros_like(x).index_add_(0, dst, sigma * sender)
        x = torch.nn.functional.silu(L["bn2"](aggr)) + x_in
        e = e_in + sigma
        return x, e

    def cholesky(self, x):
        out = self.head(x)
        diag = torch.nn.functional.softplus(out[:, :3])
        L = torch.zeros(len(x), 3, 3, dtype=out.dtype)
        L[:, [0, 1, 2], [0, 1, 2]] = diag
        L[:, [0, 0, 1], [1, 2, 2]] = out[:, 3:]
        return L.transpose(1, 2) @ L


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(dim_in=32, dim_rbf=16, num_layers=3, cholesky=True)
    recs = synthetic_dataset(2, mean_atoms=14, radius=5.0, adp=True, seed=11)
    n = sum(len(r["z"]) for r in recs)
    e = sum(len(r["edge_src"]) for r in recs)
    batch = collate(recs, n, e, 2)  # exact sizes: no padding anywhere
    params, state = M.cartnet_init(jax.random.key(0), cfg)
    oracle = TorchOracle(jax.tree.map(np.asarray, params), cfg)
    return cfg, batch, params, state, oracle


def test_encoder_parity(setup):
    cfg, batch, params, state, oracle = setup
    xj, ej = M.encoder_apply(params["encoder"], batch, cfg)
    xt, et = oracle.encoder(_t(batch.z).long(), _t(batch.temperature),
                            _t(batch.graph_id).long(), _t(batch.cart_dist),
                            _t(batch.cart_dir))
    np.testing.assert_allclose(np.asarray(xj), xt.detach(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ej), et.detach(), rtol=1e-4, atol=1e-6)


def test_per_layer_and_head_parity(setup):
    cfg, batch, params, state, oracle = setup
    xj, ej = M.encoder_apply(params["encoder"], batch, cfg)
    xt, et = oracle.encoder(_t(batch.z).long(), _t(batch.temperature),
                            _t(batch.graph_id).long(), _t(batch.cart_dist),
                            _t(batch.cart_dir))
    src, dst = _t(batch.edge_src).long(), _t(batch.edge_dst).long()
    with torch.no_grad():
        for i in range(cfg.num_layers):
            xj, ej, _ = M.layer_apply(params[f"layer{i}"], state[f"layer{i}"],
                                      xj, ej, batch, cfg, training=False)
            xt, et = oracle.layer(i, xt, et, src, dst, _t(batch.cart_dist))
            np.testing.assert_allclose(np.asarray(xj), xt, rtol=5e-4,
                                       atol=1e-5, err_msg=f"layer {i} x")
            np.testing.assert_allclose(np.asarray(ej), et, rtol=5e-4,
                                       atol=1e-5, err_msg=f"layer {i} e")
        uj = M.cholesky_head_apply(params["head"], xj)
        ut = oracle.cholesky(xt)
    np.testing.assert_allclose(np.asarray(uj), ut, rtol=5e-4, atol=1e-6)


def test_full_forward_parity(setup):
    cfg, batch, params, state, oracle = setup
    pred, mask, _ = M.cartnet_apply(params, state, batch, cfg, training=False)
    xt, et = oracle.encoder(_t(batch.z).long(), _t(batch.temperature),
                            _t(batch.graph_id).long(), _t(batch.cart_dist),
                            _t(batch.cart_dir))
    src, dst = _t(batch.edge_src).long(), _t(batch.edge_dst).long()
    with torch.no_grad():
        for i in range(cfg.num_layers):
            xt, et = oracle.layer(i, xt, et, src, dst, _t(batch.cart_dist))
        ut = oracle.cholesky(xt)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(pred)[m], ut.numpy()[m],
                               rtol=1e-3, atol=1e-5)


def test_train_mode_bn_stats_parity(setup):
    """One train-mode layer pass: batch stats + outputs match torch BN.train."""
    cfg, batch, params, state, oracle = setup
    xj, ej = M.encoder_apply(params["encoder"], batch, cfg)
    xj2, ej2, new_state = M.layer_apply(params["layer0"], state["layer0"],
                                        xj, ej, batch, cfg, training=True)
    L = oracle.layers[0]
    L["bn"].train()
    L["bn2"].train()
    xt, et = oracle.encoder(_t(batch.z).long(), _t(batch.temperature),
                            _t(batch.graph_id).long(), _t(batch.cart_dist),
                            _t(batch.cart_dir))
    src, dst = _t(batch.edge_src).long(), _t(batch.edge_dst).long()
    with torch.no_grad():
        xt2, et2 = oracle.layer(0, xt, et, src, dst, _t(batch.cart_dist))
    np.testing.assert_allclose(np.asarray(xj2), xt2, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["bn"]["mean"]),
                               L["bn"].running_mean, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(new_state["bn"]["var"]),
                               L["bn"].running_var, rtol=1e-4, atol=1e-7)
