"""Training-dynamics parity: 50 full train steps vs an independent torch
oracle (Adam + OneCycleLR incl. beta1 cycling + BN running-stat updates),
identical weights and batches. The strongest available proxy for real-data MAE
parity in a no-egress container (reference semantics:
/root/reference/train/train.py:148-199 + :59).

Also snapshots the JAX loss trajectory as a committed golden file so numeric
regressions are caught without torch in the loop.
"""

import math
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
from cartnet_tpu.data.batching import collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models import cartnet as M
from cartnet_tpu.train.loop import init_train_state, loss_fn, make_steps
from cartnet_tpu.train.schedule import make_optimizer

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "train_loss_trajectory.npy")
STEPS = 50
LR, PCT = 3e-4, 0.1  # stable descent on the synthetic task (1e-3 diverges)


def _t(a):
    return torch.tensor(np.asarray(a, np.float32))


def _lin(p):
    lin = torch.nn.Linear(p["w"].shape[0], p["w"].shape[1])
    with torch.no_grad():
        lin.weight.copy_(_t(p["w"]).T)
        lin.bias.copy_(_t(p["b"]))
    return lin


class TrainableOracle(torch.nn.Module):
    """f32 trainable CartNet with reference semantics (models/cartnet.py),
    all parameters registered so Adam/OneCycle drive them."""

    def __init__(self, params, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        enc = params["encoder"]
        self.emb = torch.nn.Parameter(_t(enc["embedding"]["w"]))
        self.temp_proj = _lin(enc["temp_proj"])
        self.atom_mlp = _lin(enc["atom_mlp"])
        self.edge_mlp = torch.nn.Sequential(_lin(enc["edge_mlp"]["lin0"]),
                                            torch.nn.SiLU(),
                                            _lin(enc["edge_mlp"]["lin1"]),
                                            torch.nn.SiLU())
        self.register_buffer("rbf_means", _t(enc["rbf_means"]))
        self.register_buffer("rbf_betas", _t(enc["rbf_betas"]))
        self.gates = torch.nn.ModuleList()
        self.aggrs = torch.nn.ModuleList()
        self.bns = torch.nn.ModuleList()
        self.bn2s = torch.nn.ModuleList()
        for i in range(cfg.num_layers):
            lp = params[f"layer{i}"]
            self.gates.append(torch.nn.Sequential(
                _lin(lp["mlp_gate"]["lin0"]), torch.nn.SiLU(),
                _lin(lp["mlp_gate"]["lin1"])))
            self.aggrs.append(torch.nn.Sequential(
                _lin(lp["mlp_aggr"]["lin0"]), torch.nn.SiLU(),
                _lin(lp["mlp_aggr"]["lin1"])))
            for mods, key in ((self.bns, "bn"), (self.bn2s, "bn2")):
                bn = torch.nn.BatchNorm1d(cfg.dim_in)
                with torch.no_grad():
                    bn.weight.copy_(_t(lp[key]["gamma"]))
                    bn.bias.copy_(_t(lp[key]["beta"]))
                mods.append(bn)
        self.head = torch.nn.Sequential(_lin(params["head"]["mlp"]["lin0"]),
                                        torch.nn.SiLU(),
                                        _lin(params["head"]["mlp"]["lin1"]))

    def forward(self, z, temp, gid, src, dst, dist, cart_dir):
        r = self.cfg.radius
        x = self.emb[z] + self.temp_proj(temp[:, None])[gid]
        x = torch.nn.functional.silu(self.atom_mlp(
            torch.nn.functional.silu(x)))
        d = dist[:, None]
        env1 = 0.5 * (torch.cos(d * math.pi / r) + 1.0) * (d < r)
        alpha = 5.0 / r
        feats = env1 * torch.exp(-self.rbf_betas *
                                 (torch.exp(-alpha * d) - self.rbf_means) ** 2)
        e = self.edge_mlp(torch.cat([feats, cart_dir], dim=-1))
        env = (0.5 * (torch.cos(dist * math.pi / r) + 1.0) * (dist < r))[:, None]
        for i in range(self.cfg.num_layers):
            x_in, e_in = x, e
            cat = torch.cat([x[dst], x[src], e], dim=-1)
            sigma = env * torch.sigmoid(self.bns[i](self.gates[i](cat)))
            sender = self.aggrs[i](cat)
            aggr = torch.zeros_like(x).index_add_(0, dst, sigma * sender)
            x = torch.nn.functional.silu(self.bn2s[i](aggr)) + x_in
            e = e_in + sigma
        out = self.head(x)
        diag = torch.nn.functional.softplus(out[:, :3])
        L = torch.zeros(len(x), 3, 3, dtype=out.dtype)
        L[:, [0, 1, 2], [0, 1, 2]] = diag
        L[:, [0, 0, 1], [1, 2, 2]] = out[:, 3:]
        return L.transpose(1, 2) @ L


def _data(cfg_m, n_batches=4, bs=2):
    recs = synthetic_dataset(n_batches * bs, mean_atoms=10, radius=cfg_m.radius,
                             adp=True, seed=21)
    tight, padded = [], []
    for i in range(n_batches):
        group = recs[i * bs:(i + 1) * bs]
        n = sum(len(r["z"]) for r in group)
        e = sum(len(r["edge_src"]) for r in group)
        tight.append(collate(group, n, e, bs))          # torch: no pads
        padded.append(collate(group, 64, 4096, bs))     # jax: padded+masked
    return tight, padded


def _jax_trajectory(cfg, padded):
    opt = make_optimizer(LR, STEPS, PCT)
    state = init_train_state(jax.random.key(3), cfg, M.cartnet_init, opt)
    micro, update, _ = make_steps(cfg, M.cartnet_apply, opt)
    losses = []
    for s in range(STEPS):
        state, stats = micro(state, padded[s % len(padded)])
        state = update(state)
        losses.append(float(stats["loss"]))
    return np.asarray(losses), state


def test_50_step_training_trajectory_matches_torch():
    cfg = Config(model=ModelConfig(dim_in=32, dim_rbf=16, num_layers=2,
                                   cholesky=True),
                 data=DataConfig(max_nodes=64, max_edges=4096, max_graphs=2),
                 optim=OptimConfig(lr=LR, batch_accumulation=1))
    tight, padded = _data(cfg.model)
    jax_losses, jstate = _jax_trajectory(cfg, padded)

    # init_train_state splits its key: params come from split(key)[0]
    pkey, _ = jax.random.split(jax.random.key(3))
    params0, _ = M.cartnet_init(pkey, cfg.model)
    oracle = TrainableOracle(jax.tree.map(np.asarray, params0), cfg.model)
    oracle.train()
    opt = torch.optim.Adam(oracle.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.OneCycleLR(opt, max_lr=LR,
                                                total_steps=STEPS,
                                                pct_start=PCT)
    torch_losses = []
    for s in range(STEPS):
        b = tight[s % len(tight)]
        pred = oracle(_t(b.z).long(), _t(b.temperature), _t(b.graph_id).long(),
                      _t(b.edge_src).long(), _t(b.edge_dst).long(),
                      _t(b.cart_dist), _t(b.cart_dir))
        nonh = torch.tensor(np.asarray(b.non_h_mask))
        loss = torch.nn.functional.l1_loss(pred[nonh], _t(b.y)[nonh])
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        torch_losses.append(float(loss))
    torch_losses = np.asarray(torch_losses)

    # identical first-step loss (same init, eval of same batch)
    np.testing.assert_allclose(jax_losses[0], torch_losses[0], rtol=1e-5)
    # trajectory-level parity: pointwise within a tolerance that accommodates
    # f32 reduction-order divergence amplified through Adam, plus an
    # aggregate check that the training dynamics agree
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-2, atol=2e-4)
    np.testing.assert_allclose(jax_losses.mean(), torch_losses.mean(),
                               rtol=2e-3)
    assert jax_losses[-5:].mean() < jax_losses[:5].mean()  # both learn
    # BN running stats still aligned after 50 train steps
    bn = jstate.bn_state["layer0"]["bn"]
    np.testing.assert_allclose(np.asarray(bn["mean"]),
                               oracle.bns[0].running_mean.detach(),
                               rtol=5e-2, atol=0.5)


def test_jax_trajectory_matches_golden():
    """Regression pin: the committed golden trajectory (torch-verified above)
    must be reproduced bit-for-tolerance by today's JAX stack."""
    cfg = Config(model=ModelConfig(dim_in=32, dim_rbf=16, num_layers=2,
                                   cholesky=True),
                 data=DataConfig(max_nodes=64, max_edges=4096, max_graphs=2),
                 optim=OptimConfig(lr=LR, batch_accumulation=1))
    _, padded = _data(cfg.model)
    losses, _ = _jax_trajectory(cfg, padded)
    if not os.path.exists(GOLDEN):  # first run: write the snapshot
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.save(GOLDEN, losses)
        pytest.skip("golden trajectory written; commit it")
    golden = np.load(GOLDEN)
    np.testing.assert_allclose(losses, golden, rtol=1e-3, atol=1e-6)
