"""Per-layer activation parity: JAX e/iComformer vs an independent torch oracle.

Same contract as tests/test_torch_parity.py for CartNet: e3nn/torch_geometric
are not importable in this image, so the oracle is a from-scratch torch
implementation of the reference math with line citations into
/root/reference/models/{comformer.py,comformer_conv.py}. Weights are copied
from the JAX params; every conv layer, the edge-update layer, the equivariant
tensor-product block, and both full models must agree elementwise, on the
unfused path AND on the fused Pallas (interpret) path.

The equivariant oracle computes e3nn's o3.FullyConnectedTensorProduct
normalization FROM THE FORMULA (irrep_normalization='component',
path_normalization='element'): per instruction,

    ins_alpha = sqrt(dim(ir_out) / sum_over_same_out(mul1 * mul2)),
    wigner_3j(0,l,l) = wigner_3j(l,l,0) = delta_{m m'} / sqrt(2l+1),

so a drift in the hand-derived constants in models/equivariant.py would be
caught here rather than silently matching.
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cartnet_tpu.config import ModelConfig
from cartnet_tpu.data.batching import bandwidth_reorder, collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models import comformer as C
from cartnet_tpu.models import equivariant as EQ
from cartnet_tpu.models.cartnet import cholesky_head_apply

D = 32
NS, NV = EQ.NS, EQ.NV


def _t(a):
    return torch.tensor(np.asarray(a, np.float64))


def _lin(p):
    has_b = "b" in p
    lin = torch.nn.Linear(p["w"].shape[0], p["w"].shape[1], bias=has_b).double()
    with torch.no_grad():
        lin.weight.copy_(_t(p["w"]).T)
        if has_b:
            lin.bias.copy_(_t(p["b"]))
    return lin


def _mlp(p):  # Linear -> SiLU -> Linear (reference key_update/lin_msg_update)
    return torch.nn.Sequential(_lin(p["lin0"]), torch.nn.SiLU(), _lin(p["lin1"]))


def _bn(p, d, train=False):
    bn = torch.nn.BatchNorm1d(d).double()
    bn.train(train)
    with torch.no_grad():
        bn.weight.copy_(_t(p["gamma"]))
        bn.bias.copy_(_t(p["beta"]))
    return bn


def _rbf(x, vmin, vmax, bins):
    # RBFExpansion (models/utils.py:96-129): gamma = 1/lengthscale (SchNet
    # default branch), centers = linspace(vmin, vmax, bins)
    centers = torch.linspace(vmin, vmax, bins, dtype=torch.float64)
    gamma = 1.0 / ((vmax - vmin) / (bins - 1))
    return torch.exp(-gamma * (x[..., None] - centers) ** 2)


def _rbf_head(p, x, vmin, vmax):
    # rbf = Sequential(RBFExpansion, Linear, Softplus)  (comformer.py:37-45)
    return torch.nn.functional.softplus(_lin(p["lin"])(_rbf(x, vmin, vmax, D)))


class ConvOracle:
    """ComformerConv (comformer_conv.py:21-99), eval-mode BN.

    PyG MessagePassing with edge_index = (source j, target i): x_i gathers at
    edge_index[1] (our edge_dst), x_j at edge_index[0] (our edge_src), and
    aggr='add' scatters onto index = edge_index[1].
    """

    def __init__(self, p, train=False):
        self.q, self.k, self.v = _lin(p["lin_query"]), _lin(p["lin_key"]), \
            _lin(p["lin_value"])
        self.e = _lin(p["lin_edge"])
        self.concate = _lin(p["lin_concate"])
        self.key_update = _mlp(p["key_update"])
        self.msg_update = _mlp(p["msg_update"])
        self.bn = _bn(p["bn"], D, train)
        self.bn_att = _bn(p["bn_att"], D, train)

    def __call__(self, x, e, src, dst):
        q, k, v = self.q(x), self.k(x), self.v(x)
        ea = self.e(e)
        key_j = self.key_update(torch.cat([k[dst], k[src], ea], dim=-1))
        alpha = (q[dst] * key_j) / math.sqrt(D)          # :95
        msg = self.msg_update(torch.cat([v[dst], v[src], ea], dim=-1))
        out_e = msg * torch.sigmoid(self.bn_att(alpha))  # :98 (gated, no softmax)
        out = torch.zeros_like(x).index_add_(0, dst, out_e)
        out = self.concate(out)
        return torch.nn.functional.softplus(x + self.bn(out))  # :88


class ConvEdgeOracle:
    """ComformerConv_edge (comformer_conv.py:156-193), eval-mode BN."""

    def __init__(self, p, train=False):
        self.q, self.k, self.v = _lin(p["lin_query"]), _lin(p["lin_key"]), \
            _lin(p["lin_value"])
        self.ke = [_lin(p[f"key_e{i}"]) for i in (1, 2, 3)]
        self.ve = [_lin(p[f"value_e{i}"]) for i in (1, 2, 3)]
        self.e = _lin(p["lin_edge"])                      # bias=False (:141)
        self.concate = _lin(p["lin_concate"])
        self.key_update = _mlp(p["key_update"])
        self.msg_update = _mlp(p["msg_update"])
        self.bn = _bn(p["bn"], D, train)
        self.bn_att = _bn(p["bn_att"], D, train)

    def __call__(self, edge, nei_len, nei_angle):
        E = edge.shape[0]
        qx = self.q(edge)[:, None, :].expand(E, 3, D)      # :162 repeat over 3
        kx = self.k(edge)[:, None, :].expand(E, 3, D)
        vx = self.v(edge)[:, None, :].expand(E, 3, D)
        ky = torch.stack([self.ke[i](nei_len[:, i]) for i in range(3)], dim=1)
        vy = torch.stack([self.ve[i](nei_len[:, i]) for i in range(3)], dim=1)
        exy = self.e(nei_angle)                            # :178
        key = self.key_update(torch.cat([kx, ky, exy], dim=-1))
        alpha = (qx * key) / math.sqrt(D)
        msg = self.msg_update(torch.cat([vx, vy, exy], dim=-1))
        out = msg * torch.sigmoid(
            self.bn_att(alpha.reshape(-1, D)).reshape(E, 3, D))
        out = self.concate(out).sum(dim=1)                 # :188-190
        return torch.nn.functional.softplus(edge + self.bn(out))


def _sh_component(vec):
    """Component-normalized real SH l<=2 (o3.spherical_harmonics(...,
    normalize=True, normalization='component'), comformer_conv.py:271).
    Uses the repo's basis order; order is provably irrelevant (the uvw TP
    weights never index m, see models/equivariant.py docstring)."""
    vec = vec / vec.norm(dim=-1, keepdim=True).clamp_min(1e-12)
    x, y, z = vec[:, 0], vec[:, 1], vec[:, 2]
    y0 = torch.ones_like(x)[:, None]
    y1 = math.sqrt(3.0) * vec
    y2 = torch.stack([
        math.sqrt(15.0) * x * y,
        math.sqrt(15.0) * y * z,
        (math.sqrt(5.0) / 2.0) * (3 * z * z - 1),
        math.sqrt(15.0) * x * z,
        (math.sqrt(15.0) / 2.0) * (x * x - y * y)], dim=-1)
    return y0, y1, y2


def _ins_alpha(l_out, same_out_elements):
    """e3nn ins_alpha: sqrt(irrep_normalization alpha / path_normalization x)
    with component normalization (alpha = 2l_out+1) and element path norm
    (x = sum of mul1*mul2 over instructions sharing the output)."""
    return math.sqrt((2 * l_out + 1) / same_out_elements)


def _w3j_0ll(l):
    """e3nn wigner_3j(0,l,l)[0,m,m'] = delta / sqrt(2l+1) (unit Frobenius)."""
    return 1.0 / math.sqrt(2 * l + 1)


class EquiOracle:
    """ComformerConvEqui (comformer_conv.py:197-280): two
    FullyConnectedTensorProduct conv layers with fc-generated weights,
    gather at dst / scatter-mean onto src (TensorProductConvLayer:216-220),
    scalar-padded residual after layer 1 (:221-223)."""

    def __init__(self, p, train=False):
        self.node_linear = _lin(p["node_linear"])
        self.skip_linear = _lin(p["skip_linear"])
        self.node_linear_2 = _lin(p["node_linear_2"])
        self.fc1 = torch.nn.Sequential(_lin(p["tp1"]["fc"]["lin0"]),
                                       torch.nn.Softplus(),
                                       _lin(p["tp1"]["fc"]["lin1"]))
        self.fc2 = torch.nn.Sequential(_lin(p["tp2"]["fc"]["lin0"]),
                                       torch.nn.Softplus(),
                                       _lin(p["tp2"]["fc"]["lin1"]))
        self.bn = _bn(p["bn"], NS, train)

    def tp1(self, s, y0, y1, y2, w):
        # '64x0e' x '1x0e+1x1o+1x2e' -> '64x0e+8x1o+8x2e': one uvw path per
        # output irrep, each with 64*1 weight elements
        w0 = w[:, :NS * NS].reshape(-1, NS, NS)
        w1 = w[:, NS * NS:NS * (NS + NV)].reshape(-1, NS, NV)
        w2 = w[:, NS * (NS + NV):].reshape(-1, NS, NV)
        c0 = _ins_alpha(0, NS) * _w3j_0ll(0)
        c1 = _ins_alpha(1, NS) * _w3j_0ll(1)
        c2 = _ins_alpha(2, NS) * _w3j_0ll(2)
        os_ = c0 * torch.einsum("eu,euw->ew", s, w0) * y0
        ov = c1 * torch.einsum("eu,euw->ew", s, w1)[..., None] * y1[:, None, :]
        ot = c2 * torch.einsum("eu,euw->ew", s, w2)[..., None] * y2[:, None, :]
        return os_, ov, ot

    def tp2(self, s, v, t, y0, y1, y2, w):
        # '64x0e+8x1o+8x2e' x sh -> '64x0e': three paths into ONE output =>
        # element path normalization sums 64+8+8 = 80 elements for all three
        w0 = w[:, :NS * NS].reshape(-1, NS, NS)
        w1 = w[:, NS * NS:NS * (NS + NV)].reshape(-1, NV, NS)
        w2 = w[:, NS * (NS + NV):].reshape(-1, NV, NS)
        elems = NS + NV + NV
        out = (_ins_alpha(0, elems) * _w3j_0ll(0)
               * torch.einsum("eu,euw->ew", s * y0, w0))
        out = out + (_ins_alpha(0, elems) * _w3j_0ll(1)
                     * torch.einsum("eum,em,euw->ew", v, y1, w1))
        out = out + (_ins_alpha(0, elems) * _w3j_0ll(2)
                     * torch.einsum("eum,em,euw->ew", t, y2, w2))
        return out

    def __call__(self, x, e, src, dst, cart_dir):
        y0, y1, y2 = _sh_component(cart_dir)
        skip = x
        n = x.shape[0]
        s = self.node_linear(x)                            # :275
        cnt = torch.zeros(n, dtype=torch.float64).index_add_(
            0, src, torch.ones(len(src), dtype=torch.float64)).clamp_min(1.0)

        def smean(vals):
            flat = vals.reshape(len(src), -1)
            out = torch.zeros(n, flat.shape[1], dtype=torch.float64)
            out.index_add_(0, src, flat)
            return (out / cnt[:, None]).reshape((n,) + vals.shape[1:])

        os_, ov, ot = self.tp1(s[dst], y0, y1, y2, self.fc1(e))
        s1, v1, t1 = smean(os_), smean(ov), smean(ot)
        s1 = s1 + s                                        # F.pad residual :221
        out_e = self.tp2(s1[dst], v1[dst], t1[dst], y0, y1, y2, self.fc2(e))
        out = smean(out_e)                                 # residual=False
        sp = torch.nn.functional.softplus
        out = sp(self.node_linear_2(sp(self.bn(out))))     # :276
        return out + self.skip_linear(skip)                # :277


def _cholesky_oracle(head_p, x):
    h = torch.nn.Sequential(_lin(head_p["mlp"]["lin0"]), torch.nn.SiLU(),
                            _lin(head_p["mlp"]["lin1"]))(x)
    diag = torch.nn.functional.softplus(h[:, :3])
    L = torch.zeros(len(x), 3, 3, dtype=h.dtype)
    L[:, [0, 1, 2], [0, 1, 2]] = diag
    L[:, [0, 0, 1], [1, 2, 2]] = h[:, 3:]
    return L.transpose(1, 2) @ L


def _make_batch(fused: bool, seed=7):
    recs = synthetic_dataset(3, mean_atoms=16, radius=4.0, adp=True,
                             seed=seed, max_neighbors=14)
    if fused:
        recs = [bandwidth_reorder(r) for r in recs]
        n = -(-sum(len(r["z"]) for r in recs) // 128) * 128
        e = sum(-(-len(r["edge_src"]) // 512) * 512 for r in recs)
        return collate(recs, n, e, 3, edge_align=512)
    n = sum(len(r["z"]) for r in recs)
    e = sum(len(r["edge_src"]) for r in recs)
    return collate(recs, n, e, 3)


def _np(a):
    return np.asarray(a, np.float64)


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(name="ecomformer", dim_in=D, dim_rbf=D, cholesky=True)


# ------------------------------------------------------------ layer-level

@pytest.mark.parametrize("fused", [False, True])
def test_conv_layer_parity(cfg, fused):
    batch = _make_batch(fused)
    p, s = C.conv_init(jax.random.key(1), D, jnp.float32)
    key = jax.random.split(jax.random.key(2), 2)
    N, E = int(batch.num_nodes), int(batch.num_edges)
    x = jax.random.normal(key[0], (N, D), jnp.float32)
    e = jax.random.normal(key[1], (E, D), jnp.float32)
    # pad rows must be zero so the oracle (real rows only) sees same inputs
    x = jnp.where(batch.node_mask[:, None], x, 0.0)
    e = jnp.where(batch.edge_mask[:, None], e, 0.0)
    out, _ = C.conv_apply(p, s, x, e, batch, cfg, training=False)

    nm, em = _np(batch.node_mask).astype(bool), _np(batch.edge_mask).astype(bool)
    src = _t(batch.edge_src).long()[em]
    dst = _t(batch.edge_dst).long()[em]
    oracle = ConvOracle(jax.tree.map(np.asarray, p))
    with torch.no_grad():
        ot = oracle(_t(x), _t(e)[em], src, dst)
    np.testing.assert_allclose(_np(out)[nm], ot.numpy()[nm], rtol=5e-4,
                               atol=1e-5)


def test_conv_edge_layer_parity(cfg):
    batch = _make_batch(False)
    p, s = C.conv_edge_init(jax.random.key(3), D, jnp.float32)
    E = int(batch.num_edges)
    ks = jax.random.split(jax.random.key(4), 3)
    e = jax.random.normal(ks[0], (E, D), jnp.float32)
    nl = jax.random.normal(ks[1], (E, 3, D), jnp.float32)
    na = jax.random.normal(ks[2], (E, 3, D), jnp.float32)
    out, _ = C.conv_edge_apply(p, s, e, nl, na, batch.edge_mask, cfg,
                               training=False)
    oracle = ConvEdgeOracle(jax.tree.map(np.asarray, p))
    with torch.no_grad():
        ot = oracle(_t(e), _t(nl), _t(na))
    np.testing.assert_allclose(_np(out), ot.numpy(), rtol=5e-4, atol=1e-5)


def test_equi_block_parity(cfg):
    batch = _make_batch(False)
    p, s = EQ.equi_block_init(jax.random.key(5), cfg, edge_dim=D)
    N, E = int(batch.num_nodes), int(batch.num_edges)
    ks = jax.random.split(jax.random.key(6), 2)
    x = jax.random.normal(ks[0], (N, D), jnp.float32)
    e = jax.random.normal(ks[1], (E, D), jnp.float32)
    out, _ = EQ.equi_block_apply(p, s, x, e, batch, cfg, training=False)
    oracle = EquiOracle(jax.tree.map(np.asarray, p))
    with torch.no_grad():
        ot = oracle(_t(x), _t(e), _t(batch.edge_src).long(),
                    _t(batch.edge_dst).long(), _t(batch.cart_dir))
    np.testing.assert_allclose(_np(out), ot.numpy(), rtol=5e-4, atol=1e-5)


# ------------------------------------------------------------ model-level

def _ecomformer_oracle(params, batch, train=False):
    """eComformer forward (comformer.py:28-70)."""
    z = _t(batch.z).long()
    x = _t(params["embedding"]["w"])[z] \
        + _lin(params["temp_proj"])(_t(batch.temperature)[:, None])[
            _t(batch.graph_id).long()]
    efeat = -0.75 / _t(batch.cart_dist)
    e = _rbf_head(params["rbf"], efeat, -4.0, 0.0)
    src, dst = _t(batch.edge_src).long(), _t(batch.edge_dst).long()
    convs = [ConvOracle(params[f"conv{i}"], train) for i in range(3)]
    equi = EquiOracle(params["equi"], train)
    x = convs[0](x, e, src, dst)
    x = equi(x, e, src, dst, _t(batch.cart_dir))
    x = convs[1](x, e, src, dst)
    x = convs[2](x, e, src, dst)
    return _cholesky_oracle(params["head"], x)


def _icomformer_oracle(params, batch, train=False):
    """iComformer forward (comformer.py:75-132)."""
    z = _t(batch.z).long()
    gid = _t(batch.graph_id).long()
    x = _t(params["embedding"]["w"])[z] \
        + _lin(params["temp_proj"])(_t(batch.temperature)[:, None])[gid]
    dist = _t(batch.cart_dist)
    cell = _t(batch.cell)                                   # [G,3,3]
    src, dst = _t(batch.edge_src).long(), _t(batch.edge_dst).long()
    e = _rbf_head(params["rbf"], -0.75 / dist, -4.0, 0.0)
    # edge_nei_len/angle from the SOURCE node's graph (comformer.py:118-124)
    gsrc = gid[src]
    rows = cell[gsrc]                                       # [E,3,3]
    nei_len = -0.75 / rows.norm(dim=-1)
    dirs = _t(batch.cart_dir)
    cosang = (rows * dirs[:, None, :]).sum(-1) / (
        rows.norm(dim=-1) * dirs.norm(dim=-1, keepdim=True))
    cosang = cosang.clamp(-1, 1)                            # bond_cosine :18-23
    nei_len = _rbf_head(params["rbf"], nei_len, -4.0, 0.0)
    nei_ang = _rbf_head(params["rbf_angle"], cosang, -1.0, 1.0)
    convs = [ConvOracle(params[f"conv{i}"], train) for i in range(4)]
    eu = ConvEdgeOracle(params["edge_update"], train)
    x = convs[0](x, e, src, dst)
    e = eu(e, nei_len, nei_ang)
    for i in (1, 2, 3):
        x = convs[i](x, e, src, dst)
    return _cholesky_oracle(params["head"], x)


@pytest.mark.parametrize("fused", [False, True])
def test_ecomformer_full_parity(cfg, fused):
    batch = _make_batch(fused)
    params, state = C.ecomformer_init(jax.random.key(8), cfg)
    pred, mask, _ = C.ecomformer_apply(params, state, batch, cfg,
                                       training=False)
    pnp = jax.tree.map(np.asarray, params)
    em = _np(batch.edge_mask).astype(bool)
    sub = batch.replace(
        edge_src=batch.edge_src[em], edge_dst=batch.edge_dst[em],
        cart_dist=batch.cart_dist[em], cart_dir=batch.cart_dir[em])
    with torch.no_grad():
        ot = _ecomformer_oracle(pnp, sub)
    m = _np(mask).astype(bool)
    np.testing.assert_allclose(_np(pred)[m], ot.numpy()[m], rtol=2e-3,
                               atol=2e-5)


@pytest.mark.parametrize("fused", [False, True])
def test_icomformer_full_parity(cfg, fused):
    batch = _make_batch(fused)
    params, state = C.icomformer_init(jax.random.key(9), cfg)
    pred, mask, _ = C.icomformer_apply(params, state, batch, cfg,
                                       training=False)
    pnp = jax.tree.map(np.asarray, params)
    em = _np(batch.edge_mask).astype(bool)
    sub = batch.replace(
        edge_src=batch.edge_src[em], edge_dst=batch.edge_dst[em],
        cart_dist=batch.cart_dist[em], cart_dir=batch.cart_dir[em])
    with torch.no_grad():
        ot = _icomformer_oracle(pnp, sub)
    m = _np(mask).astype(bool)
    np.testing.assert_allclose(_np(pred)[m], ot.numpy()[m], rtol=2e-3,
                               atol=2e-5)


def test_conv_train_mode_bn_parity(cfg):
    """Train-mode BN batch stats through the conv: JAX masked BN over real
    edges/nodes == torch BN over the exact-size batch."""
    batch = _make_batch(False)
    p, s = C.conv_init(jax.random.key(10), D, jnp.float32)
    ks = jax.random.split(jax.random.key(11), 2)
    N, E = int(batch.num_nodes), int(batch.num_edges)
    x = jax.random.normal(ks[0], (N, D), jnp.float32)
    e = jax.random.normal(ks[1], (E, D), jnp.float32)
    out, new_s = C.conv_apply(p, s, x, e, batch, cfg, training=True)
    oracle = ConvOracle(jax.tree.map(np.asarray, p), train=True)
    with torch.no_grad():
        ot = oracle(_t(x), _t(e), _t(batch.edge_src).long(),
                    _t(batch.edge_dst).long())
    np.testing.assert_allclose(_np(out), ot.numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(_np(new_s["bn_att"]["mean"]),
                               oracle.bn_att.running_mean, rtol=1e-4,
                               atol=1e-7)
    np.testing.assert_allclose(_np(new_s["bn_att"]["var"]),
                               oracle.bn_att.running_var, rtol=1e-4,
                               atol=1e-7)
