"""Minimal functional NN core: explicit pytree params, pure apply functions.

Design: every module is an ``init(key, ...) -> params`` plus a pure
``apply(params, x, ...)``. Params are nested dicts of jnp arrays — trivially
shardable with jax.sharding, checkpointable with orbax, and transparent to
pjit/shard_map. No global state, no tracing-hostile mutation.

Initializers mirror PyTorch defaults so that training dynamics match the
reference (torch.nn.Linear kaiming-uniform ≡ U(±1/sqrt(fan_in));
reference embedding uses xavier_uniform: /root/reference/models/cartnet.py:114).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def torch_linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                      dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both W and b (torch.nn.Linear)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear(params, x):
    y = jnp.dot(x, params["w"], preferred_element_type=x.dtype)
    if "b" in params:
        y = y + params["b"]
    return y


@jax.custom_vjp
def _linear_mb(x, w, b):
    return jnp.dot(x, w, preferred_element_type=x.dtype) + b


def _linear_mb_fwd(x, w, b):
    return _linear_mb(x, w, b), (x, w)


def _linear_mb_bwd(res, ct):
    x, w = res
    dx = jnp.dot(ct, w.T, preferred_element_type=ct.dtype)
    dw = jnp.dot(x.T, ct,
                 preferred_element_type=jnp.float32).astype(w.dtype)
    # 8 identical ones-rows: a [1, E] dot gets canonicalized by XLA back
    # into the same pathological kLoop row reduce (measured — identical
    # 360k-cycle schedule); 8 rows is the sublane tile, forcing a real MXU
    # GEMM lowering. Row 0 is the bias cotangent.
    ones = jnp.ones((8, ct.shape[0]), ct.dtype)
    db = jnp.dot(ones, ct,
                 preferred_element_type=jnp.float32)[0].astype(w.dtype)
    return dx, dw, db


_linear_mb.defvjp(_linear_mb_fwd, _linear_mb_bwd)


def linear_mxu_bias(params, x):
    """``linear`` with the bias cotangent computed as a ones-row MXU dot.

    XLA's autodiff lowers db = sum(ct, axis=0) to a kLoop row reduce that its
    TPU cost model occasionally schedules pathologically: the iComformer
    lin_concate bias grad ran 286 us/step (est. 360k cycles) for a
    [21k, 256] bf16 cotangent that the equivalent [1, E] @ [E, 256] MXU dot
    does in <10 us (PERF_NOTES round-5 session 2, fusion.2318). Forward and
    dx/dw math are identical to ``linear``; db accumulates in f32 like the
    XLA reduce."""
    if "b" not in params:
        return linear(params, x)
    return _linear_mb(x, params["w"], params["b"])


def embedding_init(key, num_embeddings: int, dim: int, dtype=jnp.float32,
                   init: str = "xavier"):
    if init == "xavier":
        w = xavier_uniform(key, (num_embeddings, dim), dtype)
    else:  # torch default: N(0, 1)
        w = jax.random.normal(key, (num_embeddings, dim), dtype)
    return {"w": w}


def embedding(params, idx):
    return jnp.take(params["w"], idx, axis=0)


def embedding_onehot(params, idx, dtype):
    """Embedding lookup as a one-hot MXU matmul.

    Bit-exact with ``embedding`` (each output row copies exactly one table
    row), but its transpose/backward is a dense one-hot matmul instead of
    the serial VMEM-bound scatter XLA emits for take's VJP — xprof'd at
    ~19 us/step vs sub-us on the MXU at flagship shapes (PERF_NOTES).
    Use on hot per-step paths with SMALL tables (cost scales with rows)."""
    w = params["w"].astype(dtype)
    return gather_rows_onehot(w, idx, w.shape[0], dtype)


def gather_rows_onehot(values, ids, num_rows: int, dtype):
    """``values[ids]`` as a one-hot MXU matmul (exact row copies).

    Same rationale as ``embedding_onehot``: the dense one-hot dot makes the
    backward an MXU matmul instead of XLA's serial scatter VJP for take.
    Only worth it for SMALL tables (cost scales with num_rows) — e.g.
    per-graph rows gathered by graph_id."""
    oh = (ids[:, None] == jnp.arange(num_rows, dtype=ids.dtype)[None, :])
    return jnp.dot(oh.astype(dtype), values.astype(dtype),
                   preferred_element_type=dtype)


def cast_params(params, compute_dtype, param_dtype):
    """Cast float params once at the top of a model apply (XLA fuses the
    casts); BN statistics and losses stay f32 elsewhere. Without this every
    GEMM runs at the param dtype — measured 5.6x slower for iComformer when
    its apply skipped the cast (f32 MXU passes + doubled HBM traffic)."""
    if compute_dtype == param_dtype:
        return params
    import jax as _jax
    return _jax.tree.map(
        lambda a: a.astype(compute_dtype) if a.dtype == param_dtype else a,
        params)


def mlp_init(key, dims: Sequence[int], bias: bool = True, dtype=jnp.float32):
    """Params for a chain of Linear layers; activations applied by caller."""
    keys = jax.random.split(key, len(dims) - 1)
    return {f"lin{i}": torch_linear_init(k, dims[i], dims[i + 1], bias, dtype)
            for i, k in enumerate(keys)}


def mlp_silu(params, x, num_layers: int, final_act: bool = False):
    """Linear → SiLU → … → Linear [→ SiLU]. num_layers = number of Linears."""
    for i in range(num_layers):
        x = linear(params[f"lin{i}"], x)
        if i < num_layers - 1 or final_act:
            x = jax.nn.silu(x)
    return x


def silu(x):
    return jax.nn.silu(x)


def softplus(x):
    return jax.nn.softplus(x)
