"""Component microbenchmarks: edge GEMM, gather, segment_sum, masked BN.

Attributes the train-step time to individual ops at the bench shapes.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=17408)
    ap.add_argument("--nodes", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cartnet_tpu.nn.norm import batch_norm_init, masked_batch_norm

    E, N, D = args.edges, args.nodes, args.dim
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    xe = jax.random.normal(ks[0], (E, D), dt)
    xn = jax.random.normal(ks[1], (N, D), dt)
    w = jax.random.normal(ks[2], (D, D), dt)
    w3 = jax.random.normal(ks[3], (3 * D, D), dt)
    dst = jnp.sort(jax.random.randint(ks[4], (E,), 0, N))
    src = jax.random.randint(ks[5], (E,), 0, N)
    emask = jnp.ones((E,), bool)

    def timed(name, fn, *a, flops=0):
        f = jax.jit(fn)
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*a)
        jax.block_until_ready(out)
        dtm = (time.perf_counter() - t0) / args.iters
        extra = f"  {flops / dtm / 1e12:6.1f} TF/s" if flops else ""
        print(f"{name:<28} {dtm * 1e6:9.1f} us{extra}")

    timed("edge GEMM [E,D]x[D,D]", lambda a, b: a @ b, xe, w,
          flops=2 * E * D * D)
    timed("edge GEMM [E,3D]x[3D,D]", lambda a, b: a @ b,
          jnp.concatenate([xe, xe, xe], -1), w3, flops=2 * E * 3 * D * D)
    timed("gather x[dst] [N,D]->[E,D]", lambda x, i: jnp.take(x, i, axis=0),
          xn, dst)
    timed("gather+gather+add", lambda x, i, j: jnp.take(x, i, 0) + jnp.take(x, j, 0),
          xn, dst, src)
    timed("segment_sum sorted", lambda v, i: jax.ops.segment_sum(
        v, i, num_segments=N, indices_are_sorted=True), xe, dst)
    timed("segment_sum unsorted", lambda v, i: jax.ops.segment_sum(
        v, i, num_segments=N, indices_are_sorted=False), xe, src)

    bnp, bns = batch_norm_init(D, dt)
    timed("masked BN train [E,D]",
          lambda p, s, x, m: masked_batch_norm(p, s, x, m, training=True)[0],
          bnp, bns, xe, emask)
    timed("sigmoid+mul [E,D]", lambda a, b: jax.nn.sigmoid(a) * b, xe, xe)
    timed("silu [E,D]", jax.nn.silu, xe)

    # fused layer-like chain to observe fusion quality
    def chain(xn_, xe_, w_, i, j):
        pre = jnp.take(xn_ @ w_, i, 0) + jnp.take(xn_ @ w_, j, 0) + xe_ @ w_
        h = jax.nn.silu(pre) @ w_
        return jax.ops.segment_sum(jax.nn.sigmoid(h) * h, i, num_segments=N,
                                   indices_are_sorted=True)
    timed("layer-ish chain", chain, xn, xe, w, dst, src,
          flops=2 * E * D * D * 2 + 2 * 2 * N * D * D)


if __name__ == "__main__":
    main()
