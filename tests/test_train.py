"""Schedule parity vs torch OneCycleLR, training smoke, checkpoint resume."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cartnet_tpu.config import Config, DataConfig, ModelConfig, OptimConfig
from cartnet_tpu.data.batching import collate
from cartnet_tpu.data.synthetic import synthetic_dataset
from cartnet_tpu.models.cartnet import cartnet_apply, cartnet_init
from cartnet_tpu.train.loop import (build_optimizer, eval_epoch,
                                    init_train_state, make_steps, train_epoch)
from cartnet_tpu.train.schedule import (onecycle_beta1, onecycle_lr,
                                        reference_total_steps)


def test_onecycle_lr_matches_pytorch():
    total, max_lr, pct = 57, 1e-3, 0.1
    sched = onecycle_lr(max_lr, total, pct)
    b1sched = onecycle_beta1(total, pct)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=max_lr)
    tsched = torch.optim.lr_scheduler.OneCycleLR(opt, max_lr=max_lr,
                                                 total_steps=total,
                                                 pct_start=pct)
    for t in range(total):
        want_lr = opt.param_groups[0]["lr"]
        want_b1 = opt.param_groups[0]["betas"][0]
        np.testing.assert_allclose(float(sched(t)), want_lr, rtol=1e-5,
                                   err_msg=f"lr step {t}")
        np.testing.assert_allclose(float(b1sched(t)), want_b1, rtol=1e-5,
                                   err_msg=f"b1 step {t}")
        opt.step()
        tsched.step()


def test_reference_total_steps_formula():
    # train/train.py:59: max_epoch*len(loader)//accum + max_epoch
    assert reference_total_steps(50, 1000, 16) == 50 * 1000 // 16 + 50
    assert reference_total_steps(500, 10, 1) == 5500


def _tiny_cfg():
    return Config(
        model=ModelConfig(dim_in=32, dim_rbf=8, num_layers=2, cholesky=False),
        data=DataConfig(name="synthetic", max_nodes=128, max_edges=4096,
                        max_graphs=4, batch_size=4),
        optim=OptimConfig(lr=1e-3, max_epoch=3, batch_accumulation=2))


def _tiny_batches(cfg, n_batches=4, seed=0, adp=False):
    recs = synthetic_dataset(n_batches * 4, mean_atoms=10, adp=adp, seed=seed)
    # scale targets to O(1)
    return [collate(recs[i * 4:(i + 1) * 4], cfg.data.max_nodes,
                    cfg.data.max_edges, cfg.data.max_graphs)
            for i in range(n_batches)]


def test_training_reduces_loss():
    cfg = _tiny_cfg()
    batches = _tiny_batches(cfg)
    opt = build_optimizer(cfg, len(batches))
    state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    micro, update, evals = make_steps(cfg, cartnet_apply, opt)

    def epoch_loss(state):
        tot = 0.0
        for b in batches:
            _, _, stats = evals(state.params, state.bn_state, b)
            tot += float(stats["loss"])
        return tot / len(batches)

    before = epoch_loss(state)
    for _ in range(cfg.optim.max_epoch):
        state = train_epoch(state, batches, micro, update,
                            cfg.optim.batch_accumulation)
    after = epoch_loss(state)
    assert after < before, (before, after)
    assert int(state.step) == 3 * 2  # ceil(4/2)=2 updates/epoch × 3 epochs


def test_grad_accum_epoch_end_flush():
    cfg = _tiny_cfg()
    batches = _tiny_batches(cfg, n_batches=3)  # 3 % 2 != 0 -> flush at end
    opt = build_optimizer(cfg, len(batches))
    state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    micro, update, _ = make_steps(cfg, cartnet_apply, opt)
    state = train_epoch(state, batches, micro, update, 2)
    assert int(state.step) == 2  # one at iter 2, one flush
    assert int(state.accum_count) == 0


def test_checkpoint_roundtrip(tmp_path):
    from cartnet_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    cfg = _tiny_cfg()
    batches = _tiny_batches(cfg, n_batches=2)
    opt = build_optimizer(cfg, len(batches))
    state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    micro, update, evals = make_steps(cfg, cartnet_apply, opt)
    state = train_epoch(state, batches, micro, update, 2)
    save_checkpoint(str(tmp_path / "ckpt"), state, {"epoch": 0, "best": 1.5})

    template = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    restored, meta = restore_checkpoint(str(tmp_path / "ckpt"), template)
    assert meta["epoch"] == 0 and meta["best"] == 1.5
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # continuing from restored state must produce identical results
    p1, _, s1 = None, None, state
    s2 = restored
    s1, st1 = micro(s1, batches[0])
    s2, st2 = micro(s2, batches[0])
    np.testing.assert_allclose(float(st1["loss"]), float(st2["loss"]), rtol=1e-6)


def test_fused_scan_steps_match_sequential():
    """K fused lax.scan train steps == K sequential micro+update steps."""
    from cartnet_tpu.train.loop import make_fused_steps, stack_batches
    cfg = _tiny_cfg().replace(optim=OptimConfig(lr=1e-3, max_epoch=3,
                                                batch_accumulation=1))
    batches = _tiny_batches(cfg, n_batches=4)
    opt = build_optimizer(cfg, len(batches))

    s_seq = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    micro, update, _ = make_steps(cfg, cartnet_apply, opt)
    for b in batches:
        s_seq, _ = micro(s_seq, b)
        s_seq = update(s_seq)

    s_fused = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    fused = make_fused_steps(cfg, cartnet_apply, opt, len(batches))
    s_fused, stats = fused(s_fused, stack_batches(batches))

    assert int(s_fused.step) == int(s_seq.step) == len(batches)
    # scan vs unrolled reorders float reductions; Adam normalizes by |g| so
    # the noise lands at the lr-scale of the updates — bound by a fraction of
    # the total update magnitude (4 steps x lr 1e-3)
    for a, b in zip(jax.tree.leaves(s_seq.params),
                    jax.tree.leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=5e-4)
    for a, b in zip(jax.tree.leaves(s_seq.bn_state),
                    jax.tree.leaves(s_fused.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=1e-4)
    assert stats["loss"].shape == (len(batches),)


def test_bf16_compute_trains_and_reduces_loss():
    import jax.numpy as jnp
    from cartnet_tpu.config import ModelConfig
    cfg = _tiny_cfg()
    cfg = cfg.replace(model=ModelConfig(dim_in=32, dim_rbf=8, num_layers=2,
                                        cholesky=False,
                                        compute_dtype=jnp.bfloat16))
    batches = _tiny_batches(cfg)
    opt = build_optimizer(cfg, len(batches))
    state = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    micro, update, evals = make_steps(cfg, cartnet_apply, opt)
    _, _, s0 = evals(state.params, state.bn_state, batches[0])
    before = float(s0["loss"])
    for _ in range(3):
        state = train_epoch(state, batches, micro, update, 1)
    _, _, s1 = evals(state.params, state.bn_state, batches[0])
    after = float(s1["loss"])
    assert np.isfinite(after)
    assert after < before, (before, after)


def test_fused_chunk_epoch_matches_per_batch_loop():
    """make_fused_chunk/train_epoch_fused == micro+update loop: same optimizer
    step count (incl. epoch-end flush and ragged dummy chunks) and matching
    params/BN state."""
    from cartnet_tpu.train.loop import (make_fused_chunk, train_epoch_fused)
    cfg = _tiny_cfg()  # batch_accumulation=2
    batches = _tiny_batches(cfg, n_batches=5)  # 5 % 2 != 0 -> flush;
    opt = build_optimizer(cfg, len(batches))

    s_ref = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    micro, update, _ = make_steps(cfg, cartnet_apply, opt)
    s_ref = train_epoch(s_ref, batches, micro, update,
                        cfg.optim.batch_accumulation)

    s_fused = init_train_state(jax.random.key(0), cfg, cartnet_init, opt)
    chunk = make_fused_chunk(cfg, cartnet_apply, opt, 2)  # 3 chunks, 1 dummy
    _, update2, _ = make_steps(cfg, cartnet_apply, opt)
    s_fused = train_epoch_fused(s_fused, batches, chunk, 2, update2)

    assert int(s_fused.step) == int(s_ref.step) == 3  # 2 updates + flush
    assert int(s_fused.accum_count) == 0
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=5e-4)
    for a, b in zip(jax.tree.leaves(s_ref.bn_state),
                    jax.tree.leaves(s_fused.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=1e-4)
