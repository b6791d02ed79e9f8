"""Gradient accumulation (TPU.GRAD_ACCUM_STEPS): the scanned micro-batch
step must reproduce, exactly, the hand-rolled combination it documents —
summed gradients of [global-num_masks-normalized mask terms + 1/accum-scaled
CE terms] over the strided micro-batch split, followed by ONE optimizer
update. (Equality with the monolithic step is approximate by construction:
matcher/loss point draws consume differently split rngs.)"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from mp_former_tpu.engine.optimizer import build_optimizer
from mp_former_tpu.engine.train_step import (
    Batch, create_train_state, make_train_step)
from mp_former_tpu.models import build_model
from mp_former_tpu.models.criterion import build_criterion
from mp_former_tpu.structures import Targets

from test_data_parallel import _setup, _batch


def test_accum_matches_manual_combination():
    cfg = _setup(1)
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    batch = _batch(b=4)
    accum = 2

    params = model.init(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch.images, batch.targets, train=True)["params"]
    # SGD, not build_optimizer: the check below compares post-update params,
    # and Adam's per-element normalization turns scan-vs-unrolled fp noise
    # (~1e-8 on near-zero grads) into sign flips of the whole update. A
    # linear tx keeps the comparison about the accumulation math.
    import optax
    tx = optax.sgd(1e-3)
    state = create_train_state(params, tx)

    rng = jax.random.PRNGKey(9)
    step = make_train_step(model, criterion, tx, donate=False, accum=accum)
    new_state, metrics = step(state, batch, rng)

    # ---- manual reference: same rng derivation as train_step ----------
    rng_dn, rng_drop, rng_loss = jax.random.split(
        jax.random.fold_in(rng, state.step), 3)
    dn_rngs = jax.random.split(rng_dn, accum)
    drop_rngs = jax.random.split(rng_drop, accum)
    loss_rngs = jax.random.split(rng_loss, accum)
    num_masks = jnp.maximum(
        batch.targets.valid.sum().astype(jnp.float32), 1.0)
    b = batch.images.shape[0]
    micros = jax.tree.map(
        lambda x: jnp.swapaxes(
            x.reshape((b // accum, accum) + x.shape[1:]), 0, 1), batch)

    def micro_loss(p, micro, rdn, rdrop, rloss):
        out = model.apply({"params": p}, micro.images, micro.targets,
                          train=True, rngs={"dn": rdn, "dropout": rdrop})
        losses = criterion(out, micro.targets, rloss, num_masks=num_masks)
        scaled = {k: v / accum if k.startswith("loss_ce") else v
                  for k, v in losses.items()}
        return criterion.weighted_total(scaled), losses

    g_total = None
    t_total = 0.0
    l_total = None
    for i in range(accum):
        micro = jax.tree.map(lambda x: x[i], micros)
        (t, losses), g = jax.value_and_grad(micro_loss, has_aux=True)(
            state.params, micro, dn_rngs[i], drop_rngs[i], loss_rngs[i])
        t_total = t_total + t
        g_total = g if g_total is None else jax.tree.map(jnp.add, g_total, g)
        l_total = losses if l_total is None else jax.tree.map(
            jnp.add, l_total, losses)

    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(t_total), rtol=2e-5)
    for k, v in l_total.items():
        want = v / accum if k.startswith("loss_ce") else v
        np.testing.assert_allclose(
            float(metrics[k]), float(want), rtol=2e-5, err_msg=k)

    updates, _ = tx.update(g_total, state.opt_state, state.params)
    want_params = optax.apply_updates(state.params, updates)
    flat_got = jax.tree_util.tree_leaves(new_state.params)
    flat_want = jax.tree_util.tree_leaves(want_params)
    for got, want in zip(flat_got, flat_want):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-4, atol=1e-6)


def test_accum_rejects_host_exact_assignments():
    cfg = _setup(1)
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    batch = _batch(b=4)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch.images, batch.targets, train=True)["params"]
    tx = build_optimizer(cfg, params)
    state = create_train_state(params, tx)
    step = make_train_step(model, criterion, tx, donate=False, accum=2)
    fake = jnp.zeros((4, 4, 3), jnp.int32)
    with pytest.raises(ValueError, match="GRAD_ACCUM_STEPS"):
        step(state, batch, jax.random.PRNGKey(0), assignments=fake)


def test_split_step_matches_monolithic():
    """TPU.SPLIT_STEP compiles grad-accumulation and optimizer update as
    two programs; the combined result must equal the monolithic step
    bit-for-bit (same rng derivation, same math, only the jit boundary
    moves)."""
    cfg = _setup(1)
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    batch = _batch(b=4)

    params = model.init(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch.images, batch.targets, train=True)["params"]
    import optax
    tx = optax.sgd(1e-3)
    rng = jax.random.PRNGKey(9)

    for accum in (1, 2):
        mono = make_train_step(model, criterion, tx, donate=False,
                               accum=accum)
        split = make_train_step(model, criterion, tx, donate=False,
                                accum=accum, split=True)
        s_m, m_m = mono(create_train_state(params, tx), batch, rng)
        s_s, m_s = split(create_train_state(params, tx), batch, rng)
        assert int(s_s.step) == int(s_m.step) == 1
        np.testing.assert_allclose(
            float(m_s["total_loss"]), float(m_m["total_loss"]),
            rtol=1e-6, atol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
            s_m.params, s_s.params)


def test_host_accum_matches_scanned_accum():
    """TPU.HOST_ACCUM: host-driven micro loop == the lax.scan form (same
    rng derivation, same strided split, same accumulation order)."""
    cfg = _setup(1)
    model = build_model(cfg)
    criterion = build_criterion(cfg)
    batch = _batch(b=4)

    params = model.init(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch.images, batch.targets, train=True)["params"]
    import optax
    tx = optax.sgd(1e-3)
    rng = jax.random.PRNGKey(9)
    accum = 2

    scan = make_train_step(model, criterion, tx, donate=False, accum=accum)
    host = make_train_step(model, criterion, tx, donate=False, accum=accum,
                           host_accum=True)
    s_a, m_a = scan(create_train_state(params, tx), batch, rng)
    s_h, m_h = host(create_train_state(params, tx), batch, rng)
    np.testing.assert_allclose(
        float(m_h["total_loss"]), float(m_a["total_loss"]),
        rtol=1e-6, atol=1e-6)
    for k in m_a:
        np.testing.assert_allclose(
            float(m_h[k]), float(m_a[k]), rtol=1e-5, atol=1e-6,
            err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        s_a.params, s_h.params)
