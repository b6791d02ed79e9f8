"""Jitted training / eval step builders.

One `jax.jit`-compiled function covers the reference's whole hot path
(train_net.py run_step -> MaskFormer.forward -> criterion -> backward -> DDP
allreduce -> optimizer.step): under GSPMD the batch is sharded over the
`data` mesh axis and gradient reduction + num_masks psum fall out of the
partitioner automatically.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..structures import Targets, unpack_batch_masks


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


class Batch(NamedTuple):
    images: jax.Array          # (B, H, W, 3) raw RGB
    targets: Targets


def create_train_state(params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def compute_dn_groups(scalar: int, valid, bucket: int = 1) -> Optional[tuple]:
    """Host-side (group count, batch max GT) for the NUM_DN >= 100
    convention: the reference treats scalar as a total-query budget, divides
    by the BATCH max GT count, and pads the DN block to groups * batch_max
    (mask2former_transformer_decoder.py:973-974) — so the block stays ~the
    budget, not groups * static-cap. Both values are static shapes under
    jit, so they must be computed on host; every distinct pair compiles a
    new step (only NUM_DN >= 100 configs pay this — the released recipe
    uses scalar=1).

    bucket > 1 (TPU.DN_GROUP_BUCKET) rounds the batch-max up to the next
    multiple of `bucket` before the division, bounding the number of
    distinct compiled step programs to DN_MAX_GT/bucket instead of one per
    distinct batch-max seen (on real COCO with B=16 that is dozens of
    multi-minute compiles). The extra (bucketed_max - true_max) slots per
    group carry valid=False and are already ignored by the DN losses; the
    group COUNT can differ from the reference's when the round-up crosses
    a divisor boundary, so bucket=1 (reference-exact) is the default."""
    if scalar < 100:
        return None
    import numpy as np

    m = max(int(np.asarray(valid).sum(-1).max()), 1)
    if bucket > 1:
        cap = int(np.asarray(valid).shape[-1])
        m = min(-(-m // bucket) * bucket, cap)
    return max(1, scalar // m), m


def make_train_step(model, criterion, tx, donate: bool = True,
                    accum: int = 1, split: bool = False,
                    host_accum: bool = False):
    """Returns jitted train_step(state, batch, rng, dn_groups=None,
    assignments=None) -> (state, metrics). dn_groups is static (see
    compute_dn_groups); assignments (L, B, N) comes from the host-exact
    two-phase mode (make_cost_step) and skips the in-program matcher.

    accum > 1 (TPU.GRAD_ACCUM_STEPS) splits the batch into `accum`
    micro-batches and lax.scans the forward/backward, accumulating
    gradients before ONE optimizer update — activation memory scales with
    B/accum, letting the published bs16@1024 recipe shapes run on one
    chip. Semantics vs the monolithic step: mask/dice losses are EXACT
    (each micro term is normalized by the GLOBAL num_masks, reference
    all_reduce criterion.py:235-237, so the micro sums equal the
    full-batch loss); loss_ce* are weighted means over their micro-batch
    and are averaged across micro-batches — exact when micro-batches have
    equal no-object weight mass, the standard grad-accumulation
    approximation otherwise. Matching stays per-image, so assignments are
    unaffected by the split.

    split=True (TPU.SPLIT_STEP) compiles TWO programs — grad accumulation
    (params in, grads out) and optimizer update (state+grads in, state
    out) — instead of one. Identical math (pinned by
    tests/test_grad_accum.py); one extra dispatch per step. This exists
    because the runtime client aborts after executing a single program
    that combines the bs16@1024-scale body with the full ~1900-buffer
    state I/O (PERFORMANCE.md round 4): each half stays under whatever
    the client's real limit is.

    host_accum=True (TPU.HOST_ACCUM, implies the split layout) goes one
    step further for the same client bug: the micro-batch loop moves from
    `lax.scan` to the HOST — one jitted micro-step program (fwd+bwd of
    B/accum images + accumulate into donated grad buffers) invoked accum
    times, then the update program. Each invocation matches the program
    scale the runtime demonstrably sustains for thousands of steps
    (B=8@512px); per-step cost is accum-1 extra ~30 ms dispatches.
    Identical math to the scanned form: same rng derivation, same
    sequential accumulation order (pinned by tests/test_grad_accum.py)."""

    def train_step(state: TrainState, batch: Batch, rng: jax.Array,
                   dn_groups: Optional[int] = None,
                   assignments: Optional[jax.Array] = None):
        grads, total, losses = grad_fn(
            state.params, batch, rng, state.step, dn_groups, assignments)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"total_loss": total, **losses}
        return TrainState(state.step + 1, new_params, new_opt), metrics

    def grad_fn(params, batch: Batch, rng: jax.Array, step: jax.Array,
                dn_groups: Optional[int] = None,
                assignments: Optional[jax.Array] = None):
        state = TrainState(step=step, params=params, opt_state=None)
        batch = unpack_batch_masks(batch)
        rng_dn, rng_drop, rng_loss = jax.random.split(
            jax.random.fold_in(rng, state.step), 3)
        # global valid-instance count (reference all_reduce, criterion.py:235-237)
        num_masks = jnp.maximum(
            batch.targets.valid.sum().astype(jnp.float32), 1.0)

        if accum == 1:
            def loss_fn(params):
                outputs = model.apply(
                    {"params": params}, batch.images, batch.targets,
                    train=True, dn_groups=dn_groups,
                    rngs={"dn": rng_dn, "dropout": rng_drop})
                losses = criterion(outputs, batch.targets, rng_loss,
                                   num_masks=num_masks,
                                   assignments=assignments)
                total = criterion.weighted_total(losses)
                return total, losses

            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        else:
            if assignments is not None:
                raise ValueError(
                    "TPU.GRAD_ACCUM_STEPS > 1 is not supported together "
                    "with TPU.MATCHER_HOST_EXACT (the host cost pass would "
                    "need the same micro-batch split)")
            b = batch.images.shape[0]
            # strided split (B,) -> (B//accum, accum) -> scan axis first:
            # device d's batch rows spread one per micro-batch, so every
            # micro step keeps the full data-parallel mesh busy
            micros = jax.tree.map(
                lambda x: jnp.swapaxes(
                    x.reshape((b // accum, accum) + x.shape[1:]), 0, 1),
                batch)
            micro_rngs = (jax.random.split(rng_dn, accum),
                          jax.random.split(rng_drop, accum),
                          jax.random.split(rng_loss, accum))

            def micro_loss(params, micro, rdn, rdrop, rloss):
                outputs = model.apply(
                    {"params": params}, micro.images, micro.targets,
                    train=True, dn_groups=dn_groups,
                    rngs={"dn": rdn, "dropout": rdrop})
                losses = criterion(outputs, micro.targets, rloss,
                                   num_masks=num_masks)
                # CE terms are per-micro means: scale so the accumulated
                # total (and its gradient) averages them, while the
                # globally normalized mask terms sum exactly
                scaled = {k: v / accum if k.startswith("loss_ce") else v
                          for k, v in losses.items()}
                return criterion.weighted_total(scaled), losses

            def body(carry, xs):
                g_acc, t_acc, l_acc = carry
                micro, rdn, rdrop, rloss = xs
                (t, losses), g = jax.value_and_grad(
                    micro_loss, has_aux=True)(
                        state.params, micro, rdn, rdrop, rloss)
                return (jax.tree.map(jnp.add, g_acc, g), t_acc + t,
                        jax.tree.map(jnp.add, l_acc, losses)), None

            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            _, l0 = jax.eval_shape(
                lambda: micro_loss(
                    state.params,
                    jax.tree.map(lambda x: x[0], micros),
                    micro_rngs[0][0], micro_rngs[1][0], micro_rngs[2][0]))
            zero_l = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), l0)
            (grads, total, loss_sums), _ = jax.lax.scan(
                body, (zero_g, jnp.zeros(()), zero_l),
                (micros,) + micro_rngs)
            losses = {k: v / accum if k.startswith("loss_ce") else v
                      for k, v in loss_sums.items()}

        return grads, total, losses

    if not split and not host_accum:
        return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                       static_argnames=("dn_groups",))

    def update_fn(state: TrainState, grads):
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, new_opt)

    update_jit = jax.jit(update_fn,
                         donate_argnums=(0, 1) if donate else ())

    if host_accum and accum > 1:
        # host-driven accumulation: one compiled micro program (plus a
        # first-micro variant that initializes the carry), invoked accum
        # times per step. Everything (rng derivation, strided micro
        # slicing, num_masks, CE scaling) reproduces the scanned form
        # exactly; k is a traced scalar so all micros share one program.
        def _micro_eval(params, batch: Batch, rng, step, k,
                        dn_groups: Optional[int]):
            rng_dn, rng_drop, rng_loss = jax.random.split(
                jax.random.fold_in(rng, step), 3)
            rdn = jax.random.split(rng_dn, accum)[k]
            rdrop = jax.random.split(rng_drop, accum)[k]
            rloss = jax.random.split(rng_loss, accum)[k]
            num_masks = jnp.maximum(
                batch.targets.valid.sum().astype(jnp.float32), 1.0)
            b = batch.images.shape[0]
            # micros[k] == row slice [k::accum] == the scanned split
            micro = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x.reshape((b // accum, accum) + x.shape[1:]), k,
                    axis=1, keepdims=False),
                batch)
            micro = unpack_batch_masks(micro)

            def micro_loss(params):
                outputs = model.apply(
                    {"params": params}, micro.images, micro.targets,
                    train=True, dn_groups=dn_groups,
                    rngs={"dn": rdn, "dropout": rdrop})
                losses = criterion(outputs, micro.targets, rloss,
                                   num_masks=num_masks)
                scaled = {k2: v / accum if k2.startswith("loss_ce") else v
                          for k2, v in losses.items()}
                return criterion.weighted_total(scaled), losses

            (t, losses), g = jax.value_and_grad(
                micro_loss, has_aux=True)(params)
            return g, t, losses

        def micro_first(params, batch, rng, step, k,
                        dn_groups: Optional[int] = None):
            return _micro_eval(params, batch, rng, step, k, dn_groups)

        def micro_next(params, carry, batch, rng, step, k,
                       dn_groups: Optional[int] = None):
            g, t, losses = _micro_eval(params, batch, rng, step, k,
                                       dn_groups)
            g_acc, t_acc, l_acc = carry
            return (jax.tree.map(jnp.add, g_acc, g), t_acc + t,
                    jax.tree.map(jnp.add, l_acc, losses))

        first_jit = jax.jit(micro_first, static_argnames=("dn_groups",))
        next_jit = jax.jit(micro_next,
                           donate_argnums=(1,) if donate else (),
                           static_argnames=("dn_groups",))

        def host_step(state: TrainState, batch: Batch, rng: jax.Array,
                      dn_groups: Optional[int] = None,
                      assignments: Optional[jax.Array] = None):
            if assignments is not None:
                raise ValueError(
                    "TPU.HOST_ACCUM is not supported together with "
                    "TPU.MATCHER_HOST_EXACT (the host cost pass would "
                    "need the same micro-batch split)")
            import os
            dbg = bool(os.environ.get("MPF_STEP_DEBUG"))
            dbg_fetch = bool(os.environ.get("MPF_STEP_DEBUG_FETCH"))

            def _dbg(msg, x=None, fetch=None):
                if dbg:
                    if x is not None:
                        jax.block_until_ready(x)
                    if dbg_fetch and fetch is not None:
                        msg += f" fetch={float(fetch):.3f}"
                    print(f"[host_step] {msg}", flush=True)

            carry = first_jit(state.params, batch, rng, state.step,
                              jnp.int32(0), dn_groups=dn_groups)
            _dbg("micro 0 done", carry, fetch=carry[1])
            for k in range(1, accum):
                carry = next_jit(state.params, carry, batch, rng,
                                 state.step, jnp.int32(k),
                                 dn_groups=dn_groups)
                _dbg(f"micro {k} done", carry, fetch=carry[1])
            grads, total, loss_sums = carry
            losses = {k2: v / accum if k2.startswith("loss_ce") else v
                      for k2, v in loss_sums.items()}
            new_state = update_jit(state, grads)
            _dbg("update done", new_state.params)
            return new_state, {"total_loss": total, **losses}

        return host_step

    # two-program mode: grads (the heavy body, params-only I/O) and the
    # optimizer update (full state I/O, trivial body). The batch is never
    # donated (callers may reuse it); donation applies to the update's
    # state+grads, where it halves live state buffers.
    grad_jit = jax.jit(grad_fn, static_argnames=("dn_groups",))

    def split_step(state: TrainState, batch: Batch, rng: jax.Array,
                   dn_groups: Optional[int] = None,
                   assignments: Optional[jax.Array] = None):
        grads, total, losses = grad_jit(
            state.params, batch, rng, state.step,
            dn_groups=dn_groups, assignments=assignments)
        new_state = update_jit(state, grads)
        return new_state, {"total_loss": total, **losses}

    return split_step


def make_cost_step(model, criterion):
    """Phase A of the host-exact matcher mode (the reference solves its LSA
    on the host CPU every step — matcher.py runs under no_grad on detached
    costs; this TPU runtime rejects host callbacks inside jit, so the hop
    is two jitted programs around a host scipy solve):

        costs = cost_step(state, batch, rng, dn_groups)   # (L, B, Q, N)
        assignments = solve on host (models.matcher._lsa_host)
        state, m = train_step(..., assignments=assignments)

    The rng folding mirrors train_step EXACTLY (fold_in(step) -> split 3 ->
    dn/dropout/loss; layer_costs consumes rng_loss identically), so the
    forward in phase B reproduces the same DN noise and the same matcher
    point draws — the costs solved on host are the costs that forward sees."""

    def cost_step(state: TrainState, batch: Batch, rng: jax.Array,
                  dn_groups: Optional[int] = None):
        batch = unpack_batch_masks(batch)
        rng_dn, rng_drop, rng_loss = jax.random.split(
            jax.random.fold_in(rng, state.step), 3)
        outputs = model.apply(
            {"params": state.params}, batch.images, batch.targets, train=True,
            dn_groups=dn_groups, rngs={"dn": rng_dn, "dropout": rng_drop})
        costs, _ = criterion.layer_costs(outputs, batch.targets, rng_loss)
        return costs

    return jax.jit(cost_step, static_argnames=("dn_groups",))


