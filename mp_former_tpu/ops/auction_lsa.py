"""On-device linear sum assignment via the auction algorithm (Bertsekas).

The reference hops to host scipy for the LSAP (matcher.py:149-151). On this
TPU runtime host callbacks are unavailable (axon_pjrt: no send/recv), so
matching must run on device. A Jacobi ("all unassigned columns bid at once")
auction with epsilon-scaling vectorizes on the VPU: each iteration is a few
(B, N, Q)-shaped max/argmax ops inside a `lax.while_loop`.

With a final epsilon far below the cost resolution the assignment is optimal
in practice; tests compare against scipy over random and adversarial
matrices (tests/test_auction_lsa.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = jnp.float32(-1e15)


def _phase(values: jax.Array, eps: jax.Array, price: jax.Array,
           max_iters: int, col_active: jax.Array):
    """One epsilon phase from scratch assignments.

    values: (B, N, Q) benefit (bidder/column major); eps: (B, 1); price: (B, Q).
    col_active: (B, N) — inactive columns never bid (treated as satisfied).
    Returns (owner (B, Q) int32 column owning each row or -1, price).
    """
    b, n, q = values.shape
    rows = jnp.arange(q)[None, None, :]
    owner0 = jnp.full((b, q), -1, jnp.int32)

    def assigned_cols(owner):
        a = ~col_active  # inactive columns count as satisfied
        safe = jnp.clip(owner, 0, n - 1)
        return a.at[jnp.arange(b)[:, None], safe].max(owner >= 0)

    def cond(state):
        owner, price, it = state
        return jnp.logical_and(
            jnp.logical_not(jnp.all(assigned_cols(owner))), it < max_iters)

    def body(state):
        owner, price, it = state
        unassigned = ~assigned_cols(owner)  # (B, N)
        net = values - price[:, None, :]    # (B, N, Q)
        best_row = jnp.argmax(net, axis=-1)  # (B, N)
        best_val = jnp.max(net, axis=-1)
        net2 = jnp.where(best_row[:, :, None] == rows, _NEG, net)
        second_val = jnp.max(net2, axis=-1)
        incr = best_val - second_val + eps   # (B, N) >= eps

        bid = jnp.where(unassigned, incr, _NEG)  # (B, N)
        on_row = best_row[:, :, None] == rows    # (B, N, Q)
        bid_full = jnp.where(on_row, bid[:, :, None], _NEG)
        win_bid = jnp.max(bid_full, axis=1)      # (B, Q)
        win_col = jnp.argmax(bid_full, axis=1).astype(jnp.int32)
        row_won = win_bid > _NEG / 2

        price = jnp.where(row_won, price + win_bid, price)
        owner = jnp.where(row_won, win_col, owner)
        return owner, price, it + 1

    owner, price, _ = jax.lax.while_loop(
        cond, body, (owner0, price, jnp.zeros((), jnp.int32)))
    return owner, price


def _owner_to_col2row(owner: jax.Array, n: int) -> jax.Array:
    """(B, Q) owner -> (B, N) row index per column (-1 if unassigned)."""
    b, q = owner.shape
    out = jnp.full((b, n), -1, jnp.int32)
    safe = jnp.clip(owner, 0, n - 1)
    src = jnp.where(owner >= 0, jnp.arange(q, dtype=jnp.int32)[None, :], -1)
    return out.at[jnp.arange(b)[:, None], safe].max(src)


def _fix_unassigned(col2row: jax.Array, q: int) -> jax.Array:
    """Greedy leftover rows for still-unassigned columns (iteration cap hit;
    rare). Bounded fori_loop."""
    b, n = col2row.shape

    def body(i, c2r):
        used = jnp.zeros((b, q), bool)
        used = used.at[jnp.arange(b)[:, None],
                       jnp.clip(c2r, 0, q - 1)].max(c2r >= 0)
        free_row = jnp.argmin(used, axis=1).astype(jnp.int32)
        needs = c2r[:, i] < 0
        return c2r.at[:, i].set(jnp.where(needs, free_row, c2r[:, i]))

    return jax.lax.fori_loop(0, n, body, col2row)


def auction_assign(cost: jax.Array, eps_final: float = 1e-5,
                   scaling: int = 6, theta: float = 8.0,
                   max_iters: int = 1000,
                   col_valid: jax.Array | None = None) -> jax.Array:
    """cost (..., Q, N) -> (..., N) int32: row assigned to each column,
    minimizing total cost over injective column->row assignments (N <= Q).

    The problem is squared up with zero-cost dummy columns: with N == Q every
    row ends owned each phase, so carrying prices across epsilon-scaling
    phases is sound (asymmetric auctions leave stale prices on unowned rows,
    which silently breaks optimality).

    col_valid (..., N) bool: columns whose assignment is never consumed
    (e.g. the matcher's padded-invalid slots). They are excluded from the
    bidding entirely — the while loop only runs until real columns settle —
    and receive arbitrary distinct leftover rows afterwards. With ~7 real
    columns out of 100 this cuts the iteration count ~10x.
    """
    lead = cost.shape[:-2]
    q, n = cost.shape[-2:]
    c = cost.reshape((-1, q, n)).astype(jnp.float32)
    b = c.shape[0]
    q_real = q
    if n > q:
        # more columns than rows (e.g. a toy config with fewer queries than
        # target slots): square up with dummy rows priced above every real
        # cost, so they absorb only the overflow columns. Those columns get
        # an arbitrary real row afterwards — with this shape the assignment
        # cannot be injective, matching the scipy path's behavior (its
        # unmatched columns fall back to row 0).
        pad = jnp.max(c, axis=(1, 2), keepdims=True) + 1.0
        c = jnp.concatenate(
            [c, jnp.broadcast_to(pad, (b, n - q, n))], axis=1)
        q = n
    if n < q:
        c = jnp.concatenate([c, jnp.zeros((b, q, q - n), jnp.float32)], axis=-1)
    values = -jnp.swapaxes(c, 1, 2)  # (B, Q, Q)

    # normalize to unit range: keeps prices O(1) so tiny epsilon increments
    # survive float32 addition (price underflow silently stalls bidding wars)
    vmax = jnp.max(values, axis=(1, 2), keepdims=True)
    vmin = jnp.min(values, axis=(1, 2), keepdims=True)
    scale = jnp.maximum(vmax - vmin, 1e-6)
    values = (values - vmin) / scale
    # deterministic tie-break: identical columns (e.g. the matcher's invalid
    # slots) otherwise fight an O(n) bidding war PER PHASE over the same
    # cheapest row; a sub-epsilon bias gives every column a distinct best row
    # so they assign in O(1) iterations. Costs <= q*eps_final in optimality,
    # the same order as the epsilon-CS bound itself.
    tiebreak = jax.random.uniform(jax.random.PRNGKey(0), (q, q)) * eps_final
    values = values + tiebreak[None]

    price = jnp.zeros((b, q), jnp.float32)
    if col_valid is None:
        # squared symmetric problem: epsilon-scaling with price carry-over
        col_active = jnp.ones((b, q), bool)
        owner = jnp.full((b, q), -1, jnp.int32)
        for phase in range(scaling):
            eps = jnp.full((b, 1), max(0.5 / theta ** phase, eps_final),
                           jnp.float32)
            owner, price = _phase(values, eps, price, max_iters, col_active)
    else:
        # few active bidders: the problem is effectively asymmetric, where
        # carrying prices across phases is unsound (abandoned rows keep stale
        # prices). One phase from zero prices is sound (unowned rows stay at
        # their initial price 0) and converges fast with so few bidders.
        cv = col_valid.reshape(-1, n)
        col_active = jnp.concatenate(
            [cv, jnp.zeros((b, q - n), bool)], axis=1) if n < q else cv
        eps = jnp.full((b, 1), max(eps_final, 1e-4), jnp.float32)
        owner, price = _phase(values, eps, price, 4 * max_iters, col_active)

    col2row = _owner_to_col2row(owner, q)[:, :n]
    col2row = _fix_unassigned(col2row, q)
    if q_real < q:  # columns that landed on dummy rows -> arbitrary real row
        col2row = jnp.where(col2row < q_real, col2row, col2row % q_real)
    return col2row.reshape(lead + (n,))
