"""Auction LSA vs scipy: optimality on random + structured matrices."""

import numpy as np
import pytest
import scipy.optimize

import jax.numpy as jnp

from mp_former_tpu.ops.auction_lsa import auction_assign


def _scipy_cost(cost):
    r, c = scipy.optimize.linear_sum_assignment(cost)
    return cost[r, c].sum()


def _our_cost(cost, assign):
    n = cost.shape[1]
    rows = np.asarray(assign)
    assert len(set(rows.tolist())) == n, "assignment must be injective"
    return cost[rows, np.arange(n)].sum()


@pytest.mark.parametrize("q,n,seed", [(10, 6, 0), (100, 100, 1), (100, 37, 2),
                                      (50, 50, 3)])
def test_matches_scipy_random(q, n, seed):
    rng = np.random.RandomState(seed)
    cost = rng.rand(q, n).astype(np.float32) * 10
    got = auction_assign(jnp.asarray(cost))
    ours = _our_cost(cost, got)
    best = _scipy_cost(cost)
    assert ours <= best + 1e-2 * max(abs(best), 1), (ours, best)


def test_batched():
    rng = np.random.RandomState(4)
    cost = rng.rand(5, 20, 12).astype(np.float32)
    got = np.asarray(auction_assign(jnp.asarray(cost)))
    assert got.shape == (5, 12)
    for i in range(5):
        ours = _our_cost(cost[i], got[i])
        best = _scipy_cost(cost[i])
        assert ours <= best + 1e-2


def test_matcher_like_matrix():
    """Cost pattern the matcher actually produces: a few informative columns
    + invalid columns at (max valid cost + 1) — the sentinel is kept close to
    the real cost range on purpose (match_cost_matrix), because a huge
    sentinel compresses real cost differences below the auction's epsilon
    resolution."""
    rng = np.random.RandomState(5)
    q, n, valid = 100, 100, 7
    real = rng.randn(q, valid).astype(np.float32) * 5
    cost = np.full((q, n), real.max() + 1.0, np.float32)
    cost[:, :valid] = real
    got = np.asarray(auction_assign(jnp.asarray(cost)))
    best = _scipy_cost(cost[:, :valid].astype(np.float64))
    ours = cost[got[:valid], np.arange(valid)].sum()
    assert ours <= best + 0.05, (ours, best)
    assert len(set(got.tolist())) == n


def test_full_matcher_cost_through_auction():
    """End-to-end: match_cost_matrix -> auction vs scipy on realistic inputs."""
    import jax
    import scipy.optimize

    from mp_former_tpu.models.matcher import HungarianMatcher
    from mp_former_tpu.structures import Targets

    rng = np.random.RandomState(7)
    b, q, n, h, w = 2, 100, 100, 32, 32
    logits = jnp.asarray(rng.randn(b, q, 6), jnp.float32)
    masks = jnp.asarray(rng.randn(b, q, h, w), jnp.float32)
    gt = rng.rand(b, n, 64, 64) > 0.6
    valid = np.zeros((b, n), bool)
    valid[:, :9] = True
    targets = Targets(
        labels=jnp.asarray(rng.randint(0, 5, (b, n)), jnp.int32),
        masks=jnp.asarray(gt),
        boxes=jnp.zeros((b, n, 4), jnp.float32),
        valid=jnp.asarray(valid))
    m = HungarianMatcher(2.0, 5.0, 5.0, num_points=512)
    cost = np.asarray(m.cost(logits, masks, targets, jax.random.PRNGKey(0)))
    got = np.asarray(auction_assign(jnp.asarray(cost)))
    for i in range(b):
        r, c = scipy.optimize.linear_sum_assignment(cost[i].astype(np.float64))
        best = cost[i][r, c].sum()
        ours = cost[i][got[i], np.arange(n)].sum()
        assert ours <= best + 1e-2 * abs(best), (ours, best)


def test_degenerate_identical_columns():
    cost = np.ones((8, 8), np.float32)
    got = np.asarray(auction_assign(jnp.asarray(cost)))
    assert len(set(got.tolist())) == 8


def test_col_valid_subproblem_optimal():
    """With col_valid, real columns get the optimal assignment of their
    subproblem; invalid columns get arbitrary distinct leftover rows."""
    import scipy.optimize

    rng = np.random.RandomState(9)
    q, n, v = 100, 100, 7
    real = rng.randn(q, v).astype(np.float32) * 5
    cost = np.full((q, n), real.max() + 1.0, np.float32)
    cost[:, :v] = real
    valid = np.zeros((n,), bool)
    valid[:v] = True
    got = np.asarray(auction_assign(jnp.asarray(cost),
                                    col_valid=jnp.asarray(valid)[None]))
    r, c = scipy.optimize.linear_sum_assignment(real.astype(np.float64))
    best = real[r, c].sum()
    ours = real[got[:v], np.arange(v)].sum()
    assert ours <= best + 0.05, (ours, best)
    assert len(set(got.tolist())) == n  # still a permutation


def test_more_columns_than_rows():
    """N > Q (fewer queries than target slots): the overflow columns get
    arbitrary real rows, but the Q best columns match scipy's optimum."""
    rng = np.random.RandomState(4)
    cost = jnp.asarray(rng.rand(3, 6, 15).astype(np.float32))
    got = np.asarray(auction_assign(cost))
    assert got.shape == (3, 15)
    assert (got >= 0).all() and (got < 6).all()
    import scipy.optimize

    for i in range(3):
        rows, cols = scipy.optimize.linear_sum_assignment(np.asarray(cost[i]))
        want = np.asarray(cost[i])[rows, cols].sum()
        # the auction's chosen q columns cost within epsilon-bound of optimal
        m = np.zeros(15, bool)
        m[cols] = True
        got_cost = np.asarray(cost[i])[got[i][m], np.arange(15)[m]].sum()
        assert got_cost <= want + 0.05, (got_cost, want)
