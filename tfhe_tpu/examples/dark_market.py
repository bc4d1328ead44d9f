"""Encrypted order matching (reference tfhe/examples/dark_market/).

Volume-matching: buy and sell orders (quantities) are encrypted; the
exchange computes per-order filled amounts without learning any quantity.

Two implementations, mirroring the reference's `fhe.rs` and
`improved_parallel_fhe.rs`:

* `volume_match` — sequential greedy fill: total_matched = min(Σ buys,
  Σ sells), each side filled in order-book order with homomorphic min/sub.
* `volume_match_parallel` — the improved algorithm with the order book
  BATCHED onto the PBS axis (the TPU redesign of the reference's rayon
  fan-out): one RadixCiphertext carries ALL orders of a side, prefix sums
  run as a Hillis-Steele scan over the batch axis (log2(n) batched adds),
  and every order's fill amount
      filled_i = min(order_i, max(0, total_other - prefix_{i-1}))
  is computed in ONE batched sub/gt/cmux/min sweep — the whole book costs
  a constant number of full-batch integer ops.
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from .. import integer
from ..core.entities import LweCiphertext


def _fill_orders(sk: integer.ServerKey, orders: List, total_matched):
    """Greedy fill: filled_i = min(order_i, remaining); remaining -= filled."""
    filled = []
    remaining = total_matched
    for o in orders:
        f = sk.min(o, remaining)
        remaining = sk.sub(remaining, f)
        filled.append(f)
    return filled


def volume_match(sk: integer.ServerKey, buy_orders: List, sell_orders: List
                 ) -> Tuple[List, List]:
    """→ (filled_buys, filled_sells), reference `volume_match` semantics."""
    total_buy = buy_orders[0]
    for o in buy_orders[1:]:
        total_buy = sk.add(total_buy, o)
    total_sell = sell_orders[0]
    for o in sell_orders[1:]:
        total_sell = sk.add(total_sell, o)
    matched = sk.min(total_buy, total_sell)
    return (_fill_orders(sk, buy_orders, matched),
            _fill_orders(sk, sell_orders, matched))


# ---------------------------------------------------------------------------
# improved parallel variant (reference improved_parallel_fhe.rs:97) — the
# order book rides the PBS batch axis
# ---------------------------------------------------------------------------


def _batch_size(ct) -> int:
    return ct.blocks[0].lwe.data.shape[0]


def _shift_batch(ct, k: int):
    """Shift the batch axis down by k, filling with trivial zeros (an
    all-zero LWE row encrypts 0): out[i] = ct[i-k], out[:k] = 0."""
    blocks = []
    for b in ct.blocks:
        d = b.lwe.data
        z = jnp.zeros((k,) + d.shape[1:], d.dtype)
        blocks.append(b.with_(lwe=LweCiphertext(
            data=jnp.concatenate([z, d[:-k]], axis=0))))
    return type(ct)(blocks=blocks)


def _broadcast_last(ct, n: int):
    """Broadcast the LAST batch element to a batch of n."""
    blocks = []
    for b in ct.blocks:
        d = b.lwe.data
        blocks.append(b.with_(lwe=LweCiphertext(
            data=jnp.broadcast_to(d[-1], (n,) + d.shape[1:]))))
    return type(ct)(blocks=blocks)


def compute_prefix_sum(sk: integer.ServerKey, orders):
    """Inclusive prefix sum over the batch axis: a Hillis-Steele scan of
    log2(n) BATCHED additions (the reference's Blelloch work-efficient
    rayon scan re-shaped for a machine where a full-batch add costs the
    same as a single one)."""
    n = _batch_size(orders)
    acc = orders
    s = 1
    while s < n:
        acc = sk.add(acc, _shift_batch(acc, s))
        s <<= 1
    return acc


def _fill_side(sk, orders, prefix_own, total_other):
    """filled_i = min(order_i, max(0, total_other - prefix_own[i-1])) for
    every order in ONE batched sweep (reference fill_orders)."""
    n = _batch_size(orders)
    prev = _shift_batch(prefix_own, 1)
    total_b = _broadcast_last(total_other, n)
    diff = sk.sub(total_b, prev)                      # wraps when negative…
    cond = sk.gt(total_b, prev)                       # …but cond masks it
    zero = sk.create_trivial_zero_radix(orders.num_blocks, (n,))
    avail = sk.cmux(cond, diff, zero)
    return sk.min(avail, orders)


def volume_match_parallel(sk: integer.ServerKey, buy_orders, sell_orders
                          ) -> Tuple[object, object]:
    """Improved parallel volume match: `buy_orders` / `sell_orders` are
    each ONE RadixCiphertext whose batch axis is the order book.  Returns
    (filled_buys, filled_sells) in the same batched form.  Semantics match
    reference improved_parallel_fhe.rs:97 (each order filled against the
    other side's remaining total after all earlier orders)."""
    prefix_buy = compute_prefix_sum(sk, buy_orders)
    prefix_sell = compute_prefix_sum(sk, sell_orders)
    filled_sells = _fill_side(sk, sell_orders, prefix_sell, prefix_buy)
    filled_buys = _fill_side(sk, buy_orders, prefix_buy, prefix_sell)
    return filled_buys, filled_sells
