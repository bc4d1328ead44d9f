"""Encrypted order matching (reference tfhe/examples/dark_market.rs).

Volume-matching: buy and sell orders (quantities) are encrypted; the
exchange computes per-order filled amounts without learning any quantity.
total_matched = min(Σ buys, Σ sells); each side is filled greedily in
order-book order using only homomorphic min/sub.
"""
from __future__ import annotations

from typing import List, Tuple

from .. import integer


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
