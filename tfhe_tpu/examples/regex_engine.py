"""Encrypted regex matching (reference tfhe/examples/regex_engine/).

A pattern compiles to an NFA; matching an encrypted ASCII string keeps one
encrypted boolean per NFA state and advances them per character:

    next[s'] = OR over transitions (state[s] AND char == c)

Supported syntax (a practical subset of the reference's engine): literals,
`.`, character classes `[abc]`/ranges `[a-z]`, `*`, `+`, `?`, alternation
`|`, grouping `(...)`, anchors are implicit (whole-string match).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

from .. import shortint
from ..shortint.server_key import ServerKey as ShortintServerKey

EPS = None  # epsilon transition label


@dataclass
class Nfa:
    start: int
    accept: int
    # transitions: (src, label, dst); label = frozenset of accepted chars or EPS
    edges: List[Tuple[int, Optional[frozenset], int]] = field(default_factory=list)
    n: int = 0


class _Parser:
    """Thompson construction."""

    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0
        self.edges = []
        self.n = 0

    def new_state(self):
        self.n += 1
        return self.n - 1

    def parse(self) -> Nfa:
        s, a = self._alt()
        if self.i != len(self.p):
            raise ValueError(f"unexpected {self.p[self.i]!r}")
        return Nfa(start=s, accept=a, edges=self.edges, n=self.n)

    def _alt(self):
        s, a = self._concat()
        while self.i < len(self.p) and self.p[self.i] == "|":
            self.i += 1
            s2, a2 = self._concat()
            ns, na = self.new_state(), self.new_state()
            self.edges += [(ns, EPS, s), (ns, EPS, s2), (a, EPS, na), (a2, EPS, na)]
            s, a = ns, na
        return s, a

    def _concat(self):
        frags = []
        while self.i < len(self.p) and self.p[self.i] not in "|)":
            frags.append(self._repeat())
        if not frags:
            s = self.new_state()
            return s, s
        s, a = frags[0]
        for s2, a2 in frags[1:]:
            self.edges.append((a, EPS, s2))
            a = a2
        return s, a

    def _repeat(self):
        s, a = self._atom()
        while self.i < len(self.p) and self.p[self.i] in "*+?":
            op = self.p[self.i]
            self.i += 1
            ns, na = self.new_state(), self.new_state()
            if op == "*":
                self.edges += [(ns, EPS, s), (ns, EPS, na), (a, EPS, s), (a, EPS, na)]
            elif op == "+":
                self.edges += [(ns, EPS, s), (a, EPS, s), (a, EPS, na)]
            else:
                self.edges += [(ns, EPS, s), (ns, EPS, na), (a, EPS, na)]
            s, a = ns, na
        return s, a

    def _atom(self):
        c = self.p[self.i]
        if c == "(":
            self.i += 1
            s, a = self._alt()
            assert self.p[self.i] == ")", "unbalanced parens"
            self.i += 1
            return s, a
        if c == "[":
            j = self.p.index("]", self.i)
            spec = self.p[self.i + 1:j]
            self.i = j + 1
            chars = set()
            k = 0
            while k < len(spec):
                if k + 2 < len(spec) and spec[k + 1] == "-":
                    chars.update(chr(x) for x in range(ord(spec[k]), ord(spec[k + 2]) + 1))
                    k += 3
                else:
                    chars.add(spec[k])
                    k += 1
            return self._edge(frozenset(chars))
        if c == ".":
            self.i += 1
            return self._edge(frozenset(chr(x) for x in range(32, 127)))
        self.i += 1
        return self._edge(frozenset([c]))

    def _edge(self, label):
        s, a = self.new_state(), self.new_state()
        self.edges.append((s, label, a))
        return s, a


def _eps_closure(nfa: Nfa, states: Set[int]) -> Set[int]:
    todo = list(states)
    out = set(states)
    while todo:
        s = todo.pop()
        for (src, lbl, dst) in nfa.edges:
            if src == s and lbl is EPS and dst not in out:
                out.add(dst)
                todo.append(dst)
    return out


def regex_match_radix(isk: "integer.ServerKey", pattern: str,
                      enc_string: List) -> object:
    """Whole-string match over a list of RadixCiphertext ASCII chars.

    Returns an encrypted boolean block: 1 iff the whole string matches."""
    from .. import integer
    nfa = _Parser(pattern).parse()
    ssk = isk.key

    active: Dict[int, object] = {}
    init = _eps_closure(nfa, {nfa.start})
    from ..shortint.ciphertext import Ciphertext as Block

    def trivial_bit(template: Block, v: int) -> Block:
        import jax.numpy as jnp
        from ..core.entities import LweCiphertext
        from ..shortint.client_key import delta_for
        data = jnp.zeros_like(template.lwe.data)
        data = data.at[..., -1].set(jnp.uint64(v) * delta_for(ssk.params))
        return template.with_(lwe=LweCiphertext(data=data), degree=v)

    template = enc_string[0].blocks[0]
    for s in init:
        active[s] = trivial_bit(template, 1)

    for enc_char in enc_string:
        nxt: Dict[int, object] = {}
        for (src, lbl, dst) in nfa.edges:
            if lbl is EPS or src not in active:
                continue
            # char-in-class test: OR over eq comparisons
            hit = None
            for c in sorted(lbl):
                e = isk.scalar_eq(enc_char, ord(c)).block
                hit = e if hit is None else ssk.bitor(hit, e)
            t = ssk.mul(active[src], hit)
            closure = _eps_closure(nfa, {dst})
            for d in closure:
                nxt[d] = t if d not in nxt else ssk.bitor(nxt[d], t)
        active = nxt
        if not active:
            break

    if nfa.accept in active:
        return active[nfa.accept]
    return trivial_bit(template, 0)
