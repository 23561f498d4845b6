"""EBNF (GBNF) grammar backend: byte-level pushdown automaton.

Reference capability: vllm/v1/structured_output/backend_xgrammar.py
(full context-free grammars via xgrammar) and llama.cpp GBNF syntax.
From-scratch design matching this repo's regex-DFA backend shape:

- the grammar compiles to normalized rules (alternatives of items;
  items are byte-sets or rule references; repetition operators
  synthesize helper rules, llama.cpp-style);
- runtime state is a SET of parse stacks (the PDA's reachable
  configurations), advanced byte-by-byte; states are INTERNED to ints
  so the existing ``Grammar`` adapter, audit trail, and bitmask cache
  work unchanged on top;
- per-state token bitmasks come from a vocab byte-TRIE walk: a branch
  is pruned the moment the stack-set dies, so the sweep touches only
  prefixes the grammar can actually accept (the xgrammar mask
  strategy, in numpy/python).

Syntax (GBNF): ``name ::= alternatives``; literals ``"..."`` (escapes
\\n \\t \\r \\\\ \\" \\xHH); char classes ``[a-z0-9]`` / ``[^...]``;
``.`` (any byte); grouping ``( )``; ``* + ? {m} {m,n} {m,}``;
alternation ``|``; ``#`` comments. Start symbol: ``root``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

ANY_BYTE = frozenset(range(256))

# items: ("b", frozenset[int]) byte-set | ("r", int) rule reference
Item = tuple
Alt = tuple  # tuple[Item, ...]


class EBNFRules:
    def __init__(self) -> None:
        self.rules: list[list[Alt]] = []
        self.names: dict[str, int] = {}

    def rule_id(self, name: str) -> int:
        if name not in self.names:
            self.names[name] = len(self.rules)
            self.rules.append([])
        return self.names[name]

    def new_rule(self, alts: list[Alt]) -> int:
        rid = len(self.rules)
        self.rules.append(alts)
        self.names[f"<anon{rid}>"] = rid
        return rid


class _EBNFParser:
    def __init__(self, text: str) -> None:
        self.text = text
        self.i = 0
        self.g = EBNFRules()

    # -- lexing helpers ------------------------------------------------

    def _ws(self, newlines: bool = True) -> None:
        while self.i < len(self.text):
            c = self.text[self.i]
            if c == "#":
                while self.i < len(self.text) and \
                        self.text[self.i] != "\n":
                    self.i += 1
            elif c in " \t\r" or (newlines and c == "\n"):
                self.i += 1
            else:
                break

    def _peek(self) -> str:
        return self.text[self.i] if self.i < len(self.text) else ""

    def _name(self) -> str:
        j = self.i
        while j < len(self.text) and (self.text[j].isalnum()
                                      or self.text[j] in "-_"):
            j += 1
        if j == self.i:
            raise ValueError(
                f"EBNF: expected rule name at {self.i}")
        name, self.i = self.text[self.i:j], j
        return name

    # -- grammar -------------------------------------------------------

    def parse(self) -> EBNFRules:
        self._ws()
        while self.i < len(self.text):
            name = self._name()
            self._ws()
            if not self.text.startswith("::=", self.i):
                raise ValueError(f"EBNF: expected '::=' after "
                                 f"{name!r}")
            self.i += 3
            rid = self.g.rule_id(name)
            alts = self._alternatives()
            if self.g.rules[rid]:
                raise ValueError(f"EBNF: duplicate rule {name!r}")
            self.g.rules[rid] = alts
            self._ws()
        if "root" not in self.g.names:
            raise ValueError("EBNF: missing 'root' rule")
        for n, rid in self.g.names.items():
            if not self.g.rules[rid] and not n.startswith("<anon"):
                raise ValueError(f"EBNF: rule {n!r} referenced but "
                                 "never defined")
        return self.g

    def _alternatives(self) -> list[Alt]:
        alts = [self._sequence()]
        while True:
            self._ws(newlines=False)
            # newline ends the rule unless continued by '|'
            save = self.i
            self._ws()
            if self._peek() == "|":
                self.i += 1
                alts.append(self._sequence())
            else:
                self.i = save
                self._ws(newlines=False)
                if self._peek() == "|":
                    self.i += 1
                    alts.append(self._sequence())
                    continue
                break
        return alts

    def _sequence(self) -> Alt:
        items: list[Item] = []
        while True:
            self._ws(newlines=False)
            c = self._peek()
            if c == "" or c in "|)\n":
                break
            # a bare name might be the NEXT rule's "name ::=" header
            if c.isalnum() or c in "-_":
                save = self.i
                self._name()
                self._ws(newlines=False)
                if self.text.startswith("::=", self.i):
                    self.i = save
                    break
                self.i = save
            base = self._atom()
            base = self._repetition(base)
            items.extend(base)
        return tuple(items)

    def _atom(self) -> list[Item]:
        c = self._peek()
        if c == '"':
            return self._literal()
        if c == "[":
            return [("b", self._char_class())]
        if c == ".":
            self.i += 1
            return [("b", ANY_BYTE)]
        if c == "(":
            self.i += 1
            alts = self._alternatives()
            self._ws()
            if self._peek() != ")":
                raise ValueError("EBNF: unbalanced '('")
            self.i += 1
            if len(alts) == 1:
                return list(alts[0])
            return [("r", self.g.new_rule(alts))]
        if c.isalnum() or c in "-_":
            return [("r", self.g.rule_id(self._name()))]
        raise ValueError(f"EBNF: unexpected {c!r} at {self.i}")

    def _repetition(self, base: list[Item]) -> list[Item]:
        self._ws(newlines=False)
        c = self._peek()
        if not c or c not in "*+?{":
            return base

        def as_rule() -> int:
            if len(base) == 1 and base[0][0] == "r":
                return base[0][1]
            return self.g.new_rule([tuple(base)])

        if c == "*":
            self.i += 1
            rid = as_rule()
            star = self.g.new_rule([])
            self.g.rules[star] = [(), (("r", rid), ("r", star))]
            return [("r", star)]
        if c == "+":
            self.i += 1
            rid = as_rule()
            star = self.g.new_rule([])
            self.g.rules[star] = [(), (("r", rid), ("r", star))]
            return [("r", rid), ("r", star)]
        if c == "?":
            self.i += 1
            rid = as_rule()
            return [("r", self.g.new_rule([(), (("r", rid), )]))]
        # {m} {m,} {m,n}
        j = self.text.index("}", self.i)
        spec = self.text[self.i + 1:j]
        self.i = j + 1
        if "," in spec:
            lo_s, hi_s = spec.split(",", 1)
            lo = int(lo_s) if lo_s.strip() else 0
            hi = int(hi_s) if hi_s.strip() else None
        else:
            lo = hi = int(spec)
        rid = as_rule()
        items: list[Item] = [("r", rid)] * lo
        if hi is None:
            star = self.g.new_rule([])
            self.g.rules[star] = [(), (("r", rid), ("r", star))]
            items.append(("r", star))
        else:
            opt = self.g.new_rule([(), (("r", rid), )])
            items.extend([("r", opt)] * (hi - lo))
        return items

    def _literal(self) -> list[Item]:
        assert self._peek() == '"'
        self.i += 1
        out: list[Item] = []
        buf = bytearray()
        while True:
            if self.i >= len(self.text):
                raise ValueError("EBNF: unterminated string")
            c = self.text[self.i]
            if c == '"':
                self.i += 1
                break
            if c == "\\":
                self.i += 1
                e = self.text[self.i]
                if e == "x":
                    buf.append(int(self.text[self.i + 1:self.i + 3],
                                   16))
                    self.i += 3
                    continue
                buf.append({"n": 10, "t": 9, "r": 13, '"': 34,
                            "\\": 92, "/": 47}.get(e, ord(e)))
                self.i += 1
                continue
            buf.extend(c.encode("utf-8"))
            self.i += 1
        for b in bytes(buf):
            out.append(("b", frozenset((b, ))))
        return out

    def _char_class(self) -> frozenset:
        assert self._peek() == "["
        self.i += 1
        negate = self._peek() == "^"
        if negate:
            self.i += 1
        byteset: set[int] = set()

        def read_one() -> int:
            c = self.text[self.i]
            if c == "\\":
                self.i += 1
                e = self.text[self.i]
                if e == "x":
                    v = int(self.text[self.i + 1:self.i + 3], 16)
                    self.i += 3
                    return v
                self.i += 1
                return {"n": 10, "t": 9, "r": 13,
                        "\\": 92, "]": 93, "^": 94,
                        "-": 45}.get(e, ord(e))
            self.i += 1
            v = ord(c)
            if v > 0x7F:
                raise ValueError(
                    "EBNF: non-ASCII char-class members not "
                    "supported; use explicit \\xHH bytes")
            return v

        while True:
            if self.i >= len(self.text):
                raise ValueError("EBNF: unterminated char class")
            if self._peek() == "]":
                self.i += 1
                break
            lo = read_one()
            if self._peek() == "-" and \
                    self.text[self.i + 1:self.i + 2] != "]":
                self.i += 1
                hi = read_one()
                byteset.update(range(lo, hi + 1))
            else:
                byteset.add(lo)
        if negate:
            byteset = set(range(256)) - byteset
        return frozenset(byteset)


# ---------------------------------------------------------------------
# PDA over parse-stack sets


class CompiledEBNF:
    """Drop-in for ``CompiledGrammar``: interned int states, a
    ``dfa``-shaped view (start / dead / is_accept), next_state +
    bitmask_for_state. State 0 = dead (no live stacks), state ids
    intern frozensets of parse stacks."""

    MAX_STACKS = 512  # runaway-ambiguity guard (llama.cpp-style)

    def __init__(self, rules: EBNFRules, index) -> None:
        self.rules = rules.rules
        self.index = index
        self._sets: list[frozenset] = [frozenset()]
        self._ids: dict[frozenset, int] = {frozenset(): 0}
        self._trans: dict[tuple[int, int], int] = {}
        self._mask_cache: dict[int, np.ndarray] = {}
        self.dead = 0
        self.dfa = self  # Grammar accesses compiled.dfa.*
        root = rules.names["root"]
        start_stacks: set[tuple] = set()
        for a in range(len(self.rules[root])):
            self._close((( root, a, 0), ), start_stacks, 0)
        self.start = self._intern(frozenset(start_stacks))

    # -- core PDA ------------------------------------------------------

    def _close(self, stack: tuple, out: set, depth: int) -> None:
        """Expand until the top item is a byte-set (or the stack is
        fully popped = accepting)."""
        if depth > 256:
            raise ValueError("EBNF: recursion too deep (left "
                             "recursion?)")
        if not stack:
            out.add(stack)
            return
        r, a, p = stack[-1]
        alt = self.rules[r][a]
        if p == len(alt):  # alternative exhausted: pop + advance
            parent = stack[:-1]
            if not parent:
                out.add(parent)
                return
            pr, pa, pp = parent[-1]
            self._close(parent[:-1] + ((pr, pa, pp + 1), ), out,
                        depth + 1)
            return
        kind, val = alt[p]
        if kind == "b":
            out.add(stack)
            return
        for na in range(len(self.rules[val])):
            self._close(stack + ((val, na, 0), ), out, depth + 1)

    def _advance_set(self, stacks: frozenset, byte: int) -> frozenset:
        out: set = set()
        for stack in stacks:
            if not stack:
                continue  # accepted configuration consumes nothing
            r, a, p = stack[-1]
            kind, val = self.rules[r][a][p]
            if kind == "b" and byte in val:
                self._close(stack[:-1] + ((r, a, p + 1), ), out, 0)
        if len(out) > self.MAX_STACKS:
            raise ValueError("EBNF: grammar too ambiguous "
                             f"(> {self.MAX_STACKS} parse stacks)")
        return frozenset(out)

    MAX_CACHED_STATES = 200_000  # long-running-server guard

    def _intern(self, stacks: frozenset) -> int:
        sid = self._ids.get(stacks)
        if sid is None:
            if len(self._sets) >= self.MAX_CACHED_STATES and \
                    len(self._sets) % self.MAX_CACHED_STATES == 0:
                # recursive grammars mint fresh states forever; the
                # heavy memory is the per-state bitmask (vocab/8
                # bytes) and transition memos — drop those
                # periodically. Interned ids stay valid (in-flight
                # Grammar states keep working); masks rebuild lazily.
                self._trans.clear()
                self._mask_cache.clear()
            sid = len(self._sets)
            self._ids[stacks] = sid
            self._sets.append(stacks)
        return sid

    def _step(self, sid: int, byte: int) -> int:
        key = (sid, byte)
        nxt = self._trans.get(key)
        if nxt is None:
            nxt = self._intern(self._advance_set(self._sets[sid],
                                                 byte))
            self._trans[key] = nxt
        return nxt

    def is_accept(self, sid: int) -> bool:
        return any(not s for s in self._sets[sid])

    # -- Grammar-facing surface -----------------------------------

    def next_state(self, sid: int, token_id: int) -> int:
        idx = self.index
        if not idx.usable[token_id]:
            return self.dead
        length = int(idx.lengths[token_id])
        for b in idx.bytes_matrix[token_id, :length]:
            sid = self._step(sid, int(b))
            if sid == self.dead:
                return self.dead
        return sid

    def bitmask_for_state(self, sid: int) -> np.ndarray:
        mask = self._mask_cache.get(sid)
        if mask is not None:
            return mask
        idx = self.index
        valid = np.zeros(idx.vocab_size, dtype=bool)
        trie = idx.byte_trie()

        def walk(node, s):
            for tid in node.token_ids:
                valid[tid] = True
            for b, child in node.children.items():
                ns = self._step(s, b)
                if ns != self.dead:
                    walk(child, ns)

        # skip the root's token list (only empty-byte tokens)
        for b, child in trie.children.items():
            ns = self._step(sid, b)
            if ns != self.dead:
                walk(child, ns)
        mask = idx.pack_bitmask(valid, allow_eos=self.is_accept(sid))
        self._mask_cache[sid] = mask
        return mask


def compile_ebnf(grammar_text: str, index) -> CompiledEBNF:
    rules = _EBNFParser(grammar_text).parse()
    return CompiledEBNF(rules, index)
