"""Byte-level regex engine: pattern → NFA → DFA.

The reference delegates constrained decoding to xgrammar/outlines/
llguidance (vllm/v1/structured_output/backend_*.py); none of those are
in this image, so this is a from-scratch engine designed for the
token-bitmask use case:

- **byte alphabet** (256 symbols) so DFA states compose directly with
  tokenizer byte strings;
- **byte equivalence classes** keep subset construction and the
  per-state vocab sweep small (alphabet collapses to the handful of
  distinct byte sets the pattern mentions);
- full-match semantics (anchored both ends), which is what structured
  output needs.

Supported syntax: literals (UTF-8 aware), escapes (\\n \\t \\r \\\\
\\d \\w \\s \\D \\W \\S and escaped metachars), ``.`` (any byte except
newline), classes ``[a-z0-9_]`` / ``[^...]`` (byte complement),
quantifiers ``* + ? {m} {m,} {m,n}``, alternation ``|``, groups
``(...)`` / ``(?:...)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

ALL_BYTES = frozenset(range(256))
DIGITS = frozenset(range(0x30, 0x3A))
WORD = frozenset(
    list(range(0x30, 0x3A)) + list(range(0x41, 0x5B)) +
    list(range(0x61, 0x7B)) + [0x5F])
SPACE = frozenset(b" \t\n\r\f\v")


# ---------------------------------------------------------------------------
# NFA (Thompson construction)
# ---------------------------------------------------------------------------


@dataclass
class NFA:
    # transitions[state] = list of (byteset, target)
    transitions: list[list[tuple[frozenset, int]]] = field(
        default_factory=list)
    eps: list[list[int]] = field(default_factory=list)
    start: int = 0
    accept: int = 0

    def new_state(self) -> int:
        self.transitions.append([])
        self.eps.append([])
        return len(self.transitions) - 1


class _Parser:
    """Recursive-descent regex parser building NFA fragments."""

    def __init__(self, pattern: str) -> None:
        self.pat = pattern
        self.pos = 0
        self.nfa = NFA()

    def parse(self) -> NFA:
        start, end = self._alternation()
        if self.pos != len(self.pat):
            raise ValueError(
                f"unexpected {self.pat[self.pos]!r} at {self.pos}")
        self.nfa.start = start
        self.nfa.accept = end
        return self.nfa

    # fragment = (start, end) states
    def _alternation(self) -> tuple[int, int]:
        frags = [self._concat()]
        while self._peek() == "|":
            self.pos += 1
            frags.append(self._concat())
        if len(frags) == 1:
            return frags[0]
        s = self.nfa.new_state()
        e = self.nfa.new_state()
        for fs, fe in frags:
            self.nfa.eps[s].append(fs)
            self.nfa.eps[fe].append(e)
        return s, e

    def _concat(self) -> tuple[int, int]:
        frags = []
        while self._peek() not in ("", "|", ")"):
            frags.append(self._repeat())
        if not frags:
            s = self.nfa.new_state()
            return s, s
        s, e = frags[0]
        for fs, fe in frags[1:]:
            self.nfa.eps[e].append(fs)
            e = fe
        return s, e

    def _repeat(self) -> tuple[int, int]:
        frag = self._atom()
        while True:
            c = self._peek()
            if c == "*":
                self.pos += 1
                frag = self._star(frag)
            elif c == "+":
                self.pos += 1
                s2 = self._copy_fragment(frag)
                star = self._star(s2)
                self.nfa.eps[frag[1]].append(star[0])
                frag = (frag[0], star[1])
            elif c == "?":
                self.pos += 1
                self.nfa.eps[frag[0]].append(frag[1])
            elif c == "{":
                frag = self._bounded(frag)
            else:
                return frag

    def _star(self, frag: tuple[int, int]) -> tuple[int, int]:
        s = self.nfa.new_state()
        e = self.nfa.new_state()
        self.nfa.eps[s] += [frag[0], e]
        self.nfa.eps[frag[1]] += [frag[0], e]
        return s, e

    def _bounded(self, frag: tuple[int, int]) -> tuple[int, int]:
        end = self.pat.index("}", self.pos)
        spec = self.pat[self.pos + 1:end]
        self.pos = end + 1
        if "," in spec:
            lo_s, hi_s = spec.split(",", 1)
            lo = int(lo_s or 0)
            hi = int(hi_s) if hi_s else None
        else:
            lo = hi = int(spec)
        if hi is not None and hi < lo:
            raise ValueError(f"bad repetition {{{spec}}}")
        # expand: lo copies + (hi-lo) optional copies (or a star)
        frags = [frag] + [
            self._copy_fragment(frag) for _ in range(max(lo, 1) - 1)
        ]
        if lo == 0:
            self.nfa.eps[frags[0][0]].append(frags[0][1])
            if hi is None:
                return self._star(frag)
        if hi is None:
            tail = self._star(self._copy_fragment(frag))
            frags.append(tail)
        else:
            for _ in range(hi - max(lo, 1)):
                f = self._copy_fragment(frag)
                self.nfa.eps[f[0]].append(f[1])  # optional
                frags.append(f)
        s, e = frags[0]
        for fs, fe in frags[1:]:
            self.nfa.eps[e].append(fs)
            e = fe
        return s, e

    def _copy_fragment(self, frag: tuple[int, int]) -> tuple[int, int]:
        """Deep-copy the subgraph reachable from frag start (Thompson
        fragments are self-contained)."""
        mapping: dict[int, int] = {}
        stack = [frag[0], frag[1]]
        while stack:
            st = stack.pop()
            if st in mapping:
                continue
            mapping[st] = self.nfa.new_state()
            for _, tgt in self.nfa.transitions[st]:
                stack.append(tgt)
            for tgt in self.nfa.eps[st]:
                stack.append(tgt)
        for old, new in list(mapping.items()):
            for bs, tgt in list(self.nfa.transitions[old]):
                self.nfa.transitions[new].append((bs, mapping[tgt]))
            for tgt in list(self.nfa.eps[old]):
                if tgt in mapping:
                    self.nfa.eps[new].append(mapping[tgt])
        return mapping[frag[0]], mapping[frag[1]]

    # ---- atoms --------------------------------------------------------

    def _atom(self) -> tuple[int, int]:
        c = self._peek()
        if c == "(":
            self.pos += 1
            if self.pat[self.pos:self.pos + 2] == "?:":
                self.pos += 2
            frag = self._alternation()
            if self._peek() != ")":
                raise ValueError("unbalanced parenthesis")
            self.pos += 1
            return frag
        if c == "[":
            return self._byteset_frag(self._char_class())
        if c == ".":
            self.pos += 1
            return self._byteset_frag(ALL_BYTES - {0x0A})
        if c == "\\":
            self.pos += 1
            return self._escape()
        if c in ")|*+?{":
            raise ValueError(f"unexpected {c!r} at {self.pos}")
        self.pos += 1
        return self._literal(c)

    def _literal(self, char: str) -> tuple[int, int]:
        bs = char.encode("utf-8")
        s = self.nfa.new_state()
        cur = s
        for b in bs:
            nxt = self.nfa.new_state()
            self.nfa.transitions[cur].append((frozenset([b]), nxt))
            cur = nxt
        return s, cur

    def _byteset_frag(self, byteset: frozenset) -> tuple[int, int]:
        s = self.nfa.new_state()
        e = self.nfa.new_state()
        self.nfa.transitions[s].append((byteset, e))
        return s, e

    def _escape(self) -> tuple[int, int]:
        c = self.pat[self.pos]
        self.pos += 1
        classes = {
            "d": DIGITS, "D": ALL_BYTES - DIGITS,
            "w": WORD, "W": ALL_BYTES - WORD,
            "s": SPACE, "S": ALL_BYTES - SPACE,
        }
        if c in classes:
            return self._byteset_frag(classes[c])
        literals = {"n": "\n", "t": "\t", "r": "\r", "f": "\f",
                    "v": "\v", "0": "\0"}
        if c in literals:
            return self._literal(literals[c])
        if c == "x":
            h = self.pat[self.pos:self.pos + 2]
            self.pos += 2
            return self._byteset_frag(frozenset([int(h, 16)]))
        return self._literal(c)

    def _char_class(self) -> frozenset:
        assert self.pat[self.pos] == "["
        self.pos += 1
        negate = self._peek() == "^"
        if negate:
            self.pos += 1
        members: set[int] = set()

        def next_member() -> Optional[set[int]]:
            c = self._peek()
            if c == "\\":
                self.pos += 1
                c2 = self.pat[self.pos]
                self.pos += 1
                table = {"d": DIGITS, "w": WORD, "s": SPACE,
                         "D": ALL_BYTES - DIGITS,
                         "W": ALL_BYTES - WORD,
                         "S": ALL_BYTES - SPACE}
                if c2 in table:
                    return set(table[c2])
                lits = {"n": 0x0A, "t": 0x09, "r": 0x0D, "f": 0x0C,
                        "v": 0x0B, "0": 0}
                if c2 in lits:
                    return {lits[c2]}
                if c2 == "x":
                    h = self.pat[self.pos:self.pos + 2]
                    self.pos += 2
                    return {int(h, 16)}
                enc = c2.encode("utf-8")
                if len(enc) > 1:
                    raise ValueError(
                        "multi-byte char in class unsupported")
                return {enc[0]}
            self.pos += 1
            enc = c.encode("utf-8")
            if len(enc) > 1:
                # multi-byte chars in classes: accept all their bytes
                # (permissive byte semantics, see module docstring)
                return set(enc)
            return {enc[0]}

        while self._peek() not in ("]", ""):
            m = next_member()
            # range a-z (only for single-byte endpoints)
            if (self._peek() == "-" and self.pat[self.pos + 1] != "]"
                    and len(m) == 1):
                self.pos += 1
                hi = next_member()
                if len(hi) != 1:
                    raise ValueError("bad range endpoint")
                members |= set(range(min(m), max(hi) + 1))
            else:
                members |= m
        if self._peek() != "]":
            raise ValueError("unterminated character class")
        self.pos += 1
        return frozenset(ALL_BYTES - members if negate else members)

    def _peek(self) -> str:
        return self.pat[self.pos] if self.pos < len(self.pat) else ""


# ---------------------------------------------------------------------------
# DFA (subset construction over byte equivalence classes)
# ---------------------------------------------------------------------------


class DFA:
    """table: int32 [num_states, num_eclasses]; DEAD state self-loops.
    ``byte_to_class``: uint8/uint16 [256]."""

    __slots__ = ("table", "accept", "byte_to_class", "start", "dead")

    def __init__(self, table: np.ndarray, accept: np.ndarray,
                 byte_to_class: np.ndarray, start: int,
                 dead: int) -> None:
        self.table = table
        self.accept = accept
        self.byte_to_class = byte_to_class
        self.start = start
        self.dead = dead

    @property
    def num_states(self) -> int:
        return self.table.shape[0]

    def step_bytes(self, state: int, data: bytes) -> int:
        for b in data:
            state = int(self.table[state, self.byte_to_class[b]])
        return state

    def is_accept(self, state: int) -> bool:
        return bool(self.accept[state])

    def is_dead(self, state: int) -> bool:
        return state == self.dead


def _eps_closure(nfa: NFA, states: frozenset) -> frozenset:
    stack = list(states)
    seen = set(states)
    while stack:
        s = stack.pop()
        for t in nfa.eps[s]:
            if t not in seen:
                seen.add(t)
                stack.append(t)
    return frozenset(seen)


def _byte_equiv_classes(nfa: NFA) -> np.ndarray:
    """Partition bytes so any two bytes in a class behave identically
    across every NFA transition."""
    sig = np.zeros(256, dtype=np.int64)
    seen_sets: dict[frozenset, int] = {}
    bit = 0
    for trans in nfa.transitions:
        for byteset, _ in trans:
            if byteset not in seen_sets:
                seen_sets[byteset] = bit
                bit += 1
    # signature of a byte = which distinct bytesets contain it
    sigs = np.zeros((256, ), dtype=object)
    for i in range(256):
        sigs[i] = 0
    for byteset, b in seen_sets.items():
        for byte in byteset:
            sigs[byte] |= (1 << b)
    uniq = {}
    byte_to_class = np.zeros(256, dtype=np.int32)
    for i in range(256):
        key = sigs[i]
        if key not in uniq:
            uniq[key] = len(uniq)
        byte_to_class[i] = uniq[key]
    return byte_to_class


def compile_regex(pattern: str, max_states: int = 200_000) -> DFA:
    nfa = _Parser(pattern).parse()
    byte_to_class = _byte_equiv_classes(nfa)
    n_classes = int(byte_to_class.max()) + 1
    # class → representative byte
    reps = np.zeros(n_classes, dtype=np.int32)
    for b in range(255, -1, -1):
        reps[byte_to_class[b]] = b

    start = _eps_closure(nfa, frozenset([nfa.start]))
    dfa_states: dict[frozenset, int] = {start: 0}
    rows: list[list[int]] = []
    accepts: list[bool] = []
    work = [start]
    while work:
        cur = work.pop()
        idx = dfa_states[cur]
        while len(rows) <= idx:
            rows.append([])
            accepts.append(False)
        accepts[idx] = nfa.accept in cur
        row = [len(dfa_states) + max_states] * n_classes  # placeholder
        for cls in range(n_classes):
            b = int(reps[cls])
            nxt = set()
            for s in cur:
                for byteset, tgt in nfa.transitions[s]:
                    if b in byteset:
                        nxt.add(tgt)
            if not nxt:
                row[cls] = -1
                continue
            closure = _eps_closure(nfa, frozenset(nxt))
            if closure not in dfa_states:
                dfa_states[closure] = len(dfa_states)
                if len(dfa_states) > max_states:
                    raise ValueError("regex DFA too large")
                work.append(closure)
            row[cls] = dfa_states[closure]
        rows[idx] = row

    n = len(rows)
    dead = n  # extra dead state with self-loops
    table = np.full((n + 1, n_classes), dead, dtype=np.int32)
    for i, row in enumerate(rows):
        for cls, tgt in enumerate(row):
            table[i, cls] = dead if tgt < 0 else tgt
    accept = np.zeros(n + 1, dtype=bool)
    accept[:n] = accepts
    return DFA(table, accept, byte_to_class, start=0, dead=dead)


def fullmatch(dfa: DFA, data: bytes) -> bool:
    """Test helper: anchored match of raw bytes."""
    state = dfa.step_bytes(dfa.start, data)
    return dfa.is_accept(state)
