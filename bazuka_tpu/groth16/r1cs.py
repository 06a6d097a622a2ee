"""R1CS constraint system — the gadget substrate.

Equivalent in role to bellman's `ConstraintSystem` trait consumed by the
reference's circuits (reference: src/mpn/circuits/, src/zk/groth16/gadgets/).
One class serves both modes:
  * setup mode (values absent) — records constraints only, for keygen
  * proving mode (values present) — records constraints AND computes the
    full assignment

Variables are integers: 0 is the constant ONE; 1..num_inputs are public
inputs; the rest are aux (witness).  Linear combinations are dicts
{var: coeff} with coeffs in Fr.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..fields.host import FR_MODULUS

P = FR_MODULUS

LC = Dict[int, int]  # var index -> coefficient

ONE = 0


def lc(*terms: Tuple[int, int]) -> LC:
    """Build an LC from (var, coeff) pairs, merging duplicates."""
    out: LC = {}
    for var, coeff in terms:
        c = (out.get(var, 0) + coeff) % P
        if c:
            out[var] = c
        else:
            out.pop(var, None)
    return out


def lc_add(a: LC, b: LC) -> LC:
    out = dict(a)
    for var, coeff in b.items():
        c = (out.get(var, 0) + coeff) % P
        if c:
            out[var] = c
        else:
            out.pop(var, None)
    return out


def lc_sub(a: LC, b: LC) -> LC:
    return lc_add(a, lc_scale(b, P - 1))


def lc_scale(a: LC, k: int) -> LC:
    k %= P
    if k == 0:
        return {}
    return {var: coeff * k % P for var, coeff in a.items()}


def lc_const(k: int) -> LC:
    k %= P
    return {ONE: k} if k else {}


class SynthesisError(Exception):
    pass


class ConstraintSystem:
    """Accumulates constraints a·b = c and (optionally) the assignment."""

    def __init__(self, proving: bool = True):
        self.proving = proving
        # assignment[i] is None in setup mode (except ONE)
        self.assignment: List[Optional[int]] = [1]
        self.num_inputs = 1  # includes ONE
        self.input_indices: List[int] = [0]
        self.constraints: List[Tuple[LC, LC, LC]] = []

    # ---- allocation

    def alloc(self, value: Optional[int] = None) -> int:
        """Allocate an aux (witness) variable."""
        if self.proving and value is None:
            raise SynthesisError("missing witness value in proving mode")
        idx = len(self.assignment)
        self.assignment.append(value % P if value is not None else None)
        return idx

    def alloc_input(self, value: Optional[int] = None) -> int:
        """Allocate a public input.  Must be called before aux allocations
        are interleaved if input ordering matters (it does: the verifier
        feeds inputs in allocation order)."""
        if self.proving and value is None:
            raise SynthesisError("missing input value in proving mode")
        idx = len(self.assignment)
        self.assignment.append(value % P if value is not None else None)
        self.input_indices.append(idx)
        self.num_inputs += 1
        return idx

    # ---- constraints

    def enforce(self, a: LC, b: LC, c: LC):
        self.constraints.append((a, b, c))

    # ---- evaluation

    def value(self, var: int) -> Optional[int]:
        return self.assignment[var]

    def eval_lc(self, l: LC) -> Optional[int]:
        acc = 0
        for var, coeff in l.items():
            v = self.assignment[var]
            if v is None:
                return None
            acc += v * coeff
        return acc % P

    def is_satisfied(self) -> Optional[int]:
        """Index of the first violated constraint, or None if all hold."""
        for i, (a, b, c) in enumerate(self.constraints):
            av, bv, cv = self.eval_lc(a), self.eval_lc(b), self.eval_lc(c)
            if av is None or bv is None or cv is None:
                raise SynthesisError(f"unassigned variable in constraint {i}")
            if av * bv % P != cv:
                return i
        return None

    # ---- canonical matrices (input-major reindexing)

    def reindexed(self):
        """Return (num_vars, num_inputs, A, B, C, full_assignment) with
        variables renumbered so inputs occupy 0..num_inputs-1 (ONE first,
        then public inputs in allocation order) and aux follow.  Matrices
        are lists (one per constraint) of {new_var: coeff}."""
        remap = {}
        for new, old in enumerate(self.input_indices):
            remap[old] = new
        nxt = len(self.input_indices)
        for old in range(len(self.assignment)):
            if old not in remap:
                remap[old] = nxt
                nxt += 1

        def remap_lc(l: LC) -> LC:
            return {remap[v]: c for v, c in l.items()}

        A = [remap_lc(a) for a, _, _ in self.constraints]
        B = [remap_lc(b) for _, b, _ in self.constraints]
        C = [remap_lc(c) for _, _, c in self.constraints]
        assignment: List[Optional[int]] = [None] * len(self.assignment)
        for old, new in remap.items():
            assignment[new] = self.assignment[old]
        return len(self.assignment), self.num_inputs, A, B, C, assignment
