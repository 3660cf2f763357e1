"""Small example machines (used by tests and the driver dry-run).

MiniMachine is the SURVEY.md §7 "minimum end-to-end slice": a two-chip
machine (sender + range table) with a global bus lookup, exercising the
full prove/verify pipeline — trace commit, LogUp permutation traces,
quotient evaluation, FRI openings, OOD check, cumulative-sum balance —
without the VM layer.
"""

from __future__ import annotations

import numpy as np

from ..air import VPCol, Interaction, Bus, GLOBAL
from ..chips import Chip, IndexAllocator, pad_to_power_of_two
from .machine import Machine

RANGE_BUS = Bus(GLOBAL, 0)
MAX = 16  # 4-bit range table


class SenderChip(Chip):
    """Rows of nibble pairs (a, b) with witnessed sum; sends a and b to the
    range bus, constrained a + b == c."""

    name = "sender"
    alloc = IndexAllocator()
    A = alloc.scalar()
    B = alloc.scalar()
    C = alloc.scalar()
    IS_REAL = alloc.scalar()
    WIDTH = alloc.width

    def __init__(self, pairs):
        self.pairs = pairs  # [(a, b)]

    def width(self):
        return self.WIDTH

    def generate_trace(self, machine):
        rows = np.zeros((len(self.pairs), self.WIDTH), dtype=np.uint32)
        for i, (a, b) in enumerate(self.pairs):
            rows[i] = [a, b, a + b, 1]
        return pad_to_power_of_two(rows)

    def global_sends(self, machine):
        return [
            Interaction(fields=[VPCol.single_main(self.A)],
                        count=VPCol.single_main(self.IS_REAL),
                        bus=machine.range_bus()),
            Interaction(fields=[VPCol.single_main(self.B)],
                        count=VPCol.single_main(self.IS_REAL),
                        bus=machine.range_bus()),
        ]

    def eval(self, b):
        local = b.main_local
        b.assert_zero(
            local[self.IS_REAL] * (local[self.A] + local[self.B] - local[self.C])
        )
        b.assert_bool(local[self.IS_REAL])


class RangeChip(Chip):
    """Range table 0..MAX with main counter + multiplicity and a
    preprocessed counter column (exercising preprocessed commits)."""

    name = "range"

    def __init__(self):
        self.counts = {}

    def width(self):
        return 2

    def generate_trace(self, machine):
        rows = np.zeros((MAX, 2), dtype=np.uint32)
        for v, c in self.counts.items():
            rows[v, 0] = c
        rows[:, 1] = np.arange(MAX)
        return rows

    def preprocessed_trace(self):
        return np.arange(MAX, dtype=np.uint32).reshape(MAX, 1)

    def global_receives(self, machine):
        return [
            Interaction(fields=[VPCol.single_main(1)],
                        count=VPCol.single_main(0),
                        bus=machine.range_bus()),
        ]

    def eval(self, b):
        # main counter equals the preprocessed counter
        b.assert_eq(b.main_local[1], b.preprocessed_local[0])


class MiniMachine(Machine):
    def __init__(self, pairs):
        self.sender = SenderChip(pairs)
        self.range = RangeChip()
        for a, b in pairs:
            for v in (a, b):
                self.range.counts[v] = self.range.counts.get(v, 0) + 1

    def chips(self):
        return [self.sender, self.range]

    def range_bus(self):
        return RANGE_BUS


def random_mini_machine(n_pairs: int, seed: int = 0) -> MiniMachine:
    rng = np.random.default_rng(seed)
    pairs = [
        (int(a), int(b))
        for a, b in rng.integers(0, MAX, size=(n_pairs, 2))
    ]
    return MiniMachine(pairs)


class Sender2Chip(SenderChip):
    """Second sender with its own (smaller) height — distinct name so the
    two senders are separate chips in the proof."""

    name = "sender2"


class OneRowChip(Chip):
    """Single-row chip: sends its one value to the range bus.  Exercises
    the log_degree-0 commit / 2-row-LDE / opening path (BasicMachine hits
    it via the 1-row StaticDataChip, but only in slow tests)."""

    name = "onerow"

    def __init__(self, value: int):
        self.value = value

    def width(self):
        return 2

    def generate_trace(self, machine):
        return np.array([[self.value, 1]], dtype=np.uint32)

    def global_sends(self, machine):
        return [
            Interaction(fields=[VPCol.single_main(0)],
                        count=VPCol.single_main(1),
                        bus=machine.range_bus()),
        ]

    def eval(self, b):
        b.assert_bool(b.main_local[1])


class RaggedMachine(Machine):
    """4 heterogeneous chips (heights n, n//8, 16, 1), a preprocessed
    matrix, one global bus — a cheap default-suite stand-in for
    BasicMachine's hard sharding cases (ragged trace heights, a
    preprocessed commit, a 1-row trace) in distributed proves
    (VERDICT r3 #8)."""

    def __init__(self, pairs, pairs2, one_value: int):
        self.sender = SenderChip(pairs)
        self.sender2 = Sender2Chip(pairs2)
        self.onerow = OneRowChip(one_value)
        self.range = RangeChip()
        for a, b in list(pairs) + list(pairs2):
            for v in (a, b):
                self.range.counts[v] = self.range.counts.get(v, 0) + 1
        self.range.counts[one_value] = (
            self.range.counts.get(one_value, 0) + 1
        )

    def chips(self):
        return [self.sender, self.sender2, self.range, self.onerow]

    def range_bus(self):
        return RANGE_BUS


def random_ragged_machine(n_pairs: int, seed: int = 0) -> RaggedMachine:
    rng = np.random.default_rng(seed)
    pairs = [
        (int(a), int(b))
        for a, b in rng.integers(0, MAX, size=(n_pairs, 2))
    ]
    pairs2 = [
        (int(a), int(b))
        for a, b in rng.integers(0, MAX, size=(max(n_pairs // 8, 1), 2))
    ]
    return RaggedMachine(pairs, pairs2, int(rng.integers(0, MAX)))
