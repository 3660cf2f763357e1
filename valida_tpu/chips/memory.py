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
        """Vectorized: flatten the op log, lexsort by (addr, clk) —
        memory/src/lib.rs:143-194 — and scatter columns."""
        mclk_l, mw_l, maddr_l, mval_l = [], [], [], []
        for ck in sorted(self.operations):
            for kind, addr, value in self.operations[ck]:
                mclk_l.append(ck)
                mw_l.append(kind == "w")
                maddr_l.append(addr)
                mval_l.append(value)
        n_ops = len(mclk_l)
        n_static = len(self.static_data)
        n = n_static + n_ops
        n2 = 1 << max((n - 1).bit_length(), 0) if n else 1
        rows = np.zeros((n2, NUM_MEM_COLS), dtype=np.uint32)
        rows[:n, COUNTER] = np.arange(n, dtype=np.uint32)

        if n_static:
            saddrs = np.fromiter(sorted(self.static_data), dtype=np.int64,
                                 count=n_static)
            svals = np.fromiter(
                (self.static_data[a] for a in sorted(self.static_data)),
                dtype=np.uint32, count=n_static,
            )
            rows[:n_static, IS_STATIC_INITIAL] = 1
            rows[:n_static, IS_WRITE] = 1
            rows[:n_static, ADDR] = (saddrs % bb.P).astype(np.uint32)
            for k in range(4):
                rows[:n_static, VALUE[k]] = (
                    (svals >> np.uint32(8 * (3 - k))) & np.uint32(0xFF)
                )

        if n_ops:
            mclk = np.array(mclk_l, dtype=np.int64)
            mwrite = np.array(mw_l, dtype=bool)
            maddr = np.array(maddr_l, dtype=np.int64)
            mvalue = np.array(mval_l, dtype=np.uint32)
            order = np.lexsort((mclk, maddr))  # stable (addr, clk)
            mclk, mwrite = mclk[order], mwrite[order]
            maddr, mvalue = maddr[order], mvalue[order]
            sl = slice(n_static, n)
            rows[sl, CLK] = (mclk % bb.P).astype(np.uint32)
            rows[sl, ADDR] = (maddr % bb.P).astype(np.uint32)
            for k in range(4):
                rows[sl, VALUE[k]] = (
                    (mvalue >> np.uint32(8 * (3 - k))) & np.uint32(0xFF)
                )
            rows[sl, IS_READ] = (~mwrite).astype(np.uint32)
            rows[sl, IS_WRITE] = mwrite.astype(np.uint32)
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
