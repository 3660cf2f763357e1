"""Output chip + WRITE instruction (mirrors `output/src/{lib,columns,
stark}.rs`), with the intended-design fixes the archived reference leaves
dangling:

* WRITE pushes a bus-op-*with-memory* (the reference defines
  `push_bus_op_with_memory` but never calls it, leaving the general bus
  unbalanced for any output: CPU sends clk_or_zero=0 while the output chip
  receives clk).
* The output trace stores the full written word so the 12 channel-value
  fields of the general-bus message match the CPU side exactly; the output
  byte remains the word's low byte.
* `counter` and `diff` witness columns are actually populated (the
  reference constrains them but leaves them zero, which only passes on
  empty outputs).
"""

from __future__ import annotations

import numpy as np

from ..air.types import VPCol, Interaction
from ..core import opcodes as OC
from ..core.word import u32_to_bytes, MASK32
from ..field import babybear as bb
from .chip import Chip

CLK = 0
VALUE = [1, 2, 3, 4]  # full word (big-endian byte columns)
IS_REAL = 5
DIFF = 6
COUNTER = 7
COUNTER_MULT = 8
OPCODE = 9
NUM_OUTPUT_COLS = 10


class OutputChip(Chip):
    name = "output"

    def __init__(self):
        self.values: list[tuple[int, int]] = []  # (clk, word)

    def bytes(self) -> bytes:
        return bytes(u32_to_bytes(w)[3] for _clk, w in self.values)

    def width(self):
        return NUM_OUTPUT_COLS

    def generate_trace(self, machine):
        table_len = len(self.values)
        raw = []
        for (clk1, val1), (clk2, _v2) in zip(self.values, self.values[1:]):
            clk_diff = clk2 - clk1
            num_rows = clk_diff // table_len + 1 if table_len else 1
            for i in range(num_rows):
                if i == 0:
                    raw.append((clk1, val1, 1))
                else:
                    raw.append((clk1 + table_len * (i + 1), 0, 0))
        if self.values:
            raw.append((self.values[-1][0], self.values[-1][1], 1))

        n = len(raw)
        n2 = 1 << max((n - 1).bit_length(), 0) if n else 1
        rows = np.zeros((n2, NUM_OUTPUT_COLS), dtype=np.uint32)
        for i, (clk, word, is_real) in enumerate(raw):
            rows[i, CLK] = clk % bb.P
            for k, byte in enumerate(u32_to_bytes(word)):
                rows[i, VALUE[k]] = byte
            rows[i, IS_REAL] = is_real
            if is_real:
                rows[i, OPCODE] = OC.WRITE
        clks = rows[:, CLK].astype(np.int64)
        if n2 > 1:
            rows[: n2 - 1, DIFF] = ((clks[1:] - clks[:-1]) % bb.P).astype(np.uint32)
        rows[:, COUNTER] = np.arange(n2, dtype=np.uint32)
        return rows

    def global_receives(self, machine):
        fields = [VPCol.single_main(OPCODE)]
        fields += [VPCol.single_main(VALUE[i]) for i in range(4)]  # channel 0
        fields += [VPCol.const(0)] * 8  # channels 1, 2 unused by WRITE
        fields.append(VPCol.single_main(CLK))
        return [
            Interaction(fields=fields, count=VPCol.single_main(IS_REAL),
                        bus=machine.general_bus())
        ]

    def eval(self, b):
        local = b.main_local
        nxt = b.main_next
        b.when_transition().assert_eq(local[DIFF], nxt[CLK] - local[CLK])
        b.when_transition().assert_eq(nxt[COUNTER], local[COUNTER] + 1)
        b.when(local[IS_REAL]).assert_eq(local[OPCODE], OC.WRITE)


def ex_write(m, ops):
    """WRITE instruction (output/src/lib.rs:146-173)."""
    cpu = m.cpu()
    clk = cpu.clock
    ra = (cpu.fp + ops.b()) & MASK32
    value = m.mem().read(clk, ra, True, cpu.pc, OC.WRITE, 0)
    m.output().values.append((clk, value))
    cpu.push_bus_op_with_memory(None, OC.WRITE, ops)
    assert ops.is_imm() == 1
    assert ops.c() == 0
