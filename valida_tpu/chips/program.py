"""Program ROM chip (mirrors `program/src/{lib,columns,stark}.rs`).

Main trace: one multiplicity column.  Preprocessed: (pc, opcode, operands).
Deviation (intended design): the program-bus receive is ENABLED, matching
the CPU chip's (also enabled) send — possible here because preprocessed
traces are part of the openings.
"""

from __future__ import annotations

import numpy as np

from ..air.types import VPCol, Interaction
from ..core.program import ProgramROM
from .chip import Chip

MULTIPLICITY = 0
NUM_PROGRAM_COLS = 1

P_PC = 0
P_OPCODE = 1
P_OPERANDS = [2, 3, 4, 5, 6]
NUM_PREPROCESSED_COLS = 7


class ProgramChip(Chip):
    name = "program"

    def __init__(self):
        self.program_rom = ProgramROM()
        self.counts: list[int] = []

    def set_program_rom(self, rom: ProgramROM):
        self.program_rom = rom
        self.counts = [0] * len(rom)

    def read_word(self, index: int):
        assert index < len(self.program_rom)
        self.counts[index] += 1

    def width(self):
        return NUM_PROGRAM_COLS

    def generate_trace(self, machine):
        n = len(self.counts)
        n2 = 1 << max((n - 1).bit_length(), 0) if n else 1
        rows = np.zeros((n2, 1), dtype=np.uint32)
        rows[:n, 0] = np.array(self.counts, dtype=np.uint32)
        return rows

    def preprocessed_trace(self):
        n = len(self.program_rom)
        n2 = 1 << max((n - 1).bit_length(), 0) if n else 1
        rows = np.zeros((n2, NUM_PREPROCESSED_COLS), dtype=np.uint32)
        for i, iw in enumerate(self.program_rom.instructions):
            rows[i, P_PC] = i
            flat = iw.flatten()
            rows[i, P_OPCODE] = flat[0]
            for k in range(5):
                rows[i, P_OPERANDS[k]] = flat[1 + k]
        rows[n:, P_PC] = np.arange(n, n2)
        return rows

    def global_receives(self, machine):
        if machine.program_bus() is None:
            return []
        fields = [VPCol.single_prep(P_PC), VPCol.single_prep(P_OPCODE)]
        fields += [VPCol.single_prep(P_OPERANDS[i]) for i in range(5)]
        return [
            Interaction(fields=fields,
                        count=VPCol.single_main(MULTIPLICITY),
                        bus=machine.program_bus())
        ]

    def eval(self, b):
        pass
