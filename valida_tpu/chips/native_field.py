"""Native BabyBear field chip (mirrors `native_field/src/*`): ADD/SUB/MUL
on field elements encoded as base-256 words.  Not part of BasicMachine's
14 chips (native_field/src/lib.rs note), but available for machine
composition."""

from __future__ import annotations

import numpy as np

from ..air.types import VPCol, Interaction
from ..core import opcodes as OC
from ..core.word import u32_to_bytes, MASK32
from ..field import babybear as bb
from .chip import Chip, IndexAllocator, pad_to_power_of_two
from .alu import _read_b_c, _finish, _word_cols

_n = IndexAllocator()
NF_IN1 = _n.word()
NF_IN2 = _n.word()
NF_OUT = _n.word()
NF_IS_ADD = _n.scalar()
NF_IS_SUB = _n.scalar()
NF_IS_MUL = _n.scalar()
NUM_NATIVE_FIELD_COLS = _n.width


def _word_to_field(v: int) -> int:
    return v % bb.P


def _field_to_word(f: int) -> int:
    return f & MASK32  # canonical < p < 2^31 fits a u32 word


class NativeFieldChip(Chip):
    name = "native_field"

    def __init__(self):
        self.operations = []  # (kind, a, b, c) field-encoded words

    def width(self):
        return NUM_NATIVE_FIELD_COLS

    def generate_trace(self, machine):
        n = len(self.operations)
        rows = np.zeros((max(n, 1), NUM_NATIVE_FIELD_COLS), dtype=np.uint32)
        flag = {"add": NF_IS_ADD, "sub": NF_IS_SUB, "mul": NF_IS_MUL}
        for i, (kind, a, b, c) in enumerate(self.operations):
            _word_cols(rows, i, NF_IN1, b)
            _word_cols(rows, i, NF_IN2, c)
            _word_cols(rows, i, NF_OUT, a)
            rows[i, flag[kind]] = 1
        return pad_to_power_of_two(rows) if n else rows

    def global_sends(self, machine):
        is_real = VPCol.sum_main([NF_IS_ADD, NF_IS_SUB, NF_IS_MUL])
        return [
            Interaction(fields=[VPCol.single_main(c)], count=is_real,
                        bus=machine.range_bus())
            for c in NF_OUT
        ]

    def global_receives(self, machine):
        opcode = VPCol(
            [(("main", NF_IS_ADD), OC.ADD), (("main", NF_IS_SUB), OC.SUB),
             (("main", NF_IS_MUL), OC.MUL)]
        )
        fields = [opcode]
        fields += [VPCol.single_main(c) for c in NF_IN1 + NF_IN2 + NF_OUT]
        return [Interaction(
            fields=fields,
            count=VPCol.sum_main([NF_IS_ADD, NF_IS_SUB, NF_IS_MUL]),
            bus=machine.general_bus())]

    def eval(self, b):
        local = b.main_local
        base_m = [1 << 24, 1 << 16, 1 << 8, 1]

        def reduce(cols):
            return (base_m[0] * local[cols[0]] + base_m[1] * local[cols[1]]
                    + base_m[2] * local[cols[2]] + base_m[3] * local[cols[3]])

        x = reduce(NF_IN1)
        y = reduce(NF_IN2)
        z = reduce(NF_OUT)
        b.when(local[NF_IS_ADD]).assert_eq(z, x + y)
        b.when(local[NF_IS_SUB]).assert_eq(z, x - y)
        b.when(local[NF_IS_MUL]).assert_eq(z, x * y)


def _nf_exec(kind, opcode, fn):
    def ex(m, ops):
        b, c, imm, _ = _read_b_c(m, ops, opcode)
        a = _field_to_word(fn(_word_to_field(b), _word_to_field(c)))
        m.native_field().operations.append((kind, a, b, c))
        _finish(m, ops, opcode, a, imm)

    return ex


ex_fadd = _nf_exec("add", OC.ADD, lambda x, y: (x + y) % bb.P)
ex_fsub = _nf_exec("sub", OC.SUB, lambda x, y: (x - y) % bb.P)
ex_fmul = _nf_exec("mul", OC.MUL, lambda x, y: (x * y) % bb.P)
