"""Second/third machine compositions from the same chip set
(machine/compositions.py) — the analogue of the reference's
basic vs basic_macro genericity proof (`basic_macro/src/lib.rs:54-160`).
"""

import numpy as np
import pytest

from valida_tpu.core.advice import FixedAdviceProvider
from valida_tpu.core.config import default_config
from valida_tpu.core.program import ProgramROM
from valida_tpu.field import babybear as bb
from valida_tpu.machine.compositions import ExtendedMachine, LoadStoreMachine
from valida_tpu.machine.prover import prove
from valida_tpu.tooling.assembler import assemble

CONFIG = default_config(num_queries=4, proof_of_work_bits=1)

# imm32 operands b..e are the word's four bytes: 1000000 = 0x000F4240
NF_ASM = """\
main:
    imm32 -4(fp), 0, 15, 66, 64
    feadd -12(fp), -4(fp), -4(fp)
    femul -16(fp), -12(fp), -4(fp)
    fesub -20(fp), -4(fp), -12(fp)
    write 0, -16, 0, 0, 1
    stop
"""


def _setup(machine, asm):
    code = assemble(asm)
    machine.program().set_program_rom(ProgramROM.from_machine_code(code))
    machine.cpu().fp = 0x1000
    machine.cpu().registers.append((machine.cpu().pc, machine.cpu().fp))
    return machine


def _run(machine, asm, advice=b""):
    _setup(machine, asm)
    machine.run(advice=FixedAdviceProvider(advice))
    return machine


def test_extended_machine_native_field_ops():
    m = _run(ExtendedMachine(), NF_ASM)
    a = 1000000
    add = (a + a) % bb.P
    mul = add * a % bb.P
    sub = (a - add) % bb.P
    ops = m.native_field().operations
    assert [(k, x) for k, x, _b, _c in ops] == [
        ("add", add), ("mul", mul), ("sub", sub)
    ]
    # memory cells hold the field-encoded results
    assert m.mem().peek((m.cpu().fp - 12) & 0xFFFFFFFF) == add
    assert m.mem().peek((m.cpu().fp - 16) & 0xFFFFFFFF) == mul
    assert m.mem().peek((m.cpu().fp - 20) & 0xFFFFFFFF) == sub


def test_extended_machine_prove_verify():
    m = _run(ExtendedMachine(), NF_ASM)
    proof = prove(m, CONFIG)
    m.verify(CONFIG, proof)


def test_extended_machine_native_interpreter_matches():
    m_py = _run(ExtendedMachine(), NF_ASM)
    m_nat = _setup(ExtendedMachine(), NF_ASM)
    m_nat.run_native()
    assert m_nat.native_field().operations and (
        list(m_nat.native_field().operations)
        == list(m_py.native_field().operations)
    )
    for c_py, c_nat in zip(m_py.chips(), m_nat.chips()):
        np.testing.assert_array_equal(
            np.asarray(c_py.generate_trace(m_py)),
            np.asarray(c_nat.generate_trace(m_nat)),
            err_msg=c_py.name,
        )


# sw/lw are indirect (the fp-relative cell holds the target ADDRESS,
# cpu/src/lib.rs store semantics); byte addressing is little-endian into
# the big-endian cell (core/word.py index_of_byte), so the value's low
# byte lives at the word address itself.
LS_ASM = """\
main:
    imm32 -4(fp), 0, 0, 0, 77
    imm32 -8(fp), 0, 0, 1, 0
    sw -8(fp), -4(fp)
    imm32 -16(fp), 0, 0, 1, 0
    loadu8 -12(fp), -16(fp)
    beq skip, -4(fp), -12(fp)
    imm32 -4(fp), 0, 0, 0, 0
skip:
    write 0, -4, 0, 0, 1
    stop
"""


def test_loadstore_machine_prove_verify():
    m = _run(LoadStoreMachine(), LS_ASM)
    assert m.output().bytes() == bytes([77])
    proof = prove(m, CONFIG)
    m.verify(CONFIG, proof)


def test_loadstore_machine_rejects_alu_opcodes():
    m = LoadStoreMachine()
    code = assemble("main:\n    add -4(fp), -8(fp), -12(fp)\n    stop\n")
    m.program().set_program_rom(ProgramROM.from_machine_code(code))
    with pytest.raises(RuntimeError, match="Unrecognized opcode"):
        m.run(advice=FixedAdviceProvider.empty())
