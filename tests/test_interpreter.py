"""Interpreter-only integration tests (port of the reference's
`basic/tests/test_interpreter.rs`): assemble .val programs, run with a
FixedAdviceProvider tape, assert on output bytes vs a host model."""

import os

import pytest

from valida_tpu.core.advice import FixedAdviceProvider
from valida_tpu.core.program import ProgramROM
from valida_tpu.machine.basic import BasicMachine
from valida_tpu.tooling.assembler import assemble

HERE = os.path.dirname(os.path.abspath(__file__))


def run_program(name, advice=b"", native=False):
    with open(os.path.join(HERE, "programs", name)) as f:
        code = assemble(f.read())
    m = BasicMachine()
    m.program().set_program_rom(ProgramROM.from_machine_code(code))
    m.cpu().fp = 16777216  # default stack height
    m.cpu().registers.append((m.cpu().pc, m.cpu().fp))
    if native:
        m.run_native(advice_bytes=advice)
    else:
        m.run(advice=FixedAdviceProvider(advice))
    return m


def fibonacci(n):
    a, b = 0, 1
    for _ in range(n):
        a, b = b, (a + b) & 0xFFFFFFFF
    return a


@pytest.mark.parametrize("native", [False, True])
def test_run_fibonacci(native):
    """test_interpreter.rs:10-33: output = fib(25) as 4 LE bytes."""
    m = run_program("fibonacci.val", advice=bytes([25]), native=native)
    out = m.output().bytes()
    assert len(out) == 4
    assert int.from_bytes(out, "little") == fibonacci(25) == 75025


@pytest.mark.parametrize("native", [False, True])
def test_run_subtraction(native):
    m = run_program("subtraction.val", native=native)
    assert m.output().bytes() == bytes([7])


def test_fibonacci_overflowing():
    """fib(50) wraps mod 2^32 like the reference's overflowing_add model."""
    m = run_program("fibonacci.val", advice=bytes([50]))
    out = m.output().bytes()
    assert int.from_bytes(out, "little") == fibonacci(50)
    assert fibonacci(50) == 12586269025 & 0xFFFFFFFF


def test_prove_assembled_fibonacci():
    """The assembled advice-driven program (WRITE + DIV32 + JAL/JALV paths)
    proves and verifies end-to-end."""
    from valida_tpu.core.config import test_config

    m = run_program("fibonacci.val", advice=bytes([8]))
    assert int.from_bytes(m.output().bytes(), "little") == fibonacci(8)
    config = test_config()
    proof = m.prove(config)
    m.verify(config, proof)


def test_jalv_same_clk_read_after_write_detected():
    """An instruction that reads a cell it wrote this cycle (JALV with
    overlapping operand slots) is unprovable by design (memory phase
    ordering, docs/deviations.md §12) — both interpreters must reject it
    at execute time with a clear error, not at prove time."""
    from valida_tpu.chips.memory import SameClkReadAfterWrite
    from valida_tpu.native import NativeRunError, available

    asm = """\
main:
    imm32 -4(fp), 0, 0, 0, 48
    jalv -4(fp), -4(fp), -4(fp)
    stop
"""
    code = assemble(asm)

    m = BasicMachine()
    m.program().set_program_rom(ProgramROM.from_machine_code(code))
    m.cpu().fp = 0x1000
    m.cpu().registers.append((m.cpu().pc, m.cpu().fp))
    with pytest.raises(SameClkReadAfterWrite, match="same-clk"):
        m.run(advice=FixedAdviceProvider.empty())

    if available():
        m2 = BasicMachine()
        m2.program().set_program_rom(ProgramROM.from_machine_code(code))
        m2.cpu().fp = 0x1000
        with pytest.raises(NativeRunError, match="same-clk"):
            m2.run_native()
