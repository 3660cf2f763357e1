"""Native (C++) interpreter equivalence tests: identical chip state vs the
python interpreter on the golden programs, and a large-trace speed run."""

import os
import time

import numpy as np
import pytest

from valida_tpu.core import opcodes as OC
from valida_tpu.core.advice import FixedAdviceProvider
from valida_tpu.core.program import ProgramROM, InstructionWord, Operands
from valida_tpu.machine.basic import BasicMachine
from valida_tpu.native import available

pytestmark = pytest.mark.skipif(not available(), reason="no native toolchain")


def iw(opcode, a=0, b=0, c=0, d=0, e=0):
    return InstructionWord(opcode, Operands((a, b, c, d, e)))


def make_machine(program, static=None):
    m = BasicMachine()
    m.program().set_program_rom(ProgramROM(program))
    if static:
        for a, v in static.items():
            m.static_data().write(a, v)
    m.cpu().fp = 0x1000
    m.cpu().registers.append((m.cpu().pc, m.cpu().fp))
    return m


def compare_machines(m_py, m_cpp):
    assert m_py.cpu().clock == m_cpp.cpu().clock
    assert m_py.cpu().operations == m_cpp.cpu().operations
    assert [
        (i.opcode, i.operands.ops) for i in m_py.cpu().instructions
    ] == [(i.opcode, i.operands.ops) for i in m_cpp.cpu().instructions]
    assert m_py.cpu().registers == m_cpp.cpu().registers
    assert m_py.mem().cells == m_cpp.mem().cells
    assert m_py.mem().operations == m_cpp.mem().operations
    for acc in ["add_u32", "sub_u32", "mul_u32", "div_u32", "lt_u32",
                "com_u32", "bitwise_u32", "shift_u32"]:
        assert getattr(m_py, acc)().operations == getattr(m_cpp, acc)().operations, acc
    assert m_py.range().count == m_cpp.range().count
    assert m_py.program().counts == m_cpp.program().counts
    assert m_py.output().values == m_cpp.output().values


from tests.test_basic_machine import fib_program  # noqa: E402


def test_native_matches_python_fib():
    m_py = make_machine(fib_program())
    m_py.run(advice=FixedAdviceProvider.empty())
    m_cpp = make_machine(fib_program())
    m_cpp.run_native()
    compare_machines(m_py, m_cpp)


ALU_PROGRAM = [
    iw(OC.IMM32, -4, 0, 0, 0, 100),
    iw(OC.IMM32, -8, 0, 0, 0, 7),
    iw(OC.MUL32, -12, -4, -8, 0, 0),
    iw(OC.DIV32, -16, -12, -8, 0, 0),
    iw(OC.SHL32, -20, -8, 2, 0, 1),
    iw(OC.SHR32, -24, -4, 3, 0, 1),
    iw(OC.AND32, -28, -4, -8, 0, 0),
    iw(OC.OR32, -32, -4, -8, 0, 0),
    iw(OC.XOR32, -36, -4, -8, 0, 0),
    iw(OC.EQ32, -40, -4, -8, 0, 0),
    iw(OC.NE32, -44, -4, -8, 0, 0),
    iw(OC.SUB32, -48, -4, -8, 0, 0),
    iw(OC.MULHU32, -52, -4, -8, 0, 0),
    iw(OC.MULHS32, -60, -4, -8, 0, 0),
    iw(OC.SRA32, -56, -4, 4, 0, 1),
    iw(OC.SLT32, -64, -4, -8, 0, 0),
    iw(OC.SLE32, -68, -4, -8, 0, 0),
    iw(OC.LT32, -72, 3, -8, 1, 0),
    iw(OC.LOADFP, -76, 5, 0, 0, 0),
    iw(OC.SDIV32, -80, -4, -8, 0, 0),
    # negative operands: exercise the signed side-effect branches
    # (Sub32 negation rows, complemented SRA delegation, mulh carries)
    iw(OC.IMM32, -84, 255, 255, 255, 156),   # -100
    iw(OC.IMM32, -88, 255, 255, 255, 249),   # -7
    iw(OC.SDIV32, -92, -84, -8, 0, 0),       # -100 /  7
    iw(OC.SDIV32, -96, -84, -88, 0, 0),      # -100 / -7
    iw(OC.SDIV32, -100, -4, -88, 0, 0),      #  100 / -7
    iw(OC.SRA32, -104, -84, 3, 0, 1),        # negative sra (floor)
    iw(OC.MULHS32, -108, -84, -8, 0, 0),
    iw(OC.MULHS32, -112, -84, -88, 0, 0),
    iw(OC.MULHU32, -116, -84, -88, 0, 0),
    iw(OC.WRITE, 0, -8, 0, 0, 1),
    iw(OC.STOP),
]


def test_native_matches_python_alu():
    m_py = make_machine(ALU_PROGRAM)
    m_py.run(advice=FixedAdviceProvider.empty())
    m_cpp = make_machine(ALU_PROGRAM)
    m_cpp.run_native()
    compare_machines(m_py, m_cpp)


def test_native_matches_python_advice_and_bytes():
    program = [
        iw(OC.READ_ADVICE, -4, 0, 0, 0, 0),
        iw(OC.READ_ADVICE, -8, 0, 0, 0, 0),
        iw(OC.READ_ADVICE, -12, 0, 0, 0, 0),  # EOF -> 0xFFFFFFFF
        iw(OC.IMM32, -16, 0, 0, 1, 1),
        iw(OC.STOREU8, 0, -16, -4, 0, 0),
        iw(OC.LOADU8, -20, 0, -16, 0, 0),
        iw(OC.LOADS8, -24, 0, -16, 0, 0),
        iw(OC.STOP),
    ]
    m_py = make_machine(program, static={0x110: 0xAABBCCDD})
    m_py.run(advice=FixedAdviceProvider(bytes([7, 9])))
    m_cpp = make_machine(program, static={0x110: 0xAABBCCDD})
    m_cpp.run_native(advice_bytes=bytes([7, 9]))
    compare_machines(m_py, m_cpp)


def _loop_program(n_iters):
    return [
        iw(OC.IMM32, -4, 0, 0, 0, 0),  # counter
        iw(OC.IMM32, -8, 0, 0, 2, 0),
        # loop:
        iw(OC.ADD32, -4, -4, 1, 0, 1),
        iw(OC.ADD32, -12, -4, -4, 0, 0),
        iw(OC.BNE, 2 * 24, -4, n_iters, 0, 1),
        iw(OC.STOP),
    ]


def test_native_speed_large_trace():
    """Native interpreter executes a large trace correctly and fast.

    The speed RATIO assertion runs only under VALIDA_TPU_SLOW_TESTS: a
    load-sensitive threshold does not belong in the correctness suite
    (it flaked under nproc-saturating parallel load).  The default suite
    still executes both interpreters and checks the cycle counts."""
    py_rate = 0.0
    for _ in range(3):
        m_py = make_machine(_loop_program(1 << 11))
        t0 = time.perf_counter()
        m_py.run(advice=FixedAdviceProvider.empty())
        py_rate = max(py_rate, m_py.cpu().clock / (time.perf_counter() - t0))

    native_rate = 0.0
    for _ in range(3):
        m = make_machine(_loop_program(1 << 15))
        t0 = time.perf_counter()
        m.run_native(build_lists=False)  # zero-copy array mode
        native_rate = max(
            native_rate, m.cpu().clock / (time.perf_counter() - t0)
        )
        assert m.cpu().clock > 3 * (1 << 15)
    if os.environ.get("VALIDA_TPU_SLOW_TESTS"):
        assert native_rate > 1.2 * py_rate, (
            f"native {native_rate:.0f} steps/s vs python {py_rate:.0f}"
        )


def test_zero_copy_mode_traces_match():
    """build_lists=False must produce identical traces to list mode."""
    m_l = make_machine(ALU_PROGRAM)
    m_l.run_native(build_lists=True)
    m_a = make_machine(ALU_PROGRAM)
    m_a.run_native(build_lists=False)
    for chip_l, chip_a in zip(m_l.chips(), m_a.chips()):
        tl = np.asarray(chip_l.generate_trace(m_l))
        ta = np.asarray(chip_a.generate_trace(m_a))
        np.testing.assert_array_equal(tl, ta, err_msg=chip_l.name)
