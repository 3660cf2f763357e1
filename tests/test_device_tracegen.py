"""Device-side trace materialization (Chip.build_trace): the jnp build
must be bit-identical to the numpy build (which IS generate_trace) for
every chip that exposes compact device inputs — the compiled stage the
jitted prover runs on-device from op logs (VERDICT r1 #3).
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from valida_tpu.machine.basic import BasicMachine  # noqa: E402


def _loaded_machine(seed=0, n_ops=200):
    """A BasicMachine with a dense random op mix injected directly into
    the ALU chips (no program needed for trace-gen equality)."""
    rng = np.random.default_rng(seed)
    m = BasicMachine()

    def words(k):
        return [int(x) for x in rng.integers(0, 1 << 32, size=k, dtype=np.uint64)]

    from valida_tpu.core.word import (
        add_u32, sub_u32, mul_u32, mulhs_u32, mulhu_u32, div_u32, sdiv_u32,
        shl_u32, shr_u32, sra_u32, to_signed,
    )

    for b, c in zip(words(n_ops), words(n_ops)):
        m.add_u32().operations.append((add_u32(b, c), b, c))
        m.sub_u32().operations.append((sub_u32(b, c), b, c))
        m.com_u32().operations.append(
            ("ne" if (b + c) % 2 else "eq",
             (1 if b != c else 0) if (b + c) % 2 else (1 if b == c else 0),
             b, c))
        m.bitwise_u32().operations.append(
            (["and", "or", "xor"][(b ^ c) % 3],
             [b & c, b | c, b ^ c][(b ^ c) % 3], b, c))
        kind = ["lt", "lte", "slt", "sle"][(b + c) % 4]
        fn = {
            "lt": lambda x, y: x < y, "lte": lambda x, y: x <= y,
            "slt": lambda x, y: to_signed(x) < to_signed(y),
            "sle": lambda x, y: to_signed(x) <= to_signed(y),
        }[kind]
        m.lt_u32().operations.append((kind, 1 if fn(b, c) else 0, b, c))
        mk = ["mul", "mulhs", "mulhu"][(b * 7 + c) % 3]
        mfn = {"mul": mul_u32, "mulhs": mulhs_u32, "mulhu": mulhu_u32}[mk]
        m.mul_u32().operations.append((mk, mfn(b, c), b, c))
        if c != 0:
            dk = "div" if (b % 2) else "sdiv"
            dfn = div_u32 if dk == "div" else sdiv_u32
            m.div_u32().operations.append((dk, dfn(b, c), b, c))
        sk = ["shl", "shr", "sra"][b % 3]
        sfn = {"shl": shl_u32, "shr": shr_u32, "sra": sra_u32}[sk]
        m.shift_u32().operations.append((sk, sfn(b, c), b, c))
    # duplicate edge cases: equal inputs, zero inputs, sign boundaries
    for b, c in [(0, 0), (5, 5), (0x80000000, 1), (1, 0x80000000),
                 (0xFFFFFFFF, 0xFFFFFFFF), (0x7FFFFFFF, 0x80000000)]:
        m.add_u32().operations.append((add_u32(b, c), b, c))
        m.com_u32().operations.append(("eq", 1 if b == c else 0, b, c))
        m.lt_u32().operations.append(("slt", 1 if to_signed(b) < to_signed(c) else 0, b, c))
        if c:
            m.div_u32().operations.append(("sdiv", sdiv_u32(b, c), b, c))
    return m


@pytest.mark.parametrize("chip_name", [
    "add_u32", "sub_u32", "mul_u32", "div_u32", "lt_u32", "com_u32",
    "bitwise_u32", "shift_u32",
])
def test_device_build_matches_host(chip_name):
    m = _loaded_machine()
    chip = next(c for c in m.chips() if c.name == chip_name)
    dti = chip.device_trace_inputs(m)
    assert dti is not None
    inputs, meta = dti
    host = chip.build_trace(np, inputs, meta)
    dev = jax.jit(
        lambda *inp: chip.build_trace(jnp, inp, meta)
    )(*(jnp.asarray(x) for x in inputs))
    np.testing.assert_array_equal(host, np.asarray(dev), err_msg=chip_name)
    # and the host build IS generate_trace
    np.testing.assert_array_equal(host, chip.generate_trace(m))


def test_compact_inputs_are_much_smaller():
    m = _loaded_machine()
    for c in m.chips():
        dti = c.device_trace_inputs(m)
        if dti is None:
            continue
        inputs, meta = dti
        in_bytes = sum(x.nbytes for x in inputs)
        trace = c.generate_trace(m)
        assert in_bytes * 2 < trace.nbytes, c.name


def _program_machine():
    from valida_tpu.core.advice import FixedAdviceProvider
    from valida_tpu.core.program import ProgramROM
    from valida_tpu.tooling.assembler import assemble

    asm = """\
main:
    imm32 -4(fp), 0, 0, 0, 17
    imm32 -8(fp), 0, 0, 0, 5
    add -12(fp), -4(fp), -8(fp)
    mul -16(fp), -4(fp), -8(fp)
    div -20(fp), -4(fp), -8(fp)
    sdiv -24(fp), -4(fp), -8(fp)
    slt -28(fp), -4(fp), -8(fp)
    andi -32(fp), -4(fp), 12
    shl -40(fp), -4(fp), -8(fp)
    sra -44(fp), -4(fp), -8(fp)
    ilt -46(fp), 3, -8(fp)
    imm32 -60(fp), 0, 0, 1, 0
    sw -60(fp), -12(fp)
    imm32 -64(fp), 0, 0, 1, 0
    loadu8 -68(fp), -64(fp)
    loads8 -72(fp), -64(fp)
    imm32 -76(fp), 0, 0, 1, 8
    storeu8 -76(fp), -4(fp)
    jal -80(fp), next, -80
next:
    write 0, 68, 0, 0, 1
    stop
"""
    m = BasicMachine()
    m.program().set_program_rom(ProgramROM.from_machine_code(assemble(asm)))
    m.cpu().fp = 0x2000
    m.cpu().registers.append((m.cpu().pc, m.cpu().fp))
    m.run(advice=FixedAdviceProvider.empty())
    return m


@pytest.mark.parametrize("chip_name", ["cpu", "mem", "byte", "add_u32",
                                       "shift_u32", "lt_u32"])
def test_device_build_matches_host_real_program(chip_name):
    m = _program_machine()
    chip = next(c for c in m.chips() if c.name == chip_name
                or (chip_name == "mem" and c.name == "memory"))
    dti = chip.device_trace_inputs(m)
    assert dti is not None, chip.name
    inputs, meta = dti
    host = chip.build_trace(np, inputs, meta)
    dev = jax.jit(
        lambda *inp: chip.build_trace(jnp, inp, meta)
    )(*(jnp.asarray(x) for x in inputs))
    np.testing.assert_array_equal(host, np.asarray(dev), err_msg=chip.name)
    np.testing.assert_array_equal(host, np.asarray(chip.generate_trace(m)))
