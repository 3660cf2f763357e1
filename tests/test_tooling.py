"""Tooling tests: assembler golden programs from the reference's
interpreter tests, CBOR proof round-trip, CLI run/prove/verify, REPL."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from valida_tpu.core.advice import FixedAdviceProvider
from valida_tpu.core.config import test_config
from valida_tpu.core.program import ProgramROM
from valida_tpu.machine.basic import BasicMachine
from valida_tpu.tooling.assembler import assemble
from valida_tpu.tooling.serde import serialize_proof, deserialize_proof
from valida_tpu.tooling.repl import Repl

# The reference's fibonacci.val (basic/tests/programs/assembly): reads 4
# advice bytes as n, computes fib(n), writes 4 output bytes.
FIB_ASM = """\
; input: 4 advice bytes -> n ; output: fib(n) bytes
main:
    imm32 0(fp), 0, 0, 0, 0
    advread -4(fp)
    advread -8(fp)
    advread -12(fp)
    advread -16(fp)
    imm32 -20(fp), 0, 0, 0, 0
    imm32 -24(fp), 0, 0, 0, 1
    imm32 -28(fp), 0, 0, 0, 0
loop:
    beq finish, -28(fp), -16(fp)
    add -32(fp), -20(fp), -24(fp)
    addi -20(fp), -24(fp), 0
    addi -24(fp), -32(fp), 0
    addi -28(fp), -28(fp), 1
    beq loop, 0(fp), 0(fp)
finish:
    write 0(fp), -20(fp), 0, 0, 1
    stop
"""


def run_asm(asm, advice=b""):
    code = assemble(asm)
    m = BasicMachine()
    m.program().set_program_rom(ProgramROM.from_machine_code(code))
    m.cpu().fp = 0x1000
    m.cpu().registers.append((m.cpu().pc, m.cpu().fp))
    m.run(advice=FixedAdviceProvider(advice))
    return m


def fib(n):
    a, b = 0, 1
    for _ in range(n):
        a, b = b, a + b
    return a


def test_assembler_fib_with_advice_and_output():
    m = run_asm(FIB_ASM, advice=bytes([0, 0, 0, 10]))
    out = m.output().bytes()
    assert out[-1] == fib(10) % 256


def test_assembler_label_offsets():
    code = assemble("main:\n  stop\n")
    assert len(code) == 24
    assert code[0] == 8  # STOP opcode little-endian


def test_assembler_imm_variants():
    m = run_asm(
        """\
start:
    imm32 -4(fp), 0, 0, 0, 7
    subi -8(fp), -4(fp), 3
    muli -12(fp), -8(fp), 5
    stop
"""
    )
    assert m.mem().cells[0x1000 - 8] == 4
    assert m.mem().cells[0x1000 - 12] == 20


def test_proof_cbor_roundtrip_and_verify():
    m = run_asm(
        """\
main:
    imm32 -4(fp), 0, 0, 0, 11
    addi -8(fp), -4(fp), 31
    stop
"""
    )
    config = test_config()
    proof = m.prove(config)
    blob = serialize_proof(proof)
    assert isinstance(blob, bytes) and len(blob) > 100
    proof2 = deserialize_proof(blob)
    m.verify(config, proof2)


def test_proof_meta_names_transcript_config():
    """The CBOR meta header records the poseidon scheme (and hasher when a
    config is passed) so a mismatched verifier fails actionably instead of
    with an opaque Fiat-Shamir error (ADVICE r4)."""
    from valida_tpu.crypto import poseidon
    from valida_tpu.tooling.serde import proof_meta

    m = run_asm("main:\n    imm32 -4(fp), 0, 0, 0, 5\n    stop\n")
    config = test_config()
    proof = m.prove(config)
    meta = proof_meta(serialize_proof(proof, config))
    assert meta["v"] == 1
    assert meta["poseidon"] == poseidon.PARAM_SET
    assert meta["hasher"] == config.pcs.config.hasher
    # without a config the hasher is unknown but the scheme is still tagged
    assert "hasher" not in proof_meta(serialize_proof(proof))


def test_cli_verify_rejects_scheme_mismatch(tmp_path, capsys):
    """A proof tagged with a different poseidon scheme must fail verify
    with a message naming the prover's flags, before any transcript work."""
    from valida_tpu.tooling.cli import main as cli_main
    from valida_tpu.tooling.serde import cbor_dumps, cbor_loads

    code = assemble("main:\n  imm32 -4(fp), 0, 0, 0, 7\n  stop\n")
    prog = tmp_path / "prog.bin"
    prog.write_bytes(code)
    proof_file = tmp_path / "proof.cbor"
    assert cli_main(["prove", str(prog), str(proof_file)]) == 0
    obj = cbor_loads(proof_file.read_bytes())
    obj["meta"]["poseidon"] = "sha256" if obj["meta"]["poseidon"] != "sha256" \
        else "p3rng"
    proof_file.write_bytes(cbor_dumps(obj))
    assert cli_main(["verify", str(prog), str(proof_file)]) == 1
    out = capsys.readouterr().out
    assert "transcript configuration" in out and "--poseidon" in out


def test_repl_basic_session():
    code = assemble("main:\n  imm32 -4(fp), 0, 0, 0, 9\n  stop\n")

    def make():
        m = BasicMachine()
        m.program().set_program_rom(ProgramROM.from_machine_code(code))
        m.cpu().fp = 0x1000
        m.cpu().registers.append((m.cpu().pc, m.cpu().fp))
        return m

    r = Repl(make, FixedAdviceProvider.empty())
    assert "IMM32" in r.dispatch("l")
    assert "pc=0" in r.dispatch("status")
    r.dispatch("s")
    assert "pc=1" in r.dispatch("status")
    r.dispatch("c")
    assert "stopped=True" in r.dispatch("status")
    assert "9" in r.dispatch("m 0xffc 1")
    r.dispatch("r")
    assert "pc=0" in r.dispatch("status")


def test_cli_run_prove_verify(tmp_path):
    code = assemble(
        """\
main:
    imm32 -4(fp), 0, 0, 0, 42
    write 0(fp), -4(fp), 0, 0, 1
    stop
"""
    )
    prog = tmp_path / "prog.bin"
    prog.write_bytes(code)
    out = tmp_path / "out.bin"
    from valida_tpu.tooling.cli import main as cli_main

    assert cli_main(["run", str(prog), str(out)]) == 0
    assert out.read_bytes() == bytes([42])
