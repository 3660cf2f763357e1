"""ctypes bindings for the native interpreter core.

`run_native(machine, program, static_data, advice)` executes a program with
the C++ VM and fills the machine's chip operation logs exactly as the
python interpreter would — ~100x the step rate for large traces.

Falls back cleanly: `available()` is False if the toolchain/library is
missing, and callers keep the python path.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def available() -> bool:
    return _load() is not None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    try:
        from .build import build

        path = build()
        lib = ctypes.CDLL(path)
    except Exception:
        return None
    lib.vm_create.restype = ctypes.c_void_p
    lib.vm_create.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.c_uint32, ctypes.c_uint32]
    lib.vm_error.restype = ctypes.c_char_p
    lib.vm_error.argtypes = [ctypes.c_void_p]
    lib.vm_run.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.vm_clock.restype = ctypes.c_uint64
    for name in ["vm_clock", "vm_pc", "vm_fp", "vm_num_cpu_ops",
                 "vm_num_mem_ops", "vm_num_program_counts", "vm_num_outputs",
                 "vm_num_cells"]:
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    for name in ["vm_pc", "vm_fp"]:
        getattr(lib, name).restype = ctypes.c_uint32
    for name in ["vm_num_cpu_ops", "vm_num_mem_ops", "vm_num_program_counts",
                 "vm_num_outputs", "vm_num_cells"]:
        getattr(lib, name).restype = ctypes.c_size_t
    for name in ["add_ops", "sub_ops", "mul_ops", "div_ops", "lt_ops",
                 "com_ops", "bitwise_ops", "shift_ops", "nf_ops"]:
        getattr(lib, f"vm_num_{name}").restype = ctypes.c_size_t
        getattr(lib, f"vm_num_{name}").argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def _ptr(arr):
    return arr.ctypes.data_as(ctypes.c_void_p)


_CPU_KINDS = [
    "load", "load_u8", "load_s8", "store", "store_u8", "jal", "jalv",
    "beq", "bne", "imm32", "advice", "stop", "loadfp", "bus",
    "bus_left_imm", "bus_with_memory",
]

_ALU_KINDS = {
    "add_ops": [None],
    "sub_ops": [None],
    "mul_ops": ["mul", "mulhs", "mulhu"],
    "div_ops": ["div", "sdiv"],
    "lt_ops": ["lt", "lte", "slt", "sle"],
    "com_ops": ["ne", "eq"],
    "bitwise_ops": ["and", "or", "xor"],
    "shift_ops": ["shl", "shr", "sra"],
    "nf_ops": ["add", "sub", "mul"],
}


class NativeRunError(RuntimeError):
    pass


def run_native(machine, max_steps: int = 1 << 32,
               build_lists: bool = True) -> None:
    """Execute `machine`'s loaded program with the C++ core and populate its
    chip state (op logs, memory cells, counts, outputs).

    build_lists=False is the zero-copy fast path: op logs are handed to the
    chips as numpy arrays (chip.ops_arrays / tuple-of-arrays operations)
    and the python-tuple logs are skipped — trace generation consumes the
    arrays directly."""
    from ..core.program import Operands, InstructionWord

    lib = _load()
    if lib is None:
        raise NativeRunError("native interpreter unavailable")

    rom = machine.program().program_rom
    code = rom.to_machine_code()
    cpu = machine.cpu()
    pc0, fp0 = cpu.pc, cpu.fp
    vm = lib.vm_create(code, len(code), pc0, fp0)
    try:
        static = machine.static_data().cells
        if static:
            addrs = np.fromiter(static.keys(), dtype=np.uint32)
            vals = np.fromiter(static.values(), dtype=np.uint32)
            lib.vm_set_static(ctypes.c_void_p(vm), _ptr(addrs), _ptr(vals),
                              len(addrs))
            for a, v in static.items():
                machine.mem().write_static(a, v)
        advice = getattr(machine, "_advice_bytes", b"")
        if advice:
            adv = np.frombuffer(advice, dtype=np.uint8)
            lib.vm_set_advice(ctypes.c_void_p(vm), _ptr(adv), len(adv))

        if lib.vm_run(ctypes.c_void_p(vm), max_steps) != 0:
            raise NativeRunError(lib.vm_error(ctypes.c_void_p(vm)).decode())

        vmp = ctypes.c_void_p(vm)
        clock = int(lib.vm_clock(vmp))

        # -- cpu ops --------------------------------------------------------
        n = int(lib.vm_num_cpu_ops(vmp))
        kind = np.zeros(n, dtype=np.uint8)
        has_imm = np.zeros(n, dtype=np.uint8)
        imm = np.zeros(n, dtype=np.uint32)
        opcode = np.zeros(n, dtype=np.uint32)
        operands = np.zeros((n, 5), dtype=np.int32)
        pcs = np.zeros(n, dtype=np.uint32)
        fps = np.zeros(n, dtype=np.uint32)
        lib.vm_copy_cpu_ops(vmp, _ptr(kind), _ptr(has_imm), _ptr(imm),
                            _ptr(opcode), _ptr(operands), _ptr(pcs), _ptr(fps))
        # pre-execution register state per op = [initial] + posts[:-1]
        pre_pc = np.concatenate([[pc0], pcs[:-1].astype(np.uint64)]) if n else np.zeros(0, dtype=np.uint64)
        pre_fp = np.concatenate([[fp0], fps[:-1].astype(np.uint64)]) if n else np.zeros(0, dtype=np.uint64)
        if build_lists:
            kind_l = kind.tolist()
            has_imm_l = has_imm.tolist()
            imm_l = imm.tolist()
            cpu.operations = [
                (_CPU_KINDS[k], im if h else None)
                for k, h, im in zip(kind_l, has_imm_l, imm_l)
            ]
            ops_l = operands.tolist()
            cpu.instructions = [
                InstructionWord(oc, Operands(tuple(o)))
                for oc, o in zip(opcode.tolist(), ops_l)
            ]
            posts = list(zip(pcs.tolist(), fps.tolist()))
            if not cpu.registers:
                cpu.registers = [(pc0, fp0)]
            cpu.registers = cpu.registers[:1] + posts
        else:
            cpu.ops_arrays = (kind, has_imm, imm, opcode, operands,
                              pre_pc, pre_fp)
        cpu.clock = clock
        cpu.pc = int(lib.vm_pc(vmp))
        cpu.fp = int(lib.vm_fp(vmp))

        # -- memory ops -----------------------------------------------------
        n = int(lib.vm_num_mem_ops(vmp))
        clk = np.zeros(n, dtype=np.uint32)
        is_write = np.zeros(n, dtype=np.uint8)
        addr = np.zeros(n, dtype=np.uint32)
        value = np.zeros(n, dtype=np.uint32)
        lib.vm_copy_mem_ops(vmp, _ptr(clk), _ptr(is_write), _ptr(addr),
                            _ptr(value))
        if build_lists:
            mem_ops: dict[int, list] = {}
            for ck, w, ad, vl in zip(clk.tolist(), is_write.tolist(),
                                     addr.tolist(), value.tolist()):
                mem_ops.setdefault(ck, []).append(("w" if w else "r", ad, vl))
            machine.mem().operations = mem_ops
        else:
            machine.mem().ops_arrays = (clk, is_write, addr, value)

        n = int(lib.vm_num_cells(vmp))
        addrs = np.zeros(n, dtype=np.uint32)
        vals = np.zeros(n, dtype=np.uint32)
        lib.vm_copy_cells(vmp, _ptr(addrs), _ptr(vals))
        machine.mem().cells = dict(zip(addrs.tolist(), vals.tolist()))

        # -- ALU chips ------------------------------------------------------
        def alu(name):
            cnt = int(getattr(lib, f"vm_num_{name}")(vmp))
            k = np.zeros(cnt, dtype=np.uint32)
            a = np.zeros(cnt, dtype=np.uint32)
            b = np.zeros(cnt, dtype=np.uint32)
            c = np.zeros(cnt, dtype=np.uint32)
            getattr(lib, f"vm_copy_{name}")(vmp, _ptr(k), _ptr(a), _ptr(b),
                                            _ptr(c))
            if not build_lists:
                return (k, a, b, c)
            kinds = _ALU_KINDS[name]
            if kinds == [None]:
                return list(zip(a.tolist(), b.tolist(), c.tolist()))
            kl = k.tolist()
            return [
                (kinds[ki], ai, bi, ci)
                for ki, ai, bi, ci in zip(kl, a.tolist(), b.tolist(), c.tolist())
            ]

        machine.add_u32().operations = alu("add_ops")
        machine.sub_u32().operations = alu("sub_ops")
        machine.mul_u32().operations = alu("mul_ops")
        machine.div_u32().operations = alu("div_ops")
        machine.lt_u32().operations = alu("lt_ops")
        machine.com_u32().operations = alu("com_ops")
        machine.bitwise_u32().operations = alu("bitwise_ops")
        machine.shift_u32().operations = alu("shift_ops")
        if hasattr(machine, "native_field"):
            machine.native_field().operations = alu("nf_ops")

        # -- counts / outputs ----------------------------------------------
        rc = np.zeros(256, dtype=np.uint32)
        lib.vm_copy_range_counts(vmp, _ptr(rc))
        machine.range().count = {
            int(i): int(c) for i, c in enumerate(rc) if c
        }
        npc = int(lib.vm_num_program_counts(vmp))
        counts = np.zeros(npc, dtype=np.uint32)
        lib.vm_copy_program_counts(vmp, _ptr(counts))
        machine.program().counts = counts.tolist()

        nout = int(lib.vm_num_outputs(vmp))
        oclk = np.zeros(nout, dtype=np.uint64)
        oval = np.zeros(nout, dtype=np.uint32)
        lib.vm_copy_outputs(vmp, _ptr(oclk), _ptr(oval))
        machine.output().values = list(zip(oclk.tolist(), oval.tolist()))
    finally:
        lib.vm_free(ctypes.c_void_p(vm))
