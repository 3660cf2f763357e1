"""Build the native interpreter shared library (g++, no deps)."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "interpreter.cpp")
LIB = os.path.join(HERE, "libvalida_vm.so")


def build(force: bool = False) -> str:
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", LIB, SRC,
    ]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
