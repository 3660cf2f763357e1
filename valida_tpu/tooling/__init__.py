from . import assembler, elf, serde, cli, repl
