"""valida_tpu — a TPU-native STARK proving framework with the capabilities of
the Valida zkVM (reference: valida-xyz/valida, surveyed in SURVEY.md).

Layers (bottom up):
  field/   BabyBear + degree-5 extension, Montgomery uint32 kernels
  poly/    radix-2 NTT / coset LDE / zerofiers
  crypto/  Poseidon, Keccak-256, Merkle MMCS, duplex challenger
  commit/  FRI polynomial commitment scheme (two-adic, batch openings)
  air/     AIR builder (symbolic/prover/verifier modes), LogUp lookup engine,
           quotient evaluation
  chips/   CPU, memory, program, static-data, range, output, u32 ALU family,
           native-field chips (execution + trace gen + constraints)
  machine/ machine composition, prove/verify pipelines, BasicMachine
  core/    Word semantics, program ROM, advice tape, proof objects, config
  tooling/ assembler, ELF loader, CLI, interactive debugger
  parallel/ device-mesh sharding for NTT, Merkle hashing, trace gen
"""

__version__ = "0.1.0"
