from . import poseidon, keccak, challenger, merkle
