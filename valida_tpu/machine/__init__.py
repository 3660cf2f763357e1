from .machine import Machine
from .prover import prove
from .verifier import verify, VerificationError
