from . import config, proof
