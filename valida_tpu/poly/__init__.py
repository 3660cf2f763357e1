from . import ntt, domain
