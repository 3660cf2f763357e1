from . import babybear, ext
from .babybear import P, GENERATOR, TWO_ADICITY, two_adic_generator
