from . import types, builder, lookup, quotient, check
from .types import VPCol, Interaction, Bus, LOCAL, GLOBAL, SEND, RECEIVE
