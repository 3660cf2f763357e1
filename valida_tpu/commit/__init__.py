from . import fri, pcs
from .fri import FriConfig
from .pcs import TwoAdicFriPcs
