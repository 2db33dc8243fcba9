from .fishing import LVMObj
from .vanderpol import VPOObj
from .doubletank import DTMObj
from .convolution import ConvObj
from .fuller import FullerObj
from .mixed_fishing import LVMMixedObj

__all__ = [
    "LVMObj", "VPOObj", "DTMObj", "ConvObj", "HeatObj", "LVMMixedObj", "FullerObj",
]


def __getattr__(name):
    # HeatObj pulls in the FEM stack; import lazily.
    if name == "HeatObj":
        from .heat import HeatObj

        return HeatObj
    raise AttributeError(f"module 'mioc_tpu.models' has no attribute {name!r}")
