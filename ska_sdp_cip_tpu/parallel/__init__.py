from .mesh import make_device_mesh, initialize_distributed
from .sharded_invert import sharded_invert_dataset

__all__ = [
    "make_device_mesh",
    "initialize_distributed",
    "sharded_invert_dataset",
]
