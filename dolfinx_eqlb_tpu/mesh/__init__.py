from .topology import TriMesh  # noqa: F401
from .generators import (  # noqa: F401
    unit_square,
    rectangle,
    lshape,
    cook_membrane,
    permute_vertices,
)
from .refine import refine_uniform, refine_marked, refine_facets  # noqa: F401
from .msh_io import read_msh  # noqa: F401
