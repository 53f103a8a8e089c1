from . import math, rng, transform, warp, spectrum, distr  # noqa: F401
from .pytree import pytree_dataclass, static_field  # noqa: F401
