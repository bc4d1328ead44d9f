from . import numeric, params, rng  # noqa: F401
from .params import *  # noqa: F401,F403
