from . import exchange
from .distributed import DistributedSession, make_mesh
