from .pool import MPIPool
from .mesh import ParticleMesh, initialize_distributed
