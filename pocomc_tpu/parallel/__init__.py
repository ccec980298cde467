from .pool import MPIPool
