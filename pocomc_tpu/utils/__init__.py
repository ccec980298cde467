from .tools import ProgressBar, FunctionWrapper
from .threading import configure_threads
from . import validation
