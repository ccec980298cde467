from .tools import ProgressBar, FunctionWrapper
