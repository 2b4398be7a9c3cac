from .smoothing import SmoothingKernel, kernel_factory  # noqa: F401
