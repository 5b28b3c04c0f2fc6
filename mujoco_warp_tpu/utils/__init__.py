from .benchmark import benchmark, ctrl_noise, halton  # noqa: F401
