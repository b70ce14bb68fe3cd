from .halton import HaltonSampler, HaltonEnum, faure_permutations  # noqa: F401
