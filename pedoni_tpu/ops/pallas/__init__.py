from .pairwise import pallas_pairwise

__all__ = ["pallas_pairwise"]
