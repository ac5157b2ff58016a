from .sampling import DeviceField, bilinear, sample_scalar, sample_grad
from .neighbor import CellGrid, NeighborData, build_neighbor_data

__all__ = [
    "DeviceField",
    "bilinear",
    "sample_scalar",
    "sample_grad",
    "CellGrid",
    "NeighborData",
    "build_neighbor_data",
]
