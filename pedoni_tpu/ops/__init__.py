from .sampling import DeviceField, FieldSample, sample_field
from .neighbor import CellGrid, NeighborData, build_neighbor_data

__all__ = [
    "DeviceField",
    "FieldSample",
    "sample_field",
    "CellGrid",
    "NeighborData",
    "build_neighbor_data",
]
