from .sampling import DeviceField, sample_waypoint, sample_obstacle
from .neighbor import CellGrid, NeighborData, build_neighbor_data

__all__ = [
    "DeviceField",
    "sample_waypoint",
    "sample_obstacle",
    "CellGrid",
    "NeighborData",
    "build_neighbor_data",
]
