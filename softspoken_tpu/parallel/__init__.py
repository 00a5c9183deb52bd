from .distributed import init_distributed, merge_partition_stores, partition_files
from .mesh import MeshDetector, make_mesh, shard_windows_forward

__all__ = [
    "make_mesh",
    "MeshDetector",
    "shard_windows_forward",
    "init_distributed",
    "partition_files",
    "merge_partition_stores",
]
