from .pipeline import cfs_flagship, cfs_reference_pipeline

__all__ = ["cfs_flagship", "cfs_reference_pipeline"]
