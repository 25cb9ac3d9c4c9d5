from v1t_tpu.parallel.mesh import DataParallel

__all__ = ["DataParallel"]
