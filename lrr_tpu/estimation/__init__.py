from lrr_tpu.estimation.icp import ICPResult, VoronoiGrid, register_candidate

__all__ = ["ICPResult", "VoronoiGrid", "register_candidate"]
