from .gridder import dirty_image, predict_visibilities
from .plan import GridderPlan, make_plan

__all__ = [
    "GridderPlan",
    "make_plan",
    "dirty_image",
    "predict_visibilities",
]
