from .clean import hogbom_clean, major_cycle_clean
from .operators import MeasurementOperator

__all__ = [
    "MeasurementOperator",
    "hogbom_clean",
    "major_cycle_clean",
]
