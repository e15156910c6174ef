from .visibility_dataset import (
    UnsupportedLayout,
    VisibilityDatasetMetadata,
    VisibilityReader,
)

__all__ = [
    "UnsupportedLayout",
    "VisibilityDatasetMetadata",
    "VisibilityReader",
]
