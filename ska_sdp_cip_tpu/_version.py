"""Package version (reference: src/ska_sdp_cip/_version.py:1-3)."""

__version__ = "0.1.0"
