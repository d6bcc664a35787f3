from lrr_tpu.pipeline.registration import (
    LocationResult,
    PairContext,
    prepare_pair,
    register_location,
    register_locations,
)

__all__ = [
    "LocationResult",
    "PairContext",
    "prepare_pair",
    "register_location",
    "register_locations",
]
