from lrr_tpu.pipeline.registration import (
    LocationResult,
    PairContext,
    prepare_pair,
    register_location,
    register_location_rigid,
    register_locations,
    register_locations_staged,
)

__all__ = [
    "LocationResult",
    "PairContext",
    "prepare_pair",
    "register_location",
    "register_location_rigid",
    "register_locations",
    "register_locations_staged",
]
