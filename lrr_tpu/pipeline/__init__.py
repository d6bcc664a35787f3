from lrr_tpu.pipeline.registration import (
    LocationResult,
    PairContext,
    attach_regions,
    prepare_pair,
    register_location,
    register_location_rigid,
    register_locations,
    register_locations_staged,
    segment_pair,
)

__all__ = [
    "LocationResult",
    "PairContext",
    "attach_regions",
    "prepare_pair",
    "register_location",
    "register_location_rigid",
    "register_locations",
    "register_locations_staged",
    "segment_pair",
]
