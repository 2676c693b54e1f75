from sopspark.operators.transforms import (
    absolutize,
    bnode_suffix,
    dedup,
    merge,
    relativize,
    validate,
)
from sopspark.operators.serialize import (
    serialize_nquads,
    serialize_trig,
    serialize_turtle,
    to_nq_lines,
    to_turtle_blocks,
)
from sopspark.operators.filter_map import filter_quads, map_quads
from sopspark.operators.dispatch import dispatch

__all__ = [
    "absolutize",
    "bnode_suffix",
    "dedup",
    "merge",
    "relativize",
    "validate",
    "serialize_nquads",
    "serialize_trig",
    "serialize_turtle",
    "to_turtle_blocks",
    "to_nq_lines",
    "filter_quads",
    "map_quads",
    "dispatch",
]
