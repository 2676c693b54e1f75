from sopspark.operators.transforms import (
    absolutize,
    bnode_suffix,
    dedup,
    merge,
    relativize,
    validate,
)
from sopspark.operators.serialize import serialize_nquads, to_nq_lines
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
    "to_nq_lines",
    "filter_quads",
    "map_quads",
    "dispatch",
]
