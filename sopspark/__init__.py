"""sopspark — a PySpark-native re-expression of pchampin/sophia-cli.

The reference (`/root/reference`, Rust) processes RDF as a lazy pull-based
stream of generalized quads (``src/common/quad_iter.rs:12-20``) flowing through
pipeline subcommands. Here the stream is a Spark ``DataFrame`` with the fixed
quad schema of :mod:`sopspark.terms`, each subcommand is a pure
``DataFrame -> DataFrame`` function, and Catalyst provides the fusion /
laziness the Rust iterator chain provides there.

Nothing in this package is a translation of the reference's code; it derives
only from the reference's observable semantics (README + fixtures) and the
public PySpark API.
"""

from sopspark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
