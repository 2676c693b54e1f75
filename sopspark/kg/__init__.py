from sopspark.kg.synth import synth_corpus, write_corpus
from sopspark.kg.extract import assemble_turns, extract_triples
from sopspark.kg.link import link_entities
from sopspark.kg.canon import sameas_closure, skolemize, materialize_graph
from sopspark.kg.pipeline import run_pipeline

__all__ = [
    "synth_corpus",
    "write_corpus",
    "assemble_turns",
    "extract_triples",
    "link_entities",
    "sameas_closure",
    "skolemize",
    "materialize_graph",
    "run_pipeline",
]
